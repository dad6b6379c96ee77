"""Pallas TPU kernel: fused cross-spectrum × displacement-DFT contraction.

The hot op of the posterior engine (reference comparison loop,
/root/reference/bioem_cuda.cu:227-263 ``multComplexMap`` + batched cuFFT +
displacement sweep) computes, for every (projection×CTF) ``oc`` and image
``i``, the cross-correlation at the displacement lattice:

    cc[oc, i, d, e] = Re( wx[d] @ (conv[oc] ⊙ img_fc[i]) @ wy[e]ᵀ )

The XLA path (bioem_tpu.core.posterior.displacement_cc) materialises the
pairwise product ``conv ⊙ img`` — an (OC, I, N, F) float32 tensor pair that
round-trips HBM and dominates the runtime. This kernel tiles images into
VMEM and sweeps the ``oc`` axis in the inner grid dimension, so the product
lives only in registers/VMEM:

    HBM traffic  XLA:    O(OC · I · N · F)      (the product tensors)
                 Pallas: O((OC + I) · N · F)    (each operand read ~once)

Complex arithmetic is split into real float32 (no complex dtypes on the
TPU data path), and both DFT contractions run on the MXU with full-f32
accumulation.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _mxu_mode(interpret: bool) -> str:
    """MXU mode for the DFT contractions:

    - ``3pass`` (TPU default): manual bf16 hi/lo split, 3 bf16 matmuls per
      product — measured end-to-end |Δlog P| ≤ 6e-4 and identical argmax vs
      highest on the production-shaped bench, ~1.1× faster overall. (Mosaic
      does not implement lax Precision.HIGH.)
    - ``highest`` (interpret-mode default): full-f32 passes, cc relative
      error ~6e-8 — keeps CPU parity tests exact.
    - ``default``: single-pass bf16 (~1e-3 relative cc — benchmarking only).
    """
    mode = os.environ.get(
        "BIOEM_TPU_MXU_PRECISION", "highest" if interpret else "3pass"
    ).lower()
    if mode not in ("highest", "3pass", "default"):
        raise ValueError(f"BIOEM_TPU_MXU_PRECISION={mode!r}")
    return mode


def _make_dot(mode: str):
    if mode == "3pass":

        def dot3(a, b):
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            d = partial(jnp.dot, preferred_element_type=jnp.float32)
            return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))

        return dot3
    prec = (
        jax.lax.Precision.HIGHEST if mode == "highest" else jax.lax.Precision.DEFAULT
    )
    return partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)


def _fused_cc_kernel(
    conv_re_ref, conv_im_ref, img_re_ref, img_im_ref,
    wx_re_ref, wx_im_ref, wy_re_ref, wy_im_ref,
    out_ref,
    *, n_fold: int, mxu_mode: str,
):
    cr = conv_re_ref[0]  # (N, F)
    ci = conv_im_ref[0]
    it = img_re_ref.shape[0]
    wxr = wx_re_ref[:]  # (D, N/n_fold)
    wxi = wx_im_ref[:]
    wyr_t = wy_re_ref[:].T  # (F, D)
    wyi_t = wy_im_ref[:].T
    m = wxr.shape[1]

    # Accuracy policy in _mxu_mode; the single-pass bf16 path loses ~3
    # decimal digits of cc, enough to move the displacement argmax.
    dot = _make_dot(mxu_mode)

    # Static unrolled loop over the image tile. Contraction order puts the
    # small displacement dim D on the matmul M side (sublanes, padded
    # 21→24) instead of the lane side (21→128, 6× wasted MXU columns):
    #   t1 = wx @ fold(p)  (D, N/s)·(N/s, F)
    #   cc = Re(t1 @ wyᵀ)  (D, F)·(F, D)
    # fold(p): every displacement is a multiple of the lattice stride s, so
    # wx rows have period N/s in n — p rows n and n + k·N/s share a weight
    # and are summed on the VPU before the matmul (s× fewer MXU flops).
    for i in range(it):
        ir = img_re_ref[i]  # (N, F)
        ii = img_im_ref[i]
        # Cross-spectrum product, VMEM-resident only.
        p_re = cr * ir - ci * ii
        p_im = cr * ii + ci * ir
        if n_fold > 1:
            p_re = sum(p_re[k * m:(k + 1) * m] for k in range(n_fold))
            p_im = sum(p_im[k * m:(k + 1) * m] for k in range(n_fold))
        t1_re = dot(wxr, p_re) - dot(wxi, p_im)  # (D, F)
        t1_im = dot(wxr, p_im) + dot(wxi, p_re)
        out_ref[0, i] = dot(t1_re, wyr_t) - dot(t1_im, wyi_t)  # (D, D)


def _split_hilo(x, f32=jnp.float32, bf16=jnp.bfloat16):
    hi = x.astype(bf16)
    lo = (x - hi.astype(f32)).astype(bf16)
    return hi, lo


def _fused_cc_kernel_v2(
    conv_re_ref, conv_im_ref, img_re_ref, img_im_ref,
    wya_ref, wyb_ref, wx4_ref,
    out_ref, ph_ref, pl_ref, q_ref,
    *, n_fold: int, d: int,
):
    """Image-batched 3-pass MXU formulation (contract f first, then n).

    For each (oc, image-tile) grid cell:

    1. VPU: cross-spectrum p = conv ⊙ img per image, stride-folded along n,
       split hi/lo bf16 into two tall slabs PH = [p_re_hi; p_im_hi] and
       PL = [p_re_lo; p_im_lo], each (2·it·m, F).
    2. MXU pass 1 (f-contraction): AH = PH @ WYA, AL = PL @ WYB, where WYA
       lane-stacks all four wyᵀ variants [r_hi | i_hi | r_lo | i_lo] (F, 4D)
       and WYB the hi pair (F, 2D). One tall matmul per slab — the DFT
       weights stay stationary while 2·it·m rows stream, instead of v1's
       M=D=21-row matmuls that reload weights every 21 rows.
    3. VPU: combine the 3-pass products into q = p @ wyᵀ (complex, f32),
       re-split hi/lo, and lane-pack per image into Q (m, it·4D).
    4. MXU pass 2 (n-contraction): OUT = WX4 @ Q with WX4 the row-stacked
       wx variants (4D, m); the (D, D) blocks of OUT are the wx_v @ q_w
       products, summed per the 3-pass complex expansion into cc.

    Same 12-product 3-pass set as the v1 kernel — numerics agree to bf16
    split rounding — but every matmul has a ≥112-row stream or a shared
    stationary operand, so the MXU is no longer weight-load bound.
    """
    cr = conv_re_ref[0]  # (N, F)
    ci = conv_im_ref[0]
    it = img_re_ref.shape[0]
    m = wx4_ref.shape[1]  # N / n_fold
    f = cr.shape[1]
    r = it * m  # rows of the re-part in PH/PL

    for i in range(it):
        gr = img_re_ref[i]
        gi = img_im_ref[i]
        p_re = cr * gr - ci * gi
        p_im = cr * gi + ci * gr
        if n_fold > 1:
            p_re = sum(p_re[k * m:(k + 1) * m] for k in range(n_fold))
            p_im = sum(p_im[k * m:(k + 1) * m] for k in range(n_fold))
        re_hi, re_lo = _split_hilo(p_re)
        im_hi, im_lo = _split_hilo(p_im)
        ph_ref[i * m:(i + 1) * m] = re_hi
        ph_ref[r + i * m:r + (i + 1) * m] = im_hi
        pl_ref[i * m:(i + 1) * m] = re_lo
        pl_ref[r + i * m:r + (i + 1) * m] = im_lo

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    ah = dot(ph_ref[:], wya_ref[:])  # (2·it·m, 4D)
    al = dot(pl_ref[:], wyb_ref[:])  # (2·it·m, 2D)

    for i in range(it):
        re_s = slice(i * m, (i + 1) * m)
        im_s = slice(r + i * m, r + (i + 1) * m)
        # q = p @ wyᵀ, 3-pass: p_*_hi picks up both wy_hi and wy_lo columns
        # of AH; p_*_lo only the wy_hi columns of AL.
        q_re = (
            ah[re_s, 0:d] + ah[re_s, 2 * d:3 * d] + al[re_s, 0:d]
            - ah[im_s, d:2 * d] - ah[im_s, 3 * d:4 * d] - al[im_s, d:2 * d]
        )
        q_im = (
            ah[re_s, d:2 * d] + ah[re_s, 3 * d:4 * d] + al[re_s, d:2 * d]
            + ah[im_s, 0:d] + ah[im_s, 2 * d:3 * d] + al[im_s, 0:d]
        )
        qre_hi, qre_lo = _split_hilo(q_re)
        qim_hi, qim_lo = _split_hilo(q_im)
        base = i * 4 * d
        q_ref[:, base:base + d] = qre_hi
        q_ref[:, base + d:base + 2 * d] = qim_hi
        q_ref[:, base + 2 * d:base + 3 * d] = qre_lo
        q_ref[:, base + 3 * d:base + 4 * d] = qim_lo

    out = dot(wx4_ref[:], q_ref[:])  # (4D, it·4D)
    for i in range(it):
        b = i * 4 * d
        # cc = wxr @ q_re − wxi @ q_im, 3-pass block extraction:
        # row blocks: 0=xr_hi 1=xi_hi 2=xr_lo 3=xi_lo;
        # col blocks (per image): 0=qre_hi 1=qim_hi 2=qre_lo 3=qim_lo.
        cc = (
            out[0:d, b:b + d]
            + out[0:d, b + 2 * d:b + 3 * d]
            + out[2 * d:3 * d, b:b + d]
            - out[d:2 * d, b + d:b + 2 * d]
            - out[d:2 * d, b + 3 * d:b + 4 * d]
            - out[3 * d:4 * d, b + d:b + 2 * d]
        )
        out_ref[0, i] = cc


def fused_displacement_cc_v2(
    conv_re: jnp.ndarray,  # (OC, N, F) f32
    conv_im: jnp.ndarray,
    img_re: jnp.ndarray,  # (I, N, F) f32 — conj(rfft2(img))·h/N² prefolded
    img_im: jnp.ndarray,
    wx_re: jnp.ndarray,  # (D, N/n_fold) f32
    wx_im: jnp.ndarray,
    wy_re: jnp.ndarray,  # (D, F) f32
    wy_im: jnp.ndarray,
    *,
    img_tile: int = 16,
    n_fold: int = 1,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as fused_displacement_cc, image-batched MXU layout."""
    oc, n, f = conv_re.shape
    n_img = img_re.shape[0]
    d = wy_re.shape[0]
    m = wx_re.shape[1]
    if m * n_fold != n:
        raise ValueError(
            f"wx has {m} columns, expected N/n_fold = {n}/{n_fold}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img_tile = min(img_tile, n_img)
    if n_img % img_tile:
        raise ValueError(f"image count {n_img} not a multiple of tile {img_tile}")
    n_it = n_img // img_tile

    # Stacked bf16 weight banks (tiny; XLA folds these once per jit). The
    # optimization_barrier is load-bearing: without it XLA simplifies the
    # residual ``x - f32(bf16(x))`` to zero, silently degrading the 3-pass
    # split to single-pass bf16 (~1e-3 cc error — moves the argmax).
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        hi_f = jax.lax.optimization_barrier(hi).astype(jnp.float32)
        return hi, (x - hi_f).astype(jnp.bfloat16)

    yr_hi, yr_lo = hilo(wy_re.T)  # (F, D)
    yi_hi, yi_lo = hilo(wy_im.T)
    wya = jnp.concatenate([yr_hi, yi_hi, yr_lo, yi_lo], axis=1)  # (F, 4D)
    wyb = jnp.concatenate([yr_hi, yi_hi], axis=1)  # (F, 2D)
    xr_hi, xr_lo = hilo(wx_re)  # (D, m)
    xi_hi, xi_lo = hilo(wx_im)
    wx4 = jnp.concatenate([xr_hi, xi_hi, xr_lo, xi_lo], axis=0)  # (4D, m)

    grid = (n_it, oc)
    conv_spec = pl.BlockSpec((1, n, f), lambda it, o: (o, o * 0, o * 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((img_tile, n, f), lambda it, o: (it, o * 0, o * 0), memory_space=pltpu.VMEM)
    wya_spec = pl.BlockSpec((f, 4 * d), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)
    wyb_spec = pl.BlockSpec((f, 2 * d), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)
    wx4_spec = pl.BlockSpec((4 * d, m), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fused_cc_kernel_v2, n_fold=n_fold, d=d),
        grid=grid,
        in_specs=[conv_spec, conv_spec, img_spec, img_spec, wya_spec, wyb_spec, wx4_spec],
        out_specs=pl.BlockSpec(
            (1, img_tile, d, d), lambda it, o: (o, it, o * 0, o * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((oc, n_img, d, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * img_tile * m, f), jnp.bfloat16),
            pltpu.VMEM((2 * img_tile * m, f), jnp.bfloat16),
            pltpu.VMEM((m, img_tile * 4 * d), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * oc * n_img * 3 * (4 * m * f * d + 4 * d * m * d),
            bytes_accessed=4 * 2 * (oc + n_img * 2) * n * f,
            transcendentals=0,
        ),
        interpret=interpret,
    )(conv_re, conv_im, img_re, img_im, wya, wyb, wx4)
    return out


def _fused_cc_kernel_v3(
    conv_re_ref, conv_im_ref, img_re_ref, img_im_ref,
    a96_ref, w2_ref,
    out_ref,
    *, n_fold: int, d: int, dp: int,
):
    """v1's loop structure with stacked-weight matmuls (5 per image, M≥48).

    a96: (4·dp, m) bf16 rows [wxr_hi; wxi_hi; wxr_lo; wxi_lo], each variant
    padded to dp rows so every block slice is sublane-aligned.
    w2: (F, 4·dp) bf16 cols [wyrᵀ_hi | wyiᵀ_hi | wyrᵀ_lo | wyiᵀ_lo], padded
    to dp columns each.

    Per image: p = conv ⊙ img (VPU, f32), hi/lo split; stage 1 contracts n
    with all wx variants at once (M = 4·dp = 96 streamed rows instead of
    v1's 21); stage 2 row-stacks the t1 variants (96, F) against the wy
    stack (F, 96) — one matmul whose (dp, dp) blocks are the 3-pass
    products. Same 12-product set as v1/dot3 → same accuracy.
    """
    cr = conv_re_ref[0]  # (N, F)
    ci = conv_im_ref[0]
    it = img_re_ref.shape[0]
    m = a96_ref.shape[1]
    a96 = a96_ref[:]
    a48 = a96[0:2 * dp]  # [wxr_hi; wxi_hi]
    w2 = w2_ref[:]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)

    for i in range(it):
        gr = img_re_ref[i]
        gi = img_im_ref[i]
        p_re = cr * gr - ci * gi
        p_im = cr * gi + ci * gr
        if n_fold > 1:
            p_re = sum(p_re[k * m:(k + 1) * m] for k in range(n_fold))
            p_im = sum(p_im[k * m:(k + 1) * m] for k in range(n_fold))
        re_hi, re_lo = _split_hilo(p_re)
        im_hi, im_lo = _split_hilo(p_im)
        th_re = dot(a96, re_hi)  # (4dp, F): blocks wx_v @ p_re_hi
        th_im = dot(a96, im_hi)
        tl_re = dot(a48, re_lo)  # (2dp, F): [xr_hi; xi_hi] @ p_re_lo
        tl_im = dot(a48, im_lo)
        # t1 = wx @ p (complex, 3-pass combined in f32)
        t1_re = (
            th_re[0:dp] + th_re[2 * dp:3 * dp] + tl_re[0:dp]
            - th_im[dp:2 * dp] - th_im[3 * dp:4 * dp] - tl_im[dp:2 * dp]
        )
        t1_im = (
            th_im[0:dp] + th_im[2 * dp:3 * dp] + tl_im[0:dp]
            + th_re[dp:2 * dp] + th_re[3 * dp:4 * dp] + tl_re[dp:2 * dp]
        )
        r_hi, r_lo = _split_hilo(t1_re)
        i_hi, i_lo = _split_hilo(t1_im)
        t2 = jnp.concatenate([r_hi, i_hi, r_lo, i_lo], axis=0)  # (4dp, F)
        o2 = dot(t2, w2)  # (4dp, 4dp) f32
        cc = (
            o2[0:d, 0:d]
            + o2[0:d, 2 * dp:2 * dp + d]
            + o2[2 * dp:2 * dp + d, 0:d]
            - o2[dp:dp + d, dp:dp + d]
            - o2[dp:dp + d, 3 * dp:3 * dp + d]
            - o2[3 * dp:3 * dp + d, dp:dp + d]
        )
        out_ref[0, i] = cc


def fused_displacement_cc_v3(
    conv_re: jnp.ndarray,  # (OC, N, F) f32
    conv_im: jnp.ndarray,
    img_re: jnp.ndarray,  # (I, N, F) f32 — conj(rfft2(img))·h/N² prefolded
    img_im: jnp.ndarray,
    wx_re: jnp.ndarray,  # (D, N/n_fold) f32
    wx_im: jnp.ndarray,
    wy_re: jnp.ndarray,  # (D, F) f32
    wy_im: jnp.ndarray,
    *,
    img_tile: int = 16,
    n_fold: int = 1,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as fused_displacement_cc, stacked-weight MXU layout."""
    oc, n, f = conv_re.shape
    n_img = img_re.shape[0]
    d = wy_re.shape[0]
    m = wx_re.shape[1]
    if m * n_fold != n:
        raise ValueError(
            f"wx has {m} columns, expected N/n_fold = {n}/{n_fold}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img_tile = min(img_tile, n_img)
    if n_img % img_tile:
        raise ValueError(f"image count {n_img} not a multiple of tile {img_tile}")
    n_it = n_img // img_tile
    dp = _cdiv(d, 8) * 8  # variant row/col pad for aligned block slices

    # The optimization_barrier is load-bearing (see fused_displacement_cc_v2).
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        hi_f = jax.lax.optimization_barrier(hi).astype(jnp.float32)
        return hi, (x - hi_f).astype(jnp.bfloat16)

    def padr(x):  # (d, m) -> (dp, m)
        return jnp.pad(x, ((0, dp - d), (0, 0)))

    xr_hi, xr_lo = hilo(wx_re)
    xi_hi, xi_lo = hilo(wx_im)
    a96 = jnp.concatenate(
        [padr(xr_hi), padr(xi_hi), padr(xr_lo), padr(xi_lo)], axis=0
    )  # (4dp, m) bf16

    def padc(x):  # (f, d) -> (f, dp)
        return jnp.pad(x, ((0, 0), (0, dp - d)))

    yr_hi, yr_lo = hilo(wy_re.T)
    yi_hi, yi_lo = hilo(wy_im.T)
    w2 = jnp.concatenate(
        [padc(yr_hi), padc(yi_hi), padc(yr_lo), padc(yi_lo)], axis=1
    )  # (F, 4dp) bf16

    grid = (n_it, oc)
    conv_spec = pl.BlockSpec((1, n, f), lambda it, o: (o, o * 0, o * 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((img_tile, n, f), lambda it, o: (it, o * 0, o * 0), memory_space=pltpu.VMEM)
    a96_spec = pl.BlockSpec((4 * dp, m), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((f, 4 * dp), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fused_cc_kernel_v3, n_fold=n_fold, d=d, dp=dp),
        grid=grid,
        in_specs=[conv_spec, conv_spec, img_spec, img_spec, a96_spec, w2_spec],
        out_specs=pl.BlockSpec(
            (1, img_tile, d, d), lambda it, o: (o, it, o * 0, o * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((oc, n_img, d, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * oc * n_img * 3 * (4 * m * f * d + 4 * d * m * d),
            bytes_accessed=4 * 2 * (oc + n_img * 2) * n * f,
            transcendentals=0,
        ),
        interpret=interpret,
    )(conv_re, conv_im, img_re, img_im, a96, w2)
    return out


def fused_displacement_cc(
    conv_re: jnp.ndarray,  # (OC, N, F) f32
    conv_im: jnp.ndarray,
    img_re: jnp.ndarray,  # (I, N, F) f32 — conj(rfft2(img))·h/N² prefolded
    img_im: jnp.ndarray,
    wx_re: jnp.ndarray,  # (D, N) f32
    wx_im: jnp.ndarray,
    wy_re: jnp.ndarray,  # (D, F) f32
    wy_im: jnp.ndarray,
    *,
    img_tile: int = 8,
    n_fold: int = 1,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """cc[oc, i, d, e] — same contract as posterior.displacement_cc.

    ``img_tile`` images are processed per grid step; I must be a multiple
    (the engine pads its image bank). ``n_fold`` > 1 enables the stride-fold
    optimisation: pass wx with N/n_fold columns (the first N/n_fold columns
    of the full weight matrix — valid when every displacement is a multiple
    of n_fold and n_fold divides N). ``interpret`` defaults to True off-TPU
    so the kernel is testable on the CPU mesh.
    """
    oc, n, f = conv_re.shape
    n_img = img_re.shape[0]
    d = wx_re.shape[0]
    if wx_re.shape[1] * n_fold != n:
        raise ValueError(
            f"wx has {wx_re.shape[1]} columns, expected N/n_fold = {n}/{n_fold}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img_tile = min(img_tile, n_img)
    if n_img % img_tile:
        raise ValueError(f"image count {n_img} not a multiple of tile {img_tile}")
    n_it = n_img // img_tile

    # Grid: images outer, oc inner — the image tile block stays resident in
    # VMEM across the whole oc sweep (Pallas skips re-fetch when the block
    # index is unchanged), so each image is read from HBM once per call.
    # Index-map constants must be int32 derived from the grid indices: a
    # literal 0 promotes to i64 under jax_enable_x64 (Mosaic rejects it) and
    # captured int32 constants are disallowed, so use ``o * 0``.
    grid = (n_it, oc)
    conv_spec = pl.BlockSpec((1, n, f), lambda it, o: (o, o * 0, o * 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((img_tile, n, f), lambda it, o: (it, o * 0, o * 0), memory_space=pltpu.VMEM)
    wx_spec = pl.BlockSpec((d, n // n_fold), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)
    wy_spec = pl.BlockSpec((d, f), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_fused_cc_kernel, n_fold=n_fold, mxu_mode=_mxu_mode(interpret)),
        grid=grid,
        in_specs=[conv_spec, conv_spec, img_spec, img_spec, wx_spec, wx_spec, wy_spec, wy_spec],
        out_specs=pl.BlockSpec(
            (1, img_tile, d, d), lambda it, o: (o, it, o * 0, o * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((oc, n_img, d, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * oc * n_img * (4 * n * f * d + 2 * d * n * d),
            bytes_accessed=4 * 2 * (oc + n_img * 2) * n * f,
            transcendentals=0,
        ),
        interpret=interpret,
    )(conv_re, conv_im, img_re, img_im, wx_re, wx_im, wy_re, wy_im)
    return out
