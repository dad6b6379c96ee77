"""Pallas TPU kernels: fused convolution × cross-spectrum × displacement LSE.

The hot op of the posterior engine (reference comparison loop,
/root/reference/bioem_cuda.cu:227-263 ``multComplexMap`` + batched cuFFT +
displacement sweep + bioem_algorithm.h:72-141 ``calProb``) computes, for
every (projection o × CTF c) pair and image ``i``, the cross-correlation at
the displacement lattice and its log-posterior reduction:

    conv[o,c]       = proj[o] ⊙ conj(ctf[c])
    cc[o,c,i,d,e]   = Re( wx[d] @ (conv[o,c] ⊙ img_fc[i]) @ wy[e]ᵀ )
    v[o,c,i,d,e]    = a_coef · log1p(a_u·cc − b_u·cc²)
    out[o,c,i]      = (max v, Σ exp(v−max), argmax, cc@argmax)

A pure-XLA pipeline materialises conv (O·C·N·F) and cc (O·C·I·D²) in HBM
and runs the transcendental reduction on (D, D)-shaped tiles padded to
(24, 128) — 14 % VPU fill. The production kernel here
(:func:`fused_compare_block`) keeps conv, the cross-spectra AND cc entirely
in VMEM; per orientation block only the four (OC, I) result scalars are
written back:

    HBM traffic  XLA:    O(OC·N·F + OC·I·N·F + OC·I·D²)
                 Pallas: O((O + C + I) · N · F + OC·I)

Complex arithmetic is split into real float32 (no complex dtypes on the
TPU data path). Two matmul bodies are available:

* **stacked** (TPU default): 3-pass bf16 hi/lo split with all weight
  variants row/column-stacked into two matmuls per image, M ≥ 48 rows —
  measured 2.3× the simple body on v5e at identical accuracy (~5e-6
  relative cc error vs f64, i.e. the bf16-split rounding floor).
* **simple**: one small (D, m)·(m, F) matmul pair per image with
  full-float32 MXU passes (``highest``, interpret-mode default — keeps CPU
  parity tests exact) or single-pass bf16 (``default`` — benchmarking only,
  ~1e-3 relative cc error moves the displacement argmax).

:func:`fused_displacement_cc` exposes the cc contraction alone (same
bodies, no LSE) for unit tests and the kernel lab.
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
    """MXU mode for the DFT contractions (see module docstring).

    ``BIOEM_TPU_MXU_PRECISION`` ∈ {stacked, highest, default}; ``3pass`` is
    accepted as a legacy alias for ``stacked``. (Mosaic does not implement
    lax Precision.HIGH/HIGHEST, hence the manual bf16 splitting on TPU.)
    """
    mode = os.environ.get(
        "BIOEM_TPU_MXU_PRECISION", "highest" if interpret else "stacked"
    ).lower()
    if mode == "3pass":
        mode = "stacked"
    if mode not in ("stacked", "highest", "default"):
        raise ValueError(f"BIOEM_TPU_MXU_PRECISION={mode!r}")
    return mode


def _split_hilo(x, f32=jnp.float32, bf16=jnp.bfloat16):
    # NOTE: no optimization_barrier here — Mosaic has no lowering for it.
    # The split's correctness therefore rests on Mosaic NOT simplifying
    # ``x - f32(bf16(x))`` to zero; tests/test_pallas.py asserts the
    # achieved cc accuracy (~1e-5 rel) on whatever backend runs the suite,
    # so a compiler regression surfaces as a test failure, not silent
    # single-pass bf16 (~1e-3, argmax moves). Verified on TPU v5e: 5e-6.
    hi = x.astype(bf16)
    lo = (x - hi.astype(f32)).astype(bf16)
    return hi, lo


def _fold(p, n_fold, m):
    if n_fold <= 1:
        return p
    return sum(p[k * m:(k + 1) * m] for k in range(n_fold))


def _cc_tile_simple(cr, ci, ir, ii, wxr, wxi, wyr_t, wyi_t, n_fold, dot):
    """cc (D, D) of one image against one conv, small-matmul body.

    Contraction order puts the small displacement dim D on the matmul M
    side (sublanes, padded e.g. 21→24) instead of the lane side (21→128,
    6× wasted MXU columns):
      t1 = wx @ fold(p)  (D, N/s)·(N/s, F)
      cc = Re(t1 @ wyᵀ)  (D, F)·(F, D)
    fold(p): every displacement is a multiple of the lattice stride s, so
    wx rows have period N/s in n — p rows n and n + k·N/s share a weight
    and are summed on the VPU before the matmul (s× fewer MXU flops).
    """
    m = wxr.shape[1]
    p_re = _fold(cr * ir - ci * ii, n_fold, m)
    p_im = _fold(cr * ii + ci * ir, n_fold, m)
    t1_re = dot(wxr, p_re) - dot(wxi, p_im)  # (D, F)
    t1_im = dot(wxr, p_im) + dot(wxi, p_re)
    return dot(t1_re, wyr_t) - dot(t1_im, wyi_t)  # (D, D)


def _cc_tile_stacked(cr, ci, ir, ii, a96, a48, w2, n_fold, d, dp):
    """cc (D, D) of one image, 3-pass bf16 stacked-weight body (M ≥ 48).

    a96: (4·dp, m) bf16 rows [wxr_hi; wxi_hi; wxr_lo; wxi_lo], each variant
    padded to dp rows so every block slice is sublane-aligned; a48 its
    first half. w2: (F, 4·dp) bf16 cols [wyrᵀ_hi | wyiᵀ_hi | wyrᵀ_lo |
    wyiᵀ_lo].

    p = conv ⊙ img (VPU, f32), hi/lo split; stage 1 contracts n with all
    wx variants at once (M = 4·dp streamed rows); stage 2 row-stacks the
    t1 variants (4·dp, F) against the wy stack (F, 4·dp) — one matmul
    whose (dp, dp) blocks are the 3-pass products (hi·hi, hi·lo, lo·hi;
    lo·lo dropped as in double-double arithmetic).
    """
    m = a96.shape[1]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    p_re = _fold(cr * ir - ci * ii, n_fold, m)
    p_im = _fold(cr * ii + ci * ir, n_fold, m)
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
    return (
        o2[0:d, 0:d]
        + o2[0:d, 2 * dp:2 * dp + d]
        + o2[2 * dp:2 * dp + d, 0:d]
        - o2[dp:dp + d, dp:dp + d]
        - o2[dp:dp + d, 3 * dp:3 * dp + d]
        - o2[3 * dp:3 * dp + d, dp:dp + d]
    )


def _stacked_weight_banks(wx_re, wx_im, wy_re, wy_im, d, dp):
    """Host-side (traced, pre-kernel) bf16 weight stacks for the stacked body.

    The optimization_barrier is load-bearing: without it XLA simplifies the
    residual ``x - f32(bf16(x))`` to zero, silently degrading the 3-pass
    split to single-pass bf16 (~1e-3 cc error — moves the argmax). It
    cannot be used inside the kernel body (no Mosaic lowering) — see
    _split_hilo for the in-kernel guard strategy.
    """

    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        hi_f = jax.lax.optimization_barrier(hi).astype(jnp.float32)
        return hi, (x - hi_f).astype(jnp.bfloat16)

    def padr(x):  # (d, m) -> (dp, m)
        return jnp.pad(x, ((0, dp - d), (0, 0)))

    def padc(x):  # (f, d) -> (f, dp)
        return jnp.pad(x, ((0, 0), (0, dp - d)))

    xr_hi, xr_lo = hilo(wx_re)
    xi_hi, xi_lo = hilo(wx_im)
    a96 = jnp.concatenate(
        [padr(xr_hi), padr(xi_hi), padr(xr_lo), padr(xi_lo)], axis=0
    )  # (4dp, m) bf16
    yr_hi, yr_lo = hilo(wy_re.T)
    yi_hi, yi_lo = hilo(wy_im.T)
    w2 = jnp.concatenate(
        [padc(yr_hi), padc(yi_hi), padc(yr_lo), padc(yi_lo)], axis=1
    )  # (F, 4dp) bf16
    return a96, w2


# ---------------------------------------------------------------------------
# Production kernel: conv ⊙ cc ⊙ displacement-LSE, fully fused
# ---------------------------------------------------------------------------

def _lse_tile(cc, a_u, b_u, a_coef, d):
    """Displacement log-sum-exp of one (D, D) cc tile (reference
    calProb/doRefMapFFT, bioem_algorithm.h:72-141, via the engine's
    split-precision decomposition — see core/posterior.py):

        v = a_coef·log1p(a_u·cc − b_u·cc²)

    Returns (max v, Σexp(v−max), flat argmax in reference row-major sweep
    order with first-occurrence tie-breaking, cc at the argmax).
    """
    u = a_u * cc - b_u * cc * cc
    v = a_coef * jnp.log1p(u)
    # All reductions produce true scalars (vector→scalar is fine in Mosaic;
    # the caller re-splats them to (1, 1) tiles for the store — vector
    # (1,1)→(d,d) broadcasts are NOT implemented, scalar splats are).
    mv = jnp.max(v)
    # Explicit i32 constants: a Python int would promote to i64 under
    # jax_enable_x64, which Mosaic cannot lower.
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) * jnp.int32(d)
        + jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    )
    ds = jnp.min(jnp.where(v == mv, flat, jnp.int32(d * d)))
    ccs = jnp.sum(jnp.where(flat == ds, cc, jnp.float32(0.0)))
    se = jnp.sum(jnp.exp(v - mv))
    return mv, se, ds, ccs


def _fused_block_kernel(
    proj_re_ref, proj_im_ref, ctf_re_ref, ctf_im_ref,
    img_re_ref, img_im_ref,
    au_ref, bu_ref,
    *w_and_out,
    n_fold: int, d: int, dp: int, a_coef: float, mxu_mode: str,
):
    if mxu_mode == "stacked":
        a96_ref, w2_ref, m_ref, se_ref, ds_ref, ccs_ref = w_and_out
    else:
        wxr_ref, wxi_ref, wyr_ref, wyi_ref, m_ref, se_ref, ds_ref, ccs_ref = (
            w_and_out
        )
        prec = (
            jax.lax.Precision.HIGHEST
            if mxu_mode == "highest"
            else jax.lax.Precision.DEFAULT
        )
        dot = partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)

    pr = proj_re_ref[0]  # (N, F)
    pi = proj_im_ref[0]
    kr = ctf_re_ref[0]
    ki = ctf_im_ref[0]
    # conv = proj · conj(ctf) (reference bioem.cpp:1879-1883), recomputed
    # per grid cell on the VPU — cheaper than an HBM round-trip of the
    # (OC, N, F) conv tensor.
    cr = pr * kr + pi * ki
    ci = pi * kr - pr * ki

    it = img_re_ref.shape[0]
    mvs, ses, dss, ccss = [], [], [], []
    for i in range(it):
        ir = img_re_ref[i]
        ii = img_im_ref[i]
        if mxu_mode == "stacked":
            a96 = a96_ref[:]
            cc = _cc_tile_stacked(
                cr, ci, ir, ii, a96, a96[0:2 * dp], w2_ref[:], n_fold, d, dp
            )
        else:
            cc = _cc_tile_simple(
                cr, ci, ir, ii,
                wxr_ref[:], wxi_ref[:], wyr_ref[:].T, wyi_ref[:].T,
                n_fold, dot,
            )
        # a_u/b_u arrive through SMEM so the per-image reads are true
        # scalars (a (1,1) VMEM slice cannot broadcast against (d, d)).
        mv, se, ds, ccs = _lse_tile(
            cc, au_ref[0, i, 0], bu_ref[0, i, 0], a_coef, d
        )
        mvs.append(mv)
        ses.append(se)
        dss.append(ds)
        ccss.append(ccs)

    def splat(x):  # scalar → (1, 1) tile
        return jnp.broadcast_to(x, (1, 1))

    # Mosaic forbids scalar stores to VMEM: splat the per-image scalar
    # results and store one (img_tile, 1) vector per output.
    m_ref[0] = jnp.concatenate([splat(x) for x in mvs], axis=0)
    se_ref[0] = jnp.concatenate([splat(x) for x in ses], axis=0)
    ds_ref[0] = jnp.concatenate([splat(x) for x in dss], axis=0)
    ccs_ref[0] = jnp.concatenate([splat(x) for x in ccss], axis=0)


def fused_compare_block(
    proj_re: jnp.ndarray,  # (O, N, F) f32 — projection spectra
    proj_im: jnp.ndarray,
    ctf_re: jnp.ndarray,  # (C, N, F) f32 — CTF/PSF kernel bank
    ctf_im: jnp.ndarray,
    img_re: jnp.ndarray,  # (I, N, F) f32 — conj(rfft2(img))·h/N² prefolded
    img_im: jnp.ndarray,
    wx_re: jnp.ndarray,  # (D, N/n_fold) f32
    wx_im: jnp.ndarray,
    wy_re: jnp.ndarray,  # (D, F) f32
    wy_im: jnp.ndarray,
    a_u: jnp.ndarray,  # (O·C, I) f32 — 2·sum_ref·sum_c/F0
    b_u: jnp.ndarray,  # (O·C, I) f32 — Ntot/F0
    *,
    a_coef: float,  # (3 − Ntot)/2
    img_tile: int = 32,
    n_fold: int = 1,
    interpret: bool | None = None,
    mxu_mode: str | None = None,
):
    """Fully fused comparison block: returns (m, sumexp, d_star, cc_star),
    each (O·C, I) — the per-(orientation, ctf, image) displacement-LSE
    summary consumed by posterior.merge_block. Neither conv, the
    cross-spectra, nor the cc lattice ever leave VMEM.
    """
    o_n, n, f = proj_re.shape
    c_n = ctf_re.shape[0]
    oc = o_n * c_n
    n_img = img_re.shape[0]
    d = wy_re.shape[0]
    m_cols = wx_re.shape[1]
    if m_cols * n_fold != n:
        raise ValueError(
            f"wx has {m_cols} columns, expected N/n_fold = {n}/{n_fold}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mxu_mode is None:
        mxu_mode = _mxu_mode(interpret)
    img_tile = min(img_tile, n_img)
    if n_img % img_tile:
        raise ValueError(f"image count {n_img} not a multiple of tile {img_tile}")
    n_it = n_img // img_tile

    # Grid: images outer, (o, c) inner — the image tile stays resident in
    # VMEM across the whole (o, c) sweep; the ctf block is revolver-fetched
    # every step (only (N, F) f32 ×2 ≈ 0.2 MB), the proj block every c_n
    # steps. A 3-D grid keeps every index map a pure grid index or a
    # mul/add of one: floor-division index maps (o // c_n) trip an infinite
    # recursion in Mosaic's convert-lowering fallback under jax_enable_x64.
    grid = (n_it, o_n, c_n)
    proj_spec = pl.BlockSpec(
        (1, n, f), lambda it, io, ic: (io, ic * 0, ic * 0),
        memory_space=pltpu.VMEM,
    )
    ctf_spec = pl.BlockSpec(
        (1, n, f), lambda it, io, ic: (ic, ic * 0, ic * 0),
        memory_space=pltpu.VMEM,
    )
    img_spec = pl.BlockSpec(
        (img_tile, n, f), lambda it, io, ic: (it, ic * 0, ic * 0),
        memory_space=pltpu.VMEM,
    )
    # Per-(oc, image) scalars carry a trailing singleton dim: Mosaic requires
    # the block's last two dims to be (8k, 128k) or equal to the array dims —
    # (1, img_tile, 1) against (OC, I, 1) satisfies that with all in-kernel
    # indices static. Inputs (a_u, b_u) live in SMEM so the kernel reads true
    # scalars; outputs are written as (img_tile, 1) VMEM vectors.
    smem_spec = pl.BlockSpec(
        (1, img_tile, 1), lambda it, io, ic: (io * c_n + ic, it, ic * 0),
        memory_space=pltpu.SMEM,
    )
    scal_spec = pl.BlockSpec(
        (1, img_tile, 1), lambda it, io, ic: (io * c_n + ic, it, ic * 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [scal_spec] * 4
    out_shapes = [
        jax.ShapeDtypeStruct((oc, n_img, 1), jnp.float32),
        jax.ShapeDtypeStruct((oc, n_img, 1), jnp.float32),
        jax.ShapeDtypeStruct((oc, n_img, 1), jnp.int32),
        jax.ShapeDtypeStruct((oc, n_img, 1), jnp.float32),
    ]
    dp = _cdiv(d, 8) * 8
    cost = pl.CostEstimate(
        flops=2 * oc * n_img * 3 * (4 * m_cols * f * d + 4 * d * f * d),
        bytes_accessed=4 * 2 * (o_n + c_n * n_it + n_img * 2) * n * f,
        transcendentals=2 * oc * n_img * d * d,  # log1p + exp per lattice pt
    )
    kern = partial(
        _fused_block_kernel,
        n_fold=n_fold, d=d, dp=dp, a_coef=float(a_coef), mxu_mode=mxu_mode,
    )
    common = [proj_spec, proj_spec, ctf_spec, ctf_spec, img_spec, img_spec,
              smem_spec, smem_spec]
    a_u3 = a_u[..., None]
    b_u3 = b_u[..., None]
    if mxu_mode == "stacked":
        a96, w2 = _stacked_weight_banks(wx_re, wx_im, wy_re, wy_im, d, dp)
        in_specs = common + [
            pl.BlockSpec((4 * dp, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 4 * dp), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
        ]
        args = (proj_re, proj_im, ctf_re, ctf_im, img_re, img_im, a_u3, b_u3, a96, w2)
    else:
        in_specs = common + [
            pl.BlockSpec((d, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
        ]
        args = (proj_re, proj_im, ctf_re, ctf_im, img_re, img_im, a_u3, b_u3,
                wx_re, wx_im, wy_re, wy_im)
    m, se, ds, ccs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return m[..., 0], se[..., 0], ds[..., 0], ccs[..., 0]


# ---------------------------------------------------------------------------
# cc-only kernel (unit-test surface + kernel lab)
# ---------------------------------------------------------------------------

def _fused_cc_kernel(
    conv_re_ref, conv_im_ref, img_re_ref, img_im_ref,
    *w_and_out,
    n_fold: int, d: int, dp: int, mxu_mode: str,
):
    if mxu_mode == "stacked":
        a96_ref, w2_ref, out_ref = w_and_out
    else:
        wxr_ref, wxi_ref, wyr_ref, wyi_ref, out_ref = w_and_out
        prec = (
            jax.lax.Precision.HIGHEST
            if mxu_mode == "highest"
            else jax.lax.Precision.DEFAULT
        )
        dot = partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)
    cr = conv_re_ref[0]  # (N, F)
    ci = conv_im_ref[0]
    it = img_re_ref.shape[0]
    for i in range(it):
        ir = img_re_ref[i]
        ii = img_im_ref[i]
        if mxu_mode == "stacked":
            a96 = a96_ref[:]
            out_ref[0, i] = _cc_tile_stacked(
                cr, ci, ir, ii, a96, a96[0:2 * dp], w2_ref[:], n_fold, d, dp
            )
        else:
            out_ref[0, i] = _cc_tile_simple(
                cr, ci, ir, ii,
                wxr_ref[:], wxi_ref[:], wyr_ref[:].T, wyi_ref[:].T,
                n_fold, dot,
            )


def fused_displacement_cc(
    conv_re: jnp.ndarray,  # (OC, N, F) f32
    conv_im: jnp.ndarray,
    img_re: jnp.ndarray,  # (I, N, F) f32 — conj(rfft2(img))·h/N² prefolded
    img_im: jnp.ndarray,
    wx_re: jnp.ndarray,  # (D, N/n_fold) f32
    wx_im: jnp.ndarray,
    wy_re: jnp.ndarray,  # (D, F) f32
    wy_im: jnp.ndarray,
    *,
    img_tile: int = 32,
    n_fold: int = 1,
    interpret: bool | None = None,
    mxu_mode: str | None = None,
) -> jnp.ndarray:
    """cc[oc, i, d, e] — same contract as posterior.displacement_cc.

    ``img_tile`` images are processed per grid step; I must be a multiple
    (the engine pads its image bank). ``n_fold`` > 1 enables the stride-fold
    optimisation: pass wx with N/n_fold columns (the first N/n_fold columns
    of the full weight matrix — valid when every displacement is a multiple
    of n_fold and n_fold divides N). ``interpret`` defaults to True off-TPU
    so the kernel is testable on the CPU mesh. ``mxu_mode`` overrides the
    BIOEM_TPU_MXU_PRECISION policy (see _mxu_mode).
    """
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
    if mxu_mode is None:
        mxu_mode = _mxu_mode(interpret)
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
    out_spec = pl.BlockSpec(
        (1, img_tile, d, d), lambda it, o: (o, it, o * 0, o * 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((oc, n_img, d, d), jnp.float32)
    dp = _cdiv(d, 8) * 8
    cost = pl.CostEstimate(
        flops=2 * oc * n_img * 3 * (4 * m * f * d + 4 * d * f * d),
        bytes_accessed=4 * 2 * (oc + n_img * 2) * n * f,
        transcendentals=0,
    )
    kern = partial(
        _fused_cc_kernel, n_fold=n_fold, d=d, dp=dp, mxu_mode=mxu_mode
    )
    if mxu_mode == "stacked":
        a96, w2 = _stacked_weight_banks(wx_re, wx_im, wy_re, wy_im, d, dp)
        in_specs = [conv_spec, conv_spec, img_spec, img_spec,
                    pl.BlockSpec((4 * dp, m), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((f, 4 * dp), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)]
        args = (conv_re, conv_im, img_re, img_im, a96, w2)
    else:
        in_specs = [conv_spec, conv_spec, img_spec, img_spec,
                    pl.BlockSpec((d, m), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, m), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, f), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, f), lambda it, o: (o * 0, o * 0), memory_space=pltpu.VMEM)]
        args = (conv_re, conv_im, img_re, img_im, wx_re, wx_im, wy_re, wy_im)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
