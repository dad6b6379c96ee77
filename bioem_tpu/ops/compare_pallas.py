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
