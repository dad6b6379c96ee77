"""Pallas TPU kernel: radius-grouped Fourier-space projection.

Computes the same quantity as core.projection.project_fourier_batch
(reference createProjection + rfft2, /root/reference/bioem.cpp:1604-1853 —
see the radius-group algebra note in core/projection.py):

    proj_f[o] = Σ_g Ŝ_g ⊙ ( Ex_g[o]ᵀ · diag(dens) · Ey_g[o] )

The XLA pipeline pays three structural costs this kernel deletes:

* **Phase transcendentals**: cos/sin of θ·k for every (point, frequency) —
  2·P·(N+F) per orientation at ~10 cycles each, and with f32 arguments up
  to ~10³ rad the phases carry ~1e-4 rad rounding. Here the phase tables
  are powers of ONE unit complex z = e^{iθ} per point (2 transcendentals),
  built by log-depth doubling along sublanes (full lane occupancy, error
  ≤ ~8 ulp — an order more accurate than the XLA path).
* **MXU precision**: the group contraction needs f32 accuracy; in-kernel
  the 3-pass bf16 hi/lo scheme (see compare_pallas) halves the passes of
  an XLA Precision.HIGHEST dot.
* **HBM traffic**: the per-group spectra s_g (O·G·N·F·2 f32) never leave
  VMEM, and the stencil bank Ŝ is streamed ONCE per block (grid over g
  with the whole (O, N, F) output resident in VMEM) instead of once per
  orientation.

Inputs are the per-point phase increments and masked densities from
core.projection.fourier_prologue, grouped as (G, O, Pp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compare_pallas import _split_hilo


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _pow_table(cos_t, sin_t, rows: int):
    """(rows, Pp) split-complex table T[k] = z^k, z = cos + i·sin, (1, Pp).

    Log-depth doubling: T[0..2m) = [T[0..m), T[0..m) ⊙ z^m], z^m squared
    each step. Error after ⌈log2 rows⌉ ≤ 8 doublings is ≤ ~8 ulp."""
    lr, li = jnp.ones_like(cos_t), jnp.zeros_like(sin_t)
    zr, zi = cos_t, sin_t
    m = 1
    while m < rows:
        nr, ni = _cmul(lr, li, zr, zi)
        lr = jnp.concatenate([lr, nr], axis=0)
        li = jnp.concatenate([li, ni], axis=0)
        zr, zi = _cmul(zr, zi, zr, zi)
        m *= 2
    return lr[:rows], li[:rows]


def _dot3(a, b):
    """3-pass bf16 matmul (hi·hi + hi·lo + lo·hi) — ~f32 accuracy."""
    ah, al = _split_hilo(a)
    bh, bl = _split_hilo(b)
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _project_kernel(
    thx_ref, thy_ref, dens_ref, st_re_ref, st_im_ref,
    out_re_ref, out_im_ref,
    *, n: int, nf: int, n_orient: int,
):
    g = pl.program_id(0)
    st_r = st_re_ref[0]  # (N, F)
    st_i = st_im_ref[0]
    thx = thx_ref[0]  # (O, Pp)
    thy = thy_ref[0]
    dens = dens_ref[0]
    for o in range(n_orient):
        tx = thx[o:o + 1]  # (1, Pp)
        ty = thy[o:o + 1]
        dn = dens[o:o + 1]
        ex_re, ex_im = _pow_table(jnp.cos(tx), jnp.sin(tx), n)  # (N, Pp)
        fy_re, fy_im = _pow_table(jnp.cos(ty), jnp.sin(ty), nf)  # (F, Pp)
        ex_re = ex_re * dn
        ex_im = ex_im * dn
        ey_re = jnp.transpose(fy_re, (1, 0))  # (Pp, F)
        ey_im = jnp.transpose(fy_im, (1, 0))
        # s = Σ_p ex_p ⊗ ey_p (complex): K-stacked real contractions.
        a2 = jnp.concatenate([ex_re, ex_im], axis=1)  # (N, 2Pp)
        b_re = jnp.concatenate([ey_re, -ey_im], axis=0)  # (2Pp, F)
        b_im = jnp.concatenate([ey_im, ey_re], axis=0)
        s_re = _dot3(a2, b_re)  # (N, F)
        s_im = _dot3(a2, b_im)
        contrib_re = st_r * s_re - st_i * s_im
        contrib_im = st_r * s_im + st_i * s_re

        @pl.when(g == 0)
        def _():
            out_re_ref[o] = contrib_re
            out_im_ref[o] = contrib_im

        @pl.when(g > 0)
        def _():
            out_re_ref[o] = out_re_ref[o] + contrib_re
            out_im_ref[o] = out_im_ref[o] + contrib_im


def fourier_project_block(
    theta_x: jnp.ndarray,  # (G, O, Pp) f32 — −2π·i0/N per point
    theta_y: jnp.ndarray,  # (G, O, Pp) f32
    dens: jnp.ndarray,  # (G, O, Pp) f32 — masked densities
    st_re: jnp.ndarray,  # (G, N, F) f32 — stencil DFT bank
    st_im: jnp.ndarray,
    *,
    n: int,
    interpret: bool | None = None,
):
    """UNSCALED projection spectra (O, N, F) ×2 — the caller applies the
    norm_den/tempden factor (it needs the per-group density sums anyway)."""
    g_n, o_n, pp = theta_x.shape
    nf = n // 2 + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th_spec = pl.BlockSpec(
        (1, o_n, pp), lambda g: (g, g * 0, g * 0), memory_space=pltpu.VMEM
    )
    st_spec = pl.BlockSpec(
        (1, n, nf), lambda g: (g, g * 0, g * 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (o_n, n, nf), lambda g: (g * 0, g * 0, g * 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * g_n * o_n * 3 * 2 * (2 * pp) * n * nf,
        bytes_accessed=4 * (3 * g_n * o_n * pp + 2 * g_n * n * nf + 2 * o_n * n * nf),
        transcendentals=4 * g_n * o_n * pp,
    )
    return pl.pallas_call(
        partial(_project_kernel, n=n, nf=nf, n_orient=o_n),
        grid=(g_n,),
        in_specs=[th_spec, th_spec, th_spec, st_spec, st_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((o_n, n, nf), jnp.float32),
            jax.ShapeDtypeStruct((o_n, n, nf), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(theta_x, theta_y, dens, st_re, st_im)
