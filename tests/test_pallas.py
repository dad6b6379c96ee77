"""Fused Pallas comparison kernel == XLA einsum path (interpret mode on CPU).

The kernel (bioem_tpu/ops/compare_pallas.py) re-implements the hot op of the
reference comparison loop (/root/reference/bioem_cuda.cu:227-263); the XLA
path in bioem_tpu.core.posterior is the semantic spec.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import build_orientations
from bioem_tpu.core.posterior import displacement_cc, displacement_dft_weights
from bioem_tpu.ops.compare_pallas import fused_displacement_cc

from .conftest import tiny_images, tiny_model, tiny_params


def test_fused_cc_matches_einsum(rng):
    o, c, i, n = 2, 3, 16, 24
    f = n // 2 + 1
    disp = np.array([0, 1, 2, -2, -1], np.int32)
    wx, wy = displacement_dft_weights(n, disp)
    conv_re = rng.normal(0, 1, (o, c, n, f)).astype(np.float32)
    conv_im = rng.normal(0, 1, (o, c, n, f)).astype(np.float32)
    img_re = rng.normal(0, 1, (i, n, f)).astype(np.float32)
    img_im = rng.normal(0, 1, (i, n, f)).astype(np.float32)
    a = jnp.asarray
    args_w = (
        a(wx.real.copy()), a(wx.imag.copy()), a(wy.real.copy()), a(wy.imag.copy())
    )
    ref = displacement_cc(
        a(conv_re), a(conv_im), a(img_re), a(img_im), *args_w
    )
    fused = fused_displacement_cc(
        a(conv_re.reshape(o * c, n, f)), a(conv_im.reshape(o * c, n, f)),
        a(img_re), a(img_im), *args_w, img_tile=4,
    ).reshape(o, c, i, len(disp), len(disp))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("n_fold", [1, 2])
@pytest.mark.parametrize("n_disp", [5, 21])
def test_fused_cc_stacked_accuracy(rng, n_fold, n_disp):
    """The stacked 3-pass bf16 body (the TPU production path) must stay at
    the bf16-split rounding floor (~1e-5 rel) — NOT the single-pass bf16
    level (~1e-3), which would move the displacement argmax. This guards
    the in-kernel _split_hilo against a compiler simplifying the residual
    ``x - f32(bf16(x))`` to zero (no optimization_barrier exists inside
    Mosaic kernels). n_disp=21 exercises the dp=24 sublane padding."""
    oc, i, n = 4, 8, 32
    f = n // 2 + 1
    step = 2 if n_fold > 1 else 1
    disp = ((np.arange(n_disp) - n_disp // 2) * step).astype(np.int32)
    wx, wy = displacement_dft_weights(n, disp)
    conv_re = rng.normal(0, 1, (oc, n, f)).astype(np.float32)
    conv_im = rng.normal(0, 1, (oc, n, f)).astype(np.float32)
    img_re = rng.normal(0, 1, (i, n, f)).astype(np.float32)
    img_im = rng.normal(0, 1, (i, n, f)).astype(np.float32)

    p = (conv_re + 1j * conv_im).astype(np.complex128)[:, None] * (
        img_re + 1j * img_im
    ).astype(np.complex128)[None]
    t1 = np.einsum("dn,oinf->oidf", wx.astype(np.complex128), p)
    ref = np.einsum("ef,oidf->oide", wy.astype(np.complex128), t1).real

    m = n // n_fold
    a = jnp.asarray
    out = fused_displacement_cc(
        a(conv_re), a(conv_im), a(img_re), a(img_im),
        a(np.ascontiguousarray(wx.real[:, :m])),
        a(np.ascontiguousarray(wx.imag[:, :m])),
        a(wy.real.copy()), a(wy.imag.copy()),
        img_tile=4, n_fold=n_fold, mxu_mode="stacked",
    )
    err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert err < 5e-5, f"stacked kernel degraded to single-pass bf16: {err:.2e}"


def test_fused_cc_bad_tile_raises(rng):
    n = 8
    f = n // 2 + 1
    disp = np.array([0], np.int32)
    wx, wy = displacement_dft_weights(n, disp)
    a = jnp.asarray
    z = a(np.zeros((1, n, f), np.float32))
    zi = a(np.zeros((3, n, f), np.float32))
    with pytest.raises(ValueError, match="not a multiple"):
        fused_displacement_cc(
            z, z, zi, zi,
            a(wx.real.copy()), a(wx.imag.copy()),
            a(wy.real.copy()), a(wy.imag.copy()),
            img_tile=2,
        )


def test_engine_pallas_fold_matches_xla(rng):
    """Stride-fold path (grid_space_center=2 divides N) == XLA engine."""
    p = tiny_params(max_displace_center=4, grid_space_center=2)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)
    eng_ref = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    eng_pl = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, use_pallas=True, pallas_img_tile=2,
                  pallas_projection=False),
    )
    r_ref = eng_ref.results(eng_ref.run())
    r_pl = eng_pl.results(eng_pl.run())
    np.testing.assert_allclose(r_pl.log_prob, r_ref.log_prob, rtol=1e-9, atol=1e-7)
    np.testing.assert_array_equal(r_pl.best_cent_x, r_ref.best_cent_x)
    np.testing.assert_array_equal(r_pl.best_cent_y, r_ref.best_cent_y)


def test_engine_pallas_matches_xla(rng):
    """Full engine with use_pallas == default engine, to accumulator state."""
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 6, p.n_pixels)
    orients = build_orientations(p)

    eng_ref = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    eng_pl = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, use_pallas=True, pallas_img_tile=3,
                  pallas_projection=False),
    )
    r_ref = eng_ref.results(eng_ref.run())
    r_pl = eng_pl.results(eng_pl.run())

    np.testing.assert_allclose(r_pl.log_prob, r_ref.log_prob, rtol=1e-9, atol=1e-7)
    np.testing.assert_array_equal(r_pl.best_orient, r_ref.best_orient)
    np.testing.assert_array_equal(r_pl.best_conv, r_ref.best_conv)
    np.testing.assert_array_equal(r_pl.best_cent_x, r_ref.best_cent_x)
    np.testing.assert_array_equal(r_pl.best_cent_y, r_ref.best_cent_y)
    np.testing.assert_allclose(r_pl.best_norm, r_ref.best_norm, rtol=1e-5)


def test_engine_pallas_write_angles(rng):
    """Per-orientation posterior slabs through the Pallas path == XLA."""
    p = tiny_params(write_angles=3)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)
    e_x = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2, use_pallas=False))
    e_p = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, use_pallas=True, pallas_img_tile=2,
                  pallas_projection=False),
    )
    r_x = e_x.results(e_x.run())
    r_p = e_p.results(e_p.run())
    np.testing.assert_allclose(r_p.angle_log, r_x.angle_log, rtol=1e-9, atol=1e-7)


def test_engine_fused_lse_matches_xla(rng):
    """fused_lse=True (in-kernel displacement LSE — autotuner-selectable in
    production) == XLA engine, down to the argmax tuple."""
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)

    eng_ref = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    eng_fl = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, use_pallas=True, pallas_img_tile=2,
                  fused_lse=True, pallas_projection=False),
    )
    r_ref = eng_ref.results(eng_ref.run())
    r_fl = eng_fl.results(eng_fl.run())

    np.testing.assert_allclose(r_fl.log_prob, r_ref.log_prob, rtol=1e-9, atol=1e-7)
    np.testing.assert_array_equal(r_fl.best_orient, r_ref.best_orient)
    np.testing.assert_array_equal(r_fl.best_conv, r_ref.best_conv)
    np.testing.assert_array_equal(r_fl.best_cent_x, r_ref.best_cent_x)
    np.testing.assert_array_equal(r_fl.best_cent_y, r_ref.best_cent_y)
    np.testing.assert_allclose(r_fl.best_norm, r_ref.best_norm, rtol=1e-5)


def test_fused_batched_stage1_matches_loop(rng):
    """Lane-batched stage-1 variant must reproduce the per-image stacked
    body bit-comparably (same 3-pass bf16 arithmetic, reorganised issue
    structure)."""
    from bioem_tpu.ops.compare_pallas import fused_compare_block

    o, c, i_n, n, d = 2, 2, 4, 16, 5
    f = n // 2 + 1
    a = rng.normal(0, 1, (o, n, f)).astype(np.float32)
    b = rng.normal(0, 1, (o, n, f)).astype(np.float32)
    cr = rng.normal(0, 1, (c, n, f)).astype(np.float32)
    cim = rng.normal(0, 1, (c, n, f)).astype(np.float32)
    ir = rng.normal(0, 1, (i_n, n, f)).astype(np.float32)
    ii = rng.normal(0, 1, (i_n, n, f)).astype(np.float32)
    wxr = rng.normal(0, 1, (d, n)).astype(np.float32)
    wxi = rng.normal(0, 1, (d, n)).astype(np.float32)
    wyr = rng.normal(0, 1, (d, f)).astype(np.float32)
    wyi = rng.normal(0, 1, (d, f)).astype(np.float32)
    au = np.abs(rng.normal(0, 1e-4, (o * c, i_n))).astype(np.float32)
    bu = np.abs(rng.normal(0, 1e-6, (o * c, i_n))).astype(np.float32)

    kw = dict(a_coef=-3.0, img_tile=2, interpret=True, mxu_mode="stacked")
    ref = fused_compare_block(
        a, b, cr, cim, ir, ii, wxr, wxi, wyr, wyi, au, bu, **kw
    )
    bat = fused_compare_block(
        a, b, cr, cim, ir, ii, wxr, wxi, wyr, wyi, au, bu,
        batched_stage1=True, **kw
    )
    for r, x in zip(ref, bat):
        np.testing.assert_allclose(np.asarray(r), np.asarray(x), rtol=1e-6, atol=1e-6)


def test_engine_fused_batched_matches_xla(rng):
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)
    eng_ref = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    eng_fb = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, use_pallas=True, pallas_img_tile=2,
                  fused_lse=True, fused_batched=True, pallas_projection=False),
    )
    r_ref = eng_ref.results(eng_ref.run())
    r_fb = eng_fb.results(eng_fb.run())
    np.testing.assert_allclose(r_fb.log_prob, r_ref.log_prob, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(r_fb.best_orient, r_ref.best_orient)
    np.testing.assert_array_equal(r_fb.best_cent_x, r_ref.best_cent_x)


def test_stride_fold_requires_multiple_displacements(rng):
    """maxD % stride != 0 gives displacements that are NOT multiples of the
    stride ({-5,-2,1,4} at maxD=5 s=3); folding the wx rows there is
    invalid and corrupted cc by ~1e-1 log-units (round-4 corner-sweep
    catch). The Pallas path must agree with XLA on such lattices."""
    from bioem_tpu.core.posterior import stride_fold

    assert stride_fold(3, 15, np.array([0, 3, -5, -2])) == 1
    assert stride_fold(2, 16, np.array([-4, -2, 0, 2, 4])) == 2
    assert stride_fold(2, 15, np.array([-4, -2, 0, 2, 4])) == 1  # 2 ∤ 15

    p = tiny_params(
        n_pixels=15, max_displace_center=5, grid_space_center=3,
        grid_points_alpha=2, grid_points_beta=2,
    )
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 2, p.n_pixels)
    r_x = BioEMEngine(
        p, orients, model, images, RunConfig(orient_block=3, use_pallas=False)
    )
    rx = r_x.results(r_x.run())
    for fused in (False, True):
        r_p = BioEMEngine(
            p, orients, model, images,
            RunConfig(orient_block=3, use_pallas=True, fused_lse=fused,
                      pallas_img_tile=2, pallas_projection=False),
        )
        rp = r_p.results(r_p.run())
        np.testing.assert_allclose(rp.log_prob, rx.log_prob, atol=2e-4)
        np.testing.assert_array_equal(rp.best_cent_x, rx.best_cent_x)
        np.testing.assert_array_equal(rp.best_cent_y, rx.best_cent_y)


@pytest.mark.parametrize("split", ["rne", "masked"])
def test_split_hilo_modes(rng, split, monkeypatch):
    """Both hi/lo split modes must reconstruct x to the bf16-split floor.

    ``masked`` (BIOEM_TPU_SPLIT=masked, r4 verdict Weak #5) builds hi by
    integer mantissa masking — fold-proof against any float-algebra
    simplification of ``x - f32(bf16(x))`` — at the cost of ≤1 extra bit
    of residual vs round-to-nearest."""
    from bioem_tpu.ops.compare_pallas import _split_hilo

    monkeypatch.setenv("BIOEM_TPU_SPLIT", split)
    mag = np.float32(10.0) ** rng.uniform(-3, 3, (64, 64)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (64, 64)).astype(np.float32) * mag)
    hi, lo = _split_hilo(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    # hi must be exact in bf16 (round-trip is the identity).
    np.testing.assert_array_equal(
        np.asarray(hi.astype(jnp.float32).astype(jnp.bfloat16)), np.asarray(hi)
    )
    rec = np.asarray(hi.astype(jnp.float32)) + np.asarray(lo.astype(jnp.float32))
    err = np.abs(rec - np.asarray(x)) / np.maximum(np.abs(np.asarray(x)), 1e-30)
    assert err.max() < 2.0**-16, err.max()


def test_fused_cc_stacked_accuracy_masked_split(rng, monkeypatch):
    """The 3-pass kernel under the masked split stays at the split floor
    (≤1 bit above the rne mode's 5e-5 bound), through the same interpret
    pipeline the production kernel runs."""
    monkeypatch.setenv("BIOEM_TPU_SPLIT", "masked")
    oc, i, n, n_disp = 4, 8, 32, 5
    f = n // 2 + 1
    disp = (np.arange(n_disp) - n_disp // 2).astype(np.int32)
    wx, wy = displacement_dft_weights(n, disp)
    conv_re = rng.normal(0, 1, (oc, n, f)).astype(np.float32)
    conv_im = rng.normal(0, 1, (oc, n, f)).astype(np.float32)
    img_re = rng.normal(0, 1, (i, n, f)).astype(np.float32)
    img_im = rng.normal(0, 1, (i, n, f)).astype(np.float32)
    p = (conv_re + 1j * conv_im).astype(np.complex128)[:, None] * (
        img_re + 1j * img_im
    ).astype(np.complex128)[None]
    t1 = np.einsum("dn,oinf->oidf", wx.astype(np.complex128), p)
    ref = np.einsum("ef,oidf->oide", wy.astype(np.complex128), t1).real
    a = jnp.asarray
    out = fused_displacement_cc(
        a(conv_re), a(conv_im), a(img_re), a(img_im),
        a(np.ascontiguousarray(wx.real)), a(np.ascontiguousarray(wx.imag)),
        a(wy.real.copy()), a(wy.imag.copy()),
        img_tile=4, n_fold=1, mxu_mode="stacked",
    )
    err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert err < 1e-4, f"masked-split kernel degraded: {err:.2e}"
