"""Fourier-space projection == raster + rfft2 (same discretized stencil)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import build_orientations, rotation_matrices
from bioem_tpu.core.projection import (
    make_fourier_projection_spec,
    make_projection_spec,
    project_batch,
    project_fourier_batch,
)

from .conftest import tiny_images, tiny_model, tiny_params


def test_fourier_matches_raster_fft(rng):
    p = tiny_params(n_pixels=24)
    model = tiny_model(rng, n_points=20)
    spec = make_projection_spec(p, model.radii)
    fp = make_fourier_projection_spec(p, model.radii)
    assert fp is not None
    fspec, gather_idx, pad_mask, st, st_sums = fp

    orients = build_orientations(p)
    rotm = rotation_matrices(jnp.asarray(orients.angles[:3]), False)

    proj = project_batch(
        spec, rotm, jnp.asarray(model.points), jnp.asarray(model.radii),
        jnp.asarray(model.densities), jnp.float32(model.norm_den),
    )
    ref = np.fft.rfft2(np.asarray(proj))

    pr, pi = project_fourier_batch(
        fspec, rotm,
        jnp.asarray(model.points[gather_idx]),
        jnp.asarray(model.radii[gather_idx]),
        jnp.asarray(model.densities[gather_idx] * pad_mask),
        jnp.float32(model.norm_den),
        jnp.asarray(np.ascontiguousarray(st.real)),
        jnp.asarray(np.ascontiguousarray(st.imag)),
        jnp.asarray(st_sums),
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(pr), ref.real, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(pi), ref.imag, atol=2e-4 * scale)


def test_too_many_radius_groups_falls_back(rng):
    p = tiny_params()
    radii = np.linspace(1.0, 3.0, 100).astype(np.float32)
    assert make_fourier_projection_spec(p, radii) is None
    model = tiny_model(rng, n_points=100)
    model.radii[:] = radii
    images = tiny_images(rng, 2, p.n_pixels)
    orients = build_orientations(p)
    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    assert eng.fspec is None  # raster fallback engaged
    res = eng.results(eng.run())
    assert np.isfinite(res.log_prob).all()


def test_engine_fourier_vs_raster_logp(rng):
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)
    e_f = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2, projection="fourier"))
    e_r = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2, projection="raster"))
    assert e_f.fspec is not None and e_r.fspec is None
    r_f = e_f.results(e_f.run())
    r_r = e_r.results(e_r.run())
    np.testing.assert_allclose(r_f.log_prob, r_r.log_prob, atol=5e-3)
    np.testing.assert_array_equal(r_f.best_orient, r_r.best_orient)
    np.testing.assert_array_equal(r_f.best_cent_x, r_r.best_cent_x)


def test_fourier_mode_errors_on_continuous_radii(rng):
    p = tiny_params()
    model = tiny_model(rng, n_points=100)
    model.radii[:] = np.linspace(1.0, 3.0, 100).astype(np.float32)
    images = tiny_images(rng, 2, p.n_pixels)
    orients = build_orientations(p)
    with pytest.raises(ValueError, match="32 distinct radii"):
        BioEMEngine(p, orients, model, images, RunConfig(projection="fourier"))


# ---------------------------------------------------------------------------
# Out-of-frame diagnostics (reference bioem.cpp:1723-1731)
# ---------------------------------------------------------------------------


def test_oob_warning_on_partially_outside_model(rng):
    """Points that can leave the grid must trigger the once-per-run census
    warning, and the run must still complete with finite posteriors."""
    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=8, spread=4.0)
    # Push one point far enough that some orientations project it outside
    # the 16-px frame but the model never leaves entirely.
    model.points[0] = (30.0, 0.0, 0.0)
    images = tiny_images(rng, 2, p.n_pixels)
    with pytest.warns(RuntimeWarning, match="outside the 16x16 grid"):
        eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    res = eng.results(eng.run())
    assert np.all(np.isfinite(res.log_prob))


def test_oob_error_on_fully_outside_model(rng):
    """A model that projects entirely outside the grid for some orientation
    (tempden == 0 → NaN) must raise instead of silently returning NaN."""
    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=4, spread=1.0)
    model.points += np.float32(200.0)  # whole cloud far out of frame
    images = tiny_images(rng, 2, p.n_pixels)
    with pytest.raises(ValueError, match="entirely outside"):
        BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))


def test_in_bounds_model_skips_scan_and_warns_nothing(rng, recwarn):
    """Well-centred model: the O(P) bound proves safety; no warning."""
    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=6, spread=3.0)
    images = tiny_images(rng, 2, p.n_pixels)
    BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]
