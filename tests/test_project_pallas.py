"""Pallas Fourier-projection kernel == XLA Fourier projection (interpret
mode on CPU).

The kernel (bioem_tpu/ops/project_pallas.py) computes the same radius-group
spectra as core.projection.project_fourier_batch (reference createProjection
+ rfft2, /root/reference/bioem.cpp:1604-1853) with in-kernel power-table
phases; the XLA path is the semantic spec. Phase math differs (z^k doubling
vs cos/sin of k·θ), so parity is at the f32 rounding floor, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import build_orientations, rotation_matrices
from bioem_tpu.core.projection import (
    project_fourier_batch,
    project_fourier_batch_pallas,
)

from .conftest import tiny_images, tiny_model, tiny_params


def _fourier_engine(rng, **cfg_kw):
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)
    eng = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=2, projection="fourier", **cfg_kw),
    )
    assert eng.fspec is not None
    return eng, orients


def test_project_pallas_matches_xla_kernel(rng):
    """Direct kernel parity: same banks, same rotations, rel err at the
    f32/bf16-split floor."""
    eng, orients = _fourier_engine(rng)
    b = eng.banks
    rotm = rotation_matrices(
        jnp.asarray(orients.angles[:4]), orients.use_quaternions
    )
    args = (b.points, b.radii, b.dens, b.norm_den, b.st_re, b.st_im, b.st_sums)
    ref_r, ref_i = jax.jit(
        lambda rm: project_fourier_batch(eng.fspec, rm, *args)
    )(rotm)
    out_r, out_i = project_fourier_batch_pallas(
        eng.fspec, rotm, *args, interpret=True
    )
    scale = max(
        np.abs(np.asarray(ref_r)).max(), np.abs(np.asarray(ref_i)).max()
    )
    err = max(
        np.abs(np.asarray(out_r) - np.asarray(ref_r)).max(),
        np.abs(np.asarray(out_i) - np.asarray(ref_i)).max(),
    ) / scale
    assert err < 5e-5, f"pallas projection diverged from XLA path: {err:.2e}"


def test_engine_pallas_projection_matches(rng):
    """Full engine with the Pallas projection == XLA-projection engine to
    posterior tolerance (phase-table rounding differs, so ~1e-5 on logP —
    well inside the reference's own CPU/GPU spread,
    /root/reference/doc/index.rst:1519-1533)."""
    p = tiny_params()
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    orients = build_orientations(p)

    def build(flag):
        return BioEMEngine(
            p, orients, model, images,
            RunConfig(orient_block=2, projection="fourier",
                      pallas_projection=flag),
        )

    eng_ref, eng_pl = build(False), build(True)
    r_ref = eng_ref.results(eng_ref.run())
    r_pl = eng_pl.results(eng_pl.run())
    np.testing.assert_allclose(
        r_pl.log_prob, r_ref.log_prob, rtol=1e-7, atol=1e-4
    )
    np.testing.assert_array_equal(r_pl.best_orient, r_ref.best_orient)
    np.testing.assert_array_equal(r_pl.best_cent_x, r_ref.best_cent_x)
    np.testing.assert_array_equal(r_pl.best_cent_y, r_ref.best_cent_y)
