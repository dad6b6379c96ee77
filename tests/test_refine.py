"""Continuous MAP refinement (bioem_tpu/refine.py).

Strategy: synthesize a particle with the *smooth* forward model at known
off-grid parameters, run the grid engine (argmax lands on the nearest grid
point), refine, and assert the refined parameters are strictly closer to
the planted truth than the grid seed. Plus a finite-difference check of
the autodiff gradient — the refinement's foundation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import build_orientations
from bioem_tpu.core.projection import fourier_epilogue
from bioem_tpu.io.map_io import ImageStack
from bioem_tpu.refine import (
    _logpro_smooth,
    exp_so3,
    refine_results,
    smooth_ctf_spectrum,
    smooth_projection_phases,
)
from tests.conftest import tiny_images, tiny_model, tiny_params


def _params(**kw):
    defaults = dict(
        n_pixels=24,
        pixel_size=1.5,
        grid_points_alpha=4,
        grid_points_beta=4,
        max_displace_center=4,
        grid_space_center=2,
        n_phase=2,
        start_defocus=0.6,
        end_defocus=1.4,
        n_env=1,
        start_bfactor=40.0,
        end_bfactor=40.0,
    )
    defaults.update(kw)
    return tiny_params(**defaults)


def _synth_image(engine, rot_star, ctf_idx, d_star, rng, noise_sigma=0.0,
                 amp_star=None, pha_star=None):
    """Render the smooth forward model at (rot*, ctf, d*) into a real image.

    The image spectrum is conv·e^{−i2πk·d*/N}; with the engine's conjugated
    prefolded image bank the posterior's displacement argmax then sits at
    dx = −d*, i.e. reported cent_x = +d*_x (posterior.py sign convention).
    """
    p = engine.p
    b = engine.banks
    n = p.n_pixels
    th_x, th_y = smooth_projection_phases(
        n, p.pixel_size, p.shift_x, p.shift_y,
        jnp.asarray(rot_star, jnp.float32), b.points, b.radii,
    )
    pr, pi = fourier_epilogue(
        engine.fspec, th_x, th_y, b.dens, b.norm_den, b.st_re, b.st_im,
        b.st_sums, signed_rows=True,
    )
    amp = b.amp[ctf_idx] if amp_star is None else jnp.asarray(amp_star, jnp.float32)
    pha = b.pha[ctf_idx] if pha_star is None else jnp.asarray(pha_star, jnp.float32)
    ctf = smooth_ctf_spectrum(
        n, p.pixel_size, p.use_psf, amp, pha, b.env[ctf_idx],
    )
    spec = (np.asarray(pr) + 1j * np.asarray(pi)) * np.asarray(ctf)
    nf = n // 2 + 1
    # signed row frequencies: a true subpixel shift of a real image
    k1 = ((np.arange(n) + n // 2) % n - n // 2)[:, None]
    k2 = np.arange(nf)[None, :]
    spec = spec * np.exp(-2j * np.pi * (k1 * d_star[0] + k2 * d_star[1]) / n)
    img = np.fft.irfft2(spec, s=(n, n)).astype(np.float64)
    if noise_sigma:
        img = img + rng.normal(0.0, noise_sigma * img.std(), img.shape)
    # normalise like MRC ingest (map.cpp:830-845) — refinement must be
    # invariant to the affine normalisation (norm/offset are integrated
    # analytically).
    img = (img - img.mean()) / img.std()
    return ImageStack(img[None].astype(np.float32))


def _angular_error(r_a, r_b):
    tr = np.trace(np.asarray(r_a, np.float64) @ np.asarray(r_b, np.float64).T)
    return math.acos(min(1.0, max(-1.0, (tr - 1.0) / 2.0)))


def test_gradient_matches_finite_difference(rng):
    p = _params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    images = tiny_images(rng, 1, p.n_pixels)
    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=4))
    b = eng.banks
    static = {
        "n": p.n_pixels,
        "ntot": float(p.n_total_pixels),
        "pixel_size": float(p.pixel_size),
        "shift_x": 0,
        "shift_y": 0,
        "use_psf": False,
        "fspec": eng.fspec,
        "p_obj": p,
        "points": b.points,
        "radii": b.radii,
        "dens": b.dens,
        "norm_den": b.norm_den,
        "st_re": b.st_re,
        "st_im": b.st_im,
        "st_sums": b.st_sums,
        "h": b.h,
    }
    consts = {
        "rot0": jnp.eye(3, dtype=jnp.float32),
        "amp0": b.amp[0],
        "pha0": b.pha[0],
        "env0": b.env[0],
        "d0": jnp.zeros(2, jnp.float64),
        "img_re": b.img_re[0],
        "img_im": b.img_im[0],
        "sum_ref": b.sum_ref[0],
        "ssq_ref": b.ssq_ref[0],
    }

    def f(vec):
        theta = {"omega": vec[:3], "d": vec[3:5], "dctf": vec[5:8]}
        return _logpro_smooth(theta, consts, static)

    vec0 = jnp.asarray(
        [0.05, -0.03, 0.02, 0.4, -0.3, 0.01, 0.5, 0.04], jnp.float64
    )
    g = np.asarray(jax.grad(f)(vec0))
    # eps balances truncation vs f32 cancellation noise: at 1e-5 the FD
    # quotient is noise-limited (~13% worst component, measured), at 1e-4
    # all components sit under 1%.
    eps = 1e-4
    for k in range(8):
        e = np.zeros(8)
        e[k] = eps
        fd = (float(f(vec0 + e)) - float(f(vec0 - e))) / (2 * eps)
        # The heavy tensors are float32 (split-precision policy), so both
        # the AD gradient and the FD quotient carry ~1% f32 noise; 2%
        # still catches any wrong term/sign in the objective.
        assert abs(fd - g[k]) <= 2e-2 * max(1.0, abs(fd)), (k, fd, g[k])


def test_exp_so3_gradient_finite_at_zero():
    g = jax.jacobian(exp_so3)(jnp.zeros(3, jnp.float64))
    assert np.all(np.isfinite(np.asarray(g)))
    # d/dωz at 0 is the generator [[0,-1,0],[1,0,0],[0,0,0]]
    gz = np.asarray(g)[:, :, 2]
    np.testing.assert_allclose(
        gz, [[0, -1, 0], [1, 0, 0], [0, 0, 0]], atol=1e-6
    )


def test_planted_recovery_refines(rng):
    # Gentle CTF (defocus 0.3-0.7 um): at the _params default 0.6-1.4 the
    # kernel oscillates ~15 periods across the band at N=24, the convolved
    # projections turn texture-like and the grid match is quasi-degenerate
    # (measured: a ~pi-away orientation wins by <20 log-units). The planted
    # basin must be well-posed for a recovery test to mean anything.
    p = _params(start_defocus=0.3, end_defocus=0.7)
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    # Planted rotation: a grid rotation perturbed by |ω| ≈ 0.08 rad —
    # far beyond what the coarse grid resolves, within the multi-start
    # capture radius (jitter_rot grid-cell scale). Verified while
    # building this test: the posterior surface ripples at pixel scale,
    # a SINGLE gradient/Newton flow from this seed drains into a
    # sidelobe 0.2 rad away (logpro 240 vs truth 725), and the
    # n_starts=16 default recovers the planted basin.
    from bioem_tpu.core.orientations import rotation_matrices

    base = np.asarray(
        rotation_matrices(
            jnp.asarray(orients.angles[7]), orients.use_quaternions
        ),
        np.float64,
    )
    w = np.array([0.05, -0.045, 0.04])
    rot_star = np.asarray(exp_so3(jnp.asarray(w))) @ base
    d_star = np.array([0.6, -0.4])

    boot = BioEMEngine(
        p, orients, model, tiny_images(rng, 1, p.n_pixels), RunConfig(orient_block=4)
    )
    images = _synth_image(boot, rot_star, 1, d_star, rng, noise_sigma=0.05)
    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=4))
    res = eng.results(eng.run())

    out = refine_results(eng, res)

    seed_rot = np.asarray(
        rotation_matrices(
            jnp.asarray(orients.angles[res.best_orient[0]]),
            orients.use_quaternions,
        ),
        np.float64,
    )
    ang_seed = _angular_error(seed_rot, rot_star)
    ang_ref = _angular_error(out.rotmat[0], rot_star)
    assert out.logpro_refined[0] >= out.logpro_seed[0]
    assert ang_ref < ang_seed, (ang_ref, ang_seed)
    assert ang_ref < 0.04, ang_ref

    # cent convention: reported cent == +d* (see _synth_image docstring)
    seed_err = np.hypot(
        res.best_cent_x[0] - d_star[0], res.best_cent_y[0] - d_star[1]
    )
    ref_err = np.hypot(out.cent_x[0] - d_star[0], out.cent_y[0] - d_star[1])
    assert ref_err < seed_err, (ref_err, seed_err)
    assert ref_err < 0.25, ref_err
    # Gradient ascent actually converged somewhere stationary-ish.
    assert np.isfinite(out.grad_norm[0])


def test_refine_ctf_improves_phase(rng):
    p = _params(n_phase=2, start_defocus=0.6, end_defocus=1.4)
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    boot = BioEMEngine(
        p, orients, model, tiny_images(rng, 1, p.n_pixels), RunConfig(orient_block=4)
    )
    # Plant a CTF phase midway between the two grid defoci by synthesizing
    # with an explicit off-grid phase value.
    from bioem_tpu.core.orientations import rotation_matrices

    rot_star = np.asarray(
        rotation_matrices(
            jnp.asarray(orients.angles[3]), orients.use_quaternions
        ),
        np.float64,
    )
    pha_star = 0.5 * (float(boot.banks.pha[0]) + float(boot.banks.pha[1]))
    b = boot.banks
    n = p.n_pixels
    th_x, th_y = smooth_projection_phases(
        n, p.pixel_size, 0, 0, jnp.asarray(rot_star, jnp.float32),
        b.points, b.radii,
    )
    pr, pi = fourier_epilogue(
        boot.fspec, th_x, th_y, b.dens, b.norm_den, b.st_re, b.st_im,
        b.st_sums, signed_rows=True,
    )
    ctf = smooth_ctf_spectrum(
        n, p.pixel_size, False, b.amp[0], jnp.asarray(pha_star, jnp.float32),
        b.env[0],
    )
    spec = (np.asarray(pr) + 1j * np.asarray(pi)) * np.asarray(ctf)
    img = np.fft.irfft2(spec, s=(n, n))
    img = (img - img.mean()) / img.std()
    images = ImageStack(img[None].astype(np.float32))

    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=4))
    res = eng.results(eng.run())
    out = refine_results(eng, res, refine_ctf=True)

    seed_pha = float(eng.banks.pha[res.best_conv[0]])
    assert abs(out.pha[0] - pha_star) < abs(seed_pha - pha_star)
    assert out.logpro_refined[0] >= out.logpro_seed[0]


def test_refine_ctf_amp_recovery(rng):
    """--RefineCTFAmp (r4 verdict next #8): plant an off-grid CTF
    amplitude; the grid pins amp (n_amp=1), so only the freed amp axis can
    close the gap. Also asserts the default path leaves amp untouched."""
    p = _params(n_phase=2, start_defocus=0.6, end_defocus=1.4)
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    boot = BioEMEngine(
        p, orients, model, tiny_images(rng, 1, p.n_pixels), RunConfig(orient_block=4)
    )
    from bioem_tpu.core.orientations import rotation_matrices

    rot_star = np.asarray(
        rotation_matrices(
            jnp.asarray(orients.angles[3]), orients.use_quaternions
        ),
        np.float64,
    )
    amp_grid = float(boot.banks.amp[0])
    amp_star = amp_grid + 0.15  # well off the (single-point) amp grid
    images = _synth_image(
        boot, rot_star, 0, np.zeros(2), rng, amp_star=amp_star
    )

    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=4))
    res = eng.results(eng.run())

    pinned = refine_results(eng, res, refine_ctf=True)
    assert pinned.amp[0] == pytest.approx(amp_grid)  # default: grid-pinned

    out = refine_results(eng, res, refine_ctf=True, refine_ctf_amp=True)
    assert out.logpro_refined[0] >= out.logpro_seed[0]
    assert abs(out.amp[0] - amp_star) < abs(amp_grid - amp_star)
    assert abs(out.amp[0] - amp_star) < 0.05, (out.amp[0], amp_star)
    assert 0.0 <= out.amp[0] <= 0.9999  # clamp respected


def test_refine_raster_engine_rejected(rng):
    p = _params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    images = tiny_images(rng, 1, p.n_pixels)
    eng = BioEMEngine(
        p, orients, model, images,
        RunConfig(orient_block=4), model_layout={"force_raster": True},
    )
    res = eng.results(eng.run())
    with pytest.raises(ValueError, match="Fourier projection layout"):
        refine_results(eng, res)


def test_refine_on_mesh_engine(rng):
    """Refinement works as a post-pass on a sharded (mesh) engine — banks
    are gathered to the default device (single-process)."""
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p = _params()
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)
    images = tiny_images(rng, 4, p.n_pixels)
    cfg = RunConfig(orient_block=4, mesh_images=2, mesh_orient=2)
    eng = ShardedBioEMEngine(p, orients, model, images, cfg)
    res = eng.results(eng.run())
    out = refine_results(eng, res, n_starts=4, iters=20)
    assert np.all(out.logpro_refined >= out.logpro_seed)
    assert out.rotmat.shape == (4, 3, 3)
    np.testing.assert_allclose(
        np.linalg.norm(out.quaternion, axis=1), 1.0, atol=1e-6
    )


def test_simulator_closure_recovery(rng):
    """Close the validation loop with the SIMULATOR (VERDICT r3 next #8).

    The forward model here is bioem_tpu.simulator.synthesize_best_map —
    the independent NumPy raster+CTF path of --PrintBestCalMap
    (reference bioem.cpp:1925-2085), NOT refine's own smooth surrogate —
    planted at jointly off-grid (orientation, fractional displacement,
    CTF phase) with WITHNOISE-style Gaussian noise. The grid engine +
    refine must recover every parameter to better than its grid spacing.
    """
    from bioem_tpu.core.orientations import rotation_matrices
    from bioem_tpu.params import BestParams
    from bioem_tpu.refine import _rotmat_to_quaternion
    from bioem_tpu.simulator import synthesize_best_map

    p = _params(
        n_pixels=48,
        pixel_size=1.5,
        use_quaternions=True,
        grid_points_quaternion=3,
        max_displace_center=6,
        grid_space_center=2,
        # gentle CTF: see test_planted_recovery_refines
        start_defocus=0.3,
        end_defocus=0.7,
    )
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)

    # Plant: grid orientation 5 perturbed by |w| ~ 0.22 rad (beyond the
    # raster-vs-smooth model bias of ~0.1 rad at this N, well inside the
    # ~1 rad ball-grid spacing); fractional displacement off the stride-2
    # integer lattice; phase midway between the two grid defoci.
    base = np.asarray(
        rotation_matrices(jnp.asarray(orients.angles[5]), True), np.float64
    )
    rot_star = np.asarray(exp_so3(jnp.asarray([0.15, -0.12, 0.10]))) @ base
    q_star = _rotmat_to_quaternion(rot_star[None])[0]
    d_star = np.array([2.6, -4.4])

    boot = BioEMEngine(
        p, orients, model, tiny_images(rng, 1, p.n_pixels),
        RunConfig(orient_block=4),
    )
    grid_pha = np.asarray(boot.banks.pha)
    pha_star = float(0.5 * (grid_pha[0] + grid_pha[1]))
    bp = BestParams(
        pixel_size=p.pixel_size,
        n_pixels=p.n_pixels,
        use_quaternions=True,
        orient=tuple(q_star),
        amp=float(boot.banks.amp[0]),
        phase=pha_star,
        env=float(boot.banks.env[0]),
    )
    res_sim = synthesize_best_map(bp, model)

    n = p.n_pixels
    nf = n // 2 + 1
    spec = np.fft.rfft2(res_sim.conv_map)
    # signed row frequencies: a true subpixel shift of the real image
    k1 = ((np.arange(n) + n // 2) % n - n // 2)[:, None]
    k2 = np.arange(nf)[None, :]
    spec = spec * np.exp(-2j * np.pi * (k1 * d_star[0] + k2 * d_star[1]) / n)
    img = np.fft.irfft2(spec, s=(n, n))
    img = img + rng.normal(0.0, 0.05 * img.std(), img.shape)
    img = (img - img.mean()) / img.std()
    images = ImageStack(img[None].astype(np.float32))

    eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=4))
    res = eng.results(eng.run())
    out = refine_results(eng, res, refine_ctf=True)

    seed_rot = np.asarray(
        rotation_matrices(
            jnp.asarray(orients.angles[res.best_orient[0]]), True
        ),
        np.float64,
    )
    ang_seed = _angular_error(seed_rot, rot_star)
    ang_ref = _angular_error(out.rotmat[0], rot_star)
    seed_d = np.hypot(
        res.best_cent_x[0] - d_star[0], res.best_cent_y[0] - d_star[1]
    )
    ref_d = np.hypot(out.cent_x[0] - d_star[0], out.cent_y[0] - d_star[1])
    seed_pha = float(grid_pha[res.best_conv[0]])

    assert out.logpro_refined[0] >= out.logpro_seed[0]
    assert ang_ref < ang_seed, (ang_ref, ang_seed)
    # absolute bar: the independent raster forward model carries ~0.1 rad
    # of smooth-surrogate bias at this N; 0.18 still beats the ~1 rad ball
    # grid spacing by 5x
    assert ang_ref < 0.18, ang_ref
    assert ref_d < seed_d, (ref_d, seed_d)
    assert ref_d < 1.0  # beats the stride-2 lattice
    assert abs(out.pha[0] - pha_star) < abs(seed_pha - pha_star)
