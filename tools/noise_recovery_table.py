"""Noise-level vs recovery-accuracy table from the simulator closure loop.

r4 verdict next-step #8: quantify how the grid engine + continuous
refinement (--Refine) degrade with image noise. The forward model is the
SIMULATOR (bioem_tpu.simulator.synthesize_best_map — the independent NumPy
raster+CTF path of --PrintBestCalMap, reference bioem.cpp:1925-2085), NOT
refine's own smooth surrogate, so the loop closes across two independent
implementations. Per noise level, K trials plant a jointly off-grid
(orientation, fractional displacement, CTF phase) truth, add WITHNOISE-style
Gaussian noise at σ = level × signal-std (reference map.cpp:1219-1238
analogue), run the grid engine + refine, and record angular / displacement /
defocus-phase errors of the grid seed vs the refined output.

Usage:  python tools/noise_recovery_table.py [K_trials]
Writes BENCH_NOISE_RECOVERY.json and prints a markdown table for the manual.
CPU-friendly (forces the host platform unless NOISE_TABLE_TPU=1).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("NOISE_TABLE_TPU"):
    # The axon TPU plugin force-wins over the JAX_PLATFORMS env var; only
    # jax.config (after import) actually forces the host platform.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

# Matched-filter SNR integrates over N² pixels, so per-pixel noise ≲1×
# signal barely moves recovery at N=48; the interesting regime (and the
# breakdown point) is 2-8× (measured: flat medians through σ=0.6).
NOISE_LEVELS = (0.0, 0.3, 1.0, 2.0, 4.0, 8.0)


def one_trial(level: float, trial: int):
    import jax.numpy as jnp

    from bioem_tpu.config import RunConfig
    from bioem_tpu.core.engine import BioEMEngine
    from bioem_tpu.core.orientations import build_orientations, rotation_matrices
    from bioem_tpu.io.map_io import ImageStack
    from bioem_tpu.params import BestParams
    from bioem_tpu.refine import _rotmat_to_quaternion, exp_so3, refine_results
    from bioem_tpu.simulator import synthesize_best_map
    from tests.conftest import tiny_model, tiny_params

    rng = np.random.default_rng(1000 * trial + 17)
    p = tiny_params(
        n_pixels=48,
        pixel_size=1.5,
        use_quaternions=True,
        grid_points_quaternion=3,
        max_displace_center=6,
        grid_space_center=2,
        n_phase=2,
        start_defocus=0.3,
        end_defocus=0.7,
        n_env=1,
        start_bfactor=40.0,
        end_bfactor=40.0,
    )
    orients = build_orientations(p)
    model = tiny_model(rng, n_points=10)

    base_idx = int(rng.integers(0, orients.n))
    base = np.asarray(
        rotation_matrices(jnp.asarray(orients.angles[base_idx]), True), np.float64
    )
    # |w| ~ 0.26 rad: above the ~0.1 rad raster-vs-smooth-surrogate bias
    # floor at this N (see test_simulator_closure_recovery), well inside
    # the ~1 rad ball-grid spacing — so refinement improvement is visible
    # and attributable.
    w = rng.normal(0.0, 0.15, 3)
    rot_star = np.asarray(exp_so3(jnp.asarray(w, jnp.float64).astype(jnp.float32))) @ base
    q_star = _rotmat_to_quaternion(rot_star[None])[0]
    d_star = rng.uniform(-4.0, 4.0, 2)

    boot_images = ImageStack(
        rng.normal(0, 1, (1, p.n_pixels, p.n_pixels)).astype(np.float32)
    )
    boot = BioEMEngine(p, orients, model, boot_images, RunConfig(orient_block=4))
    grid_pha = np.asarray(boot.banks.pha)
    pha_star = float(rng.uniform(grid_pha.min(), grid_pha.max()))
    bp = BestParams(
        pixel_size=p.pixel_size,
        n_pixels=p.n_pixels,
        use_quaternions=True,
        orient=tuple(q_star),
        amp=float(boot.banks.amp[0]),
        phase=pha_star,
        env=float(boot.banks.env[0]),
    )
    sim = synthesize_best_map(bp, model)

    n = p.n_pixels
    nf = n // 2 + 1
    spec = np.fft.rfft2(sim.conv_map)
    k1 = ((np.arange(n) + n // 2) % n - n // 2)[:, None]
    k2 = np.arange(nf)[None, :]
    spec = spec * np.exp(-2j * np.pi * (k1 * d_star[0] + k2 * d_star[1]) / n)
    img = np.fft.irfft2(spec, s=(n, n))
    if level > 0:
        img = img + rng.normal(0.0, level * img.std(), img.shape)
    img = (img - img.mean()) / img.std()

    eng = BioEMEngine(
        p, orients, model, ImageStack(img[None].astype(np.float32)),
        RunConfig(orient_block=4),
    )
    res = eng.results(eng.run())
    out = refine_results(eng, res, refine_ctf=True)

    def ang_err(r):
        tr = np.trace(np.asarray(r, np.float64) @ rot_star.T)
        return math.acos(min(1.0, max(-1.0, (tr - 1.0) / 2.0)))

    seed_rot = np.asarray(
        rotation_matrices(jnp.asarray(orients.angles[res.best_orient[0]]), True),
        np.float64,
    )
    # Phase → defocus [μm] (the CLI's output unit, io/output.py):
    # defocus = pha / 2π / λ · 1e-4.
    to_um = 1e-4 / (2.0 * math.pi * p.electron_wavelength)
    return {
        "ang_seed": ang_err(seed_rot),
        "ang_refined": ang_err(out.rotmat[0]),
        "d_seed": float(np.hypot(res.best_cent_x[0] - d_star[0],
                                 res.best_cent_y[0] - d_star[1])),
        "d_refined": float(np.hypot(out.cent_x[0] - d_star[0],
                                    out.cent_y[0] - d_star[1])),
        "defocus_um_seed": abs(float(grid_pha[res.best_conv[0]]) - pha_star) * to_um,
        "defocus_um_refined": abs(float(out.pha[0]) - pha_star) * to_um,
    }


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    k_trials = int(argv[0]) if argv else 4
    rows = []
    for level in NOISE_LEVELS:
        trials = [one_trial(level, t) for t in range(k_trials)]
        row = {"noise_over_signal": level, "trials": k_trials}
        for key in trials[0]:
            row[key + "_median"] = round(
                float(np.median([t[key] for t in trials])), 4
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Markdown table for docs/manual.md.
    print("\n| σ/signal | ang seed→refined [rad] | d seed→refined [pix] "
          "| defocus seed→refined [μm] |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['noise_over_signal']} "
            f"| {r['ang_seed_median']:.3f} → {r['ang_refined_median']:.3f} "
            f"| {r['d_seed_median']:.2f} → {r['d_refined_median']:.2f} "
            f"| {r['defocus_um_seed_median']:.3f} → "
            f"{r['defocus_um_refined_median']:.3f} |"
        )

    artifact = {
        "description": (
            "Simulator-closure recovery accuracy vs WITHNOISE-style noise "
            "level (median over trials). Forward model: "
            "simulator.synthesize_best_map (independent raster path); "
            "engine grid argmax = seed, --Refine --RefineCTF = refined. "
            "Planted truths are jointly off-grid in orientation (ball-grid "
            "spacing ~1 rad), displacement (stride-2 lattice) and CTF "
            "phase (2-point defocus grid)."
        ),
        "rows": rows,
    }
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_NOISE_RECOVERY.json"
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
