"""Benchmark: image×orientation comparisons/s/chip vs a CPU reference proxy.

One "comparison" = one (image, orientation, ctf) posterior contribution
integrated over the full displacement grid (BASELINE.md). The baseline is a
vectorised NumPy implementation of the reference algorithm (full-map c2r FFT
cross-correlation + per-lattice-point double-precision log-posterior, the
same algorithm as /root/reference/bioem.cpp:1435-1459 + bioem_algorithm.h),
measured live on this host and scaled by core count (the reference
parallelises over images with OpenMP, map.cpp/bioem.cpp:1392).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Benchmark configuration (scaled-down BASELINE config 2: quaternion grid ×
# defocus/env CTF bank × 21×21 displacement lattice at production N=224).
N_PIXELS = 224
N_IMG = int(os.environ.get("BENCH_NIMG", 64))
QUAT_GRID = int(os.environ.get("BENCH_QUATGRID", 7))  # → ~536 orientations
MAX_DISP, DISP_STEP = 20, 2
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
BASELINE_SAMPLE_OC = int(os.environ.get("BENCH_BASELINE_SAMPLE", 4))


def build_problem():
    from bioem_tpu.params import BioEMParams
    from bioem_tpu.io.model_io import Model
    from bioem_tpu.io.map_io import ImageStack
    from bioem_tpu.core.orientations import build_orientations

    p = BioEMParams(
        pixel_size=1.06,
        n_pixels=N_PIXELS,
        use_quaternions=True,
        grid_points_quaternion=QUAT_GRID,
        n_amp=1,
        start_amp=0.1,
        end_amp=0.1,
        n_phase=4,
        start_defocus=0.5,
        end_defocus=2.5,
        n_env=2,
        start_bfactor=2.0,
        end_bfactor=100.0,
        max_displace_center=MAX_DISP,
        grid_space_center=DISP_STEP,
    ).finalize_ctf_mode()
    orients = build_orientations(p)
    rng = np.random.default_rng(0)
    npts = 500  # ~protein-complex Cα count
    pts = rng.uniform(-80, 80, (npts, 3)).astype(np.float32)
    # Radii/densities drawn from the PDB residue tables (the production
    # model shape: ≤20 distinct radii, reference model.cpp:738-844).
    from bioem_tpu.io.model_io import AA_DENSITY, AA_RADIUS

    residues = rng.choice(list(AA_RADIUS), npts)
    radii = np.array([AA_RADIUS[r] for r in residues], np.float32)
    dens = np.array([AA_DENSITY[r] for r in residues], np.float32)
    model = Model(pts, radii, dens, float(dens.sum())).center_density_mass()
    maps = rng.normal(0, 1, (N_IMG, N_PIXELS, N_PIXELS)).astype(np.float32)
    images = ImageStack(maps)
    return p, orients, model, images


def bench_engine(p, orients, model, images):
    import jax
    from bioem_tpu.config import RunConfig
    from bioem_tpu.run import make_engine

    cfg = RunConfig.from_env()
    eng = make_engine(p, orients, model, images, cfg)
    # warmup/compile. NOTE: timing must force a device→host read — on some
    # PJRT backends block_until_ready does not fully synchronise.
    state = eng.run()
    np.asarray(state.total)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = eng.run()
        jax.block_until_ready(state.total)
        np.asarray(state.total)
        best = min(best, time.perf_counter() - t0)
    comparisons = eng.n_orient * eng.n_ctf * eng.n_img
    n_chips = cfg.mesh_images * cfg.mesh_orient
    return comparisons / best / n_chips, comparisons


def bench_numpy_baseline(p, orients, model, images):
    """Reference-algorithm proxy: full irfft2 CC + f64 logpro at the lattice."""
    from bioem_tpu.core.ctf import build_ctf_bank
    from bioem_tpu.params import displacement_lists, make_ctf_grid
    from tests.oracle.oracle import project, rotmat_quat

    n = p.n_pixels
    grid = make_ctf_grid(p)
    bank = build_ctf_bank(p, grid)
    disp, cent = displacement_lists(p)
    maps = images.maps
    img_fft = np.fft.rfft2(maps)
    img_fft_c = np.conj(img_fft)
    sref = maps.reshape(len(maps), -1).sum(1)
    ssref = (maps.reshape(len(maps), -1) ** 2).sum(1)
    ntot = p.n_total_pixels

    proj = project(
        p,
        model.points.astype(np.float64),
        model.radii,
        model.densities,
        model.norm_den,
        rotmat_quat(orients.angles[0]),
    )
    proj_fft = np.fft.rfft2(proj)

    n_sample = min(BASELINE_SAMPLE_OC, grid.n)
    t0 = time.perf_counter()
    for c in range(n_sample):
        conv = proj_fft * np.conj(bank[c])
        s_c = conv[0, 0].real
        ss_c = np.sum(np.abs(conv[:, 1:-1]) ** 2) * 2 + np.sum(
            np.abs(conv[:, [0, -1]]) ** 2
        )
        ss_c /= ntot
        cc_full = np.fft.irfft2(conv[None] * img_fft_c, s=(n, n))  # (I, N, N)
        cc = cc_full[:, cent][:, :, cent]  # (I, D, D)
        forlog = ss_c * ntot - s_c * s_c
        firstele = (
            ntot * (ssref[:, None, None] * ss_c - cc * cc)
            + 2 * sref[:, None, None] * s_c * cc
            - ssref[:, None, None] * s_c * s_c
            - sref[:, None, None] ** 2 * ss_c
        )
        logpro = (3 - ntot) * 0.5 * np.log(firstele) + (ntot * 0.5 - 2) * np.log(
            (ntot - 2) * forlog
        )
        mx = logpro.max(axis=(1, 2))
        np.exp(logpro - mx[:, None, None]).sum(axis=(1, 2))
    dt = time.perf_counter() - t0
    comparisons_sampled = n_sample * len(maps)
    ncores = os.cpu_count() or 1
    return comparisons_sampled / dt * ncores


def bench_accuracy():
    """BASELINE.md accuracy metric: max |Δlog P| vs the reference binary's
    golden output (tests/golden, produced by the compiled reference BioEM),
    measured on the current backend. None if goldens are absent."""
    import shutil
    import tempfile

    data = os.path.join(os.path.dirname(__file__), "tests", "golden", "data")
    case = os.path.join(data, "case_a_euler_ctf")
    if not os.path.isdir(case):
        return None
    import re

    import numpy as np

    from bioem_tpu.cli import main as cli_main

    def parse(text):
        vals = {}
        for line in text.splitlines():
            m = re.match(r"RefMap: (\d+) LogProb:\s+(\S+)", line)
            if m:
                vals[int(m.group(1))] = float(m.group(2))
        return np.array([vals[i] for i in range(len(vals))])

    with tempfile.TemporaryDirectory() as td:
        work = os.path.join(td, "case")
        shutil.copytree(case, work)
        old = os.getcwd()
        os.chdir(work)
        try:
            cli_main([
                "--Modelfile", "model.txt", "--Particlesfile", "maps.txt",
                "--Inputfile", "param.txt",
                "--OutputFile", "Output_Probabilities.tpu",
            ])
            with open("Output_Probabilities.tpu") as f:
                ours = parse(f.read())
            with open("Output_Probabilities.golden") as f:
                golden = parse(f.read())
        finally:
            os.chdir(old)
    return float(np.max(np.abs(ours - golden)))


def main():
    p, orients, model, images = build_problem()
    tpu_rate, comparisons = bench_engine(p, orients, model, images)
    base_rate = bench_numpy_baseline(p, orients, model, images)
    max_dlogp = bench_accuracy()
    print(
        json.dumps(
            {
                "metric": "image×orientation×ctf comparisons/s/chip",
                "value": round(tpu_rate, 1),
                "unit": "comparisons/s",
                "vs_baseline": round(tpu_rate / base_rate, 2),
                # Honesty notes (BASELINE.md defines both metrics):
                # vs_baseline is a PROXY — a live NumPy reimplementation of
                # the reference algorithm scaled by host core count, NOT the
                # reference's own published cluster scaling.
                "baseline_kind": "numpy-proxy×cores",
                # max |Δlog P| vs the compiled reference binary's golden
                # output (tests/golden case A) on this backend.
                "max_abs_dlogp_vs_reference": max_dlogp,
            }
        )
    )


if __name__ == "__main__":
    main()
