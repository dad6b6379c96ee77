"""Worker process for the 2-process jax.distributed test.

Each worker is one "host" of a multi-host run (the analogue of one MPI rank
of the reference, /root/reference/main.cpp:64-68): it joins the cluster via
``bioem_tpu.parallel.distributed.initialize`` (driven by the BIOEM_TPU_*
env vars the test sets), builds the same deterministic tiny problem from a
fixed seed (the analogue of every rank receiving the MPI_Bcast inputs,
bioem.cpp:453-503), runs the sharded engine over the global 2×2 mesh, and
process 0 writes the gathered results to an npz for the parent test to
compare against a single-process run.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=2 (2 devices per process,
4 global).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tiny_problem():
    from bioem_tpu.core.orientations import build_orientations
    from tests.conftest import tiny_images, tiny_model, tiny_params

    rng = np.random.default_rng(1234)
    p = tiny_params(write_angles=3)
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    return p, orients, model, images


def main():
    out_path = sys.argv[1]
    ckpt_path = sys.argv[2] if len(sys.argv) > 2 else ""
    mode = sys.argv[3] if len(sys.argv) > 3 else ""

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from bioem_tpu.parallel.distributed import global_bioem_mesh, initialize

    initialize()  # reads BIOEM_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from bioem_tpu.config import RunConfig
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p, orients, model, images = build_tiny_problem()
    cfg = RunConfig(orient_block=2, mesh_images=2, mesh_orient=2)
    if ckpt_path:
        cfg.checkpoint_path = ckpt_path
        cfg.checkpoint_every = 1
    if mode == "stream":
        # Streamed × sharded × multi-host: 2 chunks of 2 images through the
        # global 2×2 mesh, per-host ingest for every chunk after the first.
        from bioem_tpu.stream import ArraySource, run_streaming

        reads = []

        class RecordingSource(ArraySource):
            def chunk(self, start, stop):
                reads.append((start, stop))
                return super().chunk(start, stop)

        res, perf = run_streaming(
            p, orients, model, RecordingSource(images.maps), cfg,
            chunk_images=2,
        )
        assert perf["chunks"] == 2, perf
        if jax.process_index() == 1:
            # Per-host ingest: process 1 owns only padding rows of chunk 2
            # (all real rows shard onto process 0's devices for this tiny
            # shape), so it must read at most 1 fallback row — never the
            # full chunk.
            later = [(a, b) for (a, b) in reads if a >= 2]
            assert sum(b - a for a, b in later) <= 1, reads
    else:
        mesh = global_bioem_mesh(2, 2)
        eng = ShardedBioEMEngine(p, orients, model, images, cfg, mesh=mesh)
        res = eng.results(eng.run())

    if jax.process_index() == 0:
        np.savez(
            out_path,
            log_prob=res.log_prob,
            best_orient=res.best_orient,
            best_conv=res.best_conv,
            best_cent_x=res.best_cent_x,
            best_cent_y=res.best_cent_y,
            best_norm=res.best_norm,
            best_mu=res.best_mu,
            angle_log=res.angle_log,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
