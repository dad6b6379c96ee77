"""Bank-swapping engine modes: multi-model ranking and image streaming.

Both reuse ONE compiled block step via Banks swaps (model arrays for
rank.py — reference MODEL_COMPARISON workflow doc/index.rst:2290-2521;
image banks for stream.py — reference GPU image chunking map.cpp:549) and
must reproduce the independent-run results exactly.
"""

import numpy as np
import pytest

from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import build_orientations
from bioem_tpu.rank import common_model_layout, rank_models
from bioem_tpu.stream import ArraySource, MRCStackSource, run_streaming
from tests.conftest import tiny_images, tiny_model, tiny_params


def test_rank_matches_independent_runs(rng):
    p = tiny_params()
    orients = build_orientations(p)
    models = [tiny_model(rng, n_points=12), tiny_model(rng, n_points=9),
              tiny_model(rng, n_points=12)]
    images = tiny_images(rng, 3, p.n_pixels)
    cfg = RunConfig(orient_block=2)

    total, per_image, _ = rank_models(p, orients, models, images, cfg)

    for m, model in enumerate(models):
        eng = BioEMEngine(p, orients, model, images, cfg)
        res = eng.results(eng.run())
        np.testing.assert_allclose(per_image[m], res.log_prob, rtol=0, atol=2e-3)
    assert total.shape == (3,)


def test_rank_single_compile(rng, monkeypatch):
    """The whole point: N models must share ONE compiled step."""
    import jax

    p = tiny_params()
    orients = build_orientations(p)
    models = [tiny_model(rng, n_points=10), tiny_model(rng, n_points=7)]
    images = tiny_images(rng, 2, p.n_pixels)
    cfg = RunConfig(orient_block=2)
    layout = common_model_layout(p, models, cfg.projection)
    eng = BioEMEngine(p, orients, models[0], images, cfg, model_layout=layout)
    st0 = eng.run()
    banks1 = eng.swap_model(models[1])
    # Shape identity across the swap ⇒ the jit cache is hit, no retrace.
    for a, b in zip(eng.banks, banks1):
        assert a.shape == b.shape and a.dtype == b.dtype
    st1 = eng.run(banks=banks1)
    r0, r1 = eng.results(st0), eng.results(st1)
    assert not np.allclose(r0.log_prob, r1.log_prob)  # different models
    assert np.all(np.isfinite(r1.log_prob))


def test_rank_mixed_radius_layout(rng):
    """A continuous-radius model forces the raster path for all candidates."""
    p = tiny_params()
    m1 = tiny_model(rng, n_points=8)
    m2 = tiny_model(rng, n_points=40)  # 40 distinct radii > MAX_RADIUS_GROUPS
    lay = common_model_layout(p, [m1, m2])
    assert lay.get("force_raster")
    orients = build_orientations(p)
    images = tiny_images(rng, 2, p.n_pixels)
    total, per_image, _ = rank_models(
        p, orients, [m1, m2], images, RunConfig(orient_block=2)
    )
    for m, model in enumerate([m1, m2]):
        eng = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
        res = eng.results(eng.run())
        np.testing.assert_allclose(per_image[m], res.log_prob, rtol=0, atol=2e-3)


def test_streaming_matches_full_run(rng):
    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 7, p.n_pixels)  # 3 chunks of 3 (last short)
    cfg = RunConfig(orient_block=2)

    eng = BioEMEngine(p, orients, model, images, cfg)
    full = eng.results(eng.run())

    res, perf = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=3
    )
    assert perf["chunks"] == 3
    np.testing.assert_allclose(res.log_prob, full.log_prob, rtol=0, atol=1e-10)
    np.testing.assert_array_equal(res.best_orient, full.best_orient)
    np.testing.assert_array_equal(res.best_cent_x, full.best_cent_x)


def test_streaming_write_angles(rng):
    p = tiny_params(write_angles=2)
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 5, p.n_pixels)
    cfg = RunConfig(orient_block=2)
    eng = BioEMEngine(p, orients, model, images, cfg)
    full = eng.results(eng.run())
    res, _ = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    np.testing.assert_allclose(res.angle_log, full.angle_log, rtol=0, atol=1e-10)


def test_streamed_sharded_matches_nonstreamed_sharded(rng):
    """BASELINE config 5 composition: image streaming THROUGH the
    (img × orient) mesh — a 4-chunk streamed sharded run must equal the
    non-streamed sharded run exactly (reference: image chunking and
    rank-sliced orientations compose per MPI rank, map.cpp:549 +
    bioem.cpp:748-753)."""
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 8, p.n_pixels)
    cfg = RunConfig(orient_block=2, mesh_images=2, mesh_orient=4)

    eng = ShardedBioEMEngine(p, orients, model, images, cfg)
    ref = eng.results(eng.run())

    res, perf = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    assert perf["chunks"] == 4
    np.testing.assert_array_equal(res.log_prob, ref.log_prob)
    np.testing.assert_array_equal(res.best_orient, ref.best_orient)
    np.testing.assert_array_equal(res.best_conv, ref.best_conv)
    np.testing.assert_array_equal(res.best_cent_x, ref.best_cent_x)
    np.testing.assert_array_equal(res.best_norm, ref.best_norm)


def test_streamed_sharded_write_angles(rng):
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p = tiny_params(write_angles=2)
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)
    cfg = RunConfig(orient_block=2, mesh_images=2, mesh_orient=2)
    eng = ShardedBioEMEngine(p, orients, model, images, cfg)
    ref = eng.results(eng.run())
    res, _ = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    np.testing.assert_array_equal(res.angle_log, ref.angle_log)


def test_rank_on_mesh_matches_single_device(rng):
    """Multi-model ranking over the device mesh (swap_model placement must
    honour the mesh sharding)."""
    p = tiny_params()
    orients = build_orientations(p)
    models = [tiny_model(rng, n_points=12), tiny_model(rng, n_points=9)]
    images = tiny_images(rng, 4, p.n_pixels)

    total_1, per_image_1, _ = rank_models(
        p, orients, models, images, RunConfig(orient_block=2)
    )
    total_m, per_image_m, _ = rank_models(
        p, orients, models, images,
        RunConfig(orient_block=2, mesh_images=2, mesh_orient=2),
    )
    np.testing.assert_allclose(per_image_m, per_image_1, rtol=0, atol=1e-9)


def test_run_with_swapped_banks_requires_bank_tag(rng, tmp_path):
    """Checkpointing + swapped banks without an identity tag must refuse
    loudly: a completed checkpoint from bank A would otherwise be silently
    returned as bank B's result (round-2 VERDICT correctness bug)."""
    import pytest as _pytest

    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 2, p.n_pixels)
    cfg = RunConfig(
        orient_block=2, checkpoint_path=str(tmp_path / "s.npz"),
        checkpoint_every=1,
    )
    eng = BioEMEngine(p, orients, model, images, cfg)
    other = tiny_images(rng, 2, p.n_pixels)
    banks2 = eng.swap_images(other.maps)
    with _pytest.raises(ValueError, match="bank_tag"):
        eng.run(banks=banks2)


def test_streaming_checkpoint_chunk2_computes_not_loads(rng, tmp_path):
    """Streamed chunk 2 with checkpointing enabled must COMPUTE its result
    (per-chunk fingerprint + per-chunk file), never load chunk 1's completed
    state; and a restarted streamed run resumes chunk-accurate."""
    import os

    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)

    plain = BioEMEngine(p, orients, model, images, RunConfig(orient_block=2))
    ref = plain.results(plain.run())

    ckpt = str(tmp_path / "stream.npz")
    cfg = RunConfig(orient_block=2, checkpoint_path=ckpt, checkpoint_every=1)
    res, perf = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    assert perf["chunks"] == 2
    assert os.path.exists(ckpt + ".chunk0") and os.path.exists(ckpt + ".chunk1")
    # chunk 2's images get chunk 2's posterior (the round-2 bug returned
    # chunk 1's state for every later chunk)
    np.testing.assert_allclose(res.log_prob, ref.log_prob, rtol=1e-12)
    np.testing.assert_array_equal(res.best_orient, ref.best_orient)

    # Restart: both chunks resume from their completed checkpoints and the
    # result is unchanged.
    res2, _ = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    np.testing.assert_array_equal(res2.log_prob, res.log_prob)


def test_streamed_sharded_checkpoint(rng, tmp_path):
    """Streaming × sharding × checkpointing all composed (the full
    BASELINE-config-5 control path on the CPU mesh)."""
    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)

    cfg_plain = RunConfig(orient_block=2, mesh_images=2, mesh_orient=2)
    eng = ShardedBioEMEngine(p, orients, model, images, cfg_plain)
    ref = eng.results(eng.run())

    ckpt = str(tmp_path / "ss.npz")
    cfg = RunConfig(
        orient_block=2, mesh_images=2, mesh_orient=2,
        checkpoint_path=ckpt, checkpoint_every=1,
    )
    res, perf = run_streaming(
        p, orients, model, ArraySource(images.maps), cfg, chunk_images=2
    )
    assert perf["chunks"] == 2
    np.testing.assert_allclose(res.log_prob, ref.log_prob, rtol=1e-12)
    np.testing.assert_array_equal(res.best_orient, ref.best_orient)


def test_mrc_stack_source_chunks(rng, tmp_path):
    from bioem_tpu.io.map_io import read_mrc_maps
    from bioem_tpu.io.mrc import write_mrc

    maps = rng.normal(0, 1, (5, 8, 8)).astype(np.float32)
    path = str(tmp_path / "stack.mrc")
    write_mrc(path, maps)
    ref = read_mrc_maps(path, 8).maps
    src = MRCStackSource(path, 8)
    assert src.n_images == 5
    got = np.concatenate([src.chunk(0, 2), src.chunk(2, 5)])
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_sharded_per_call_checkpoint_path(rng, tmp_path):
    """r3 review fix: ShardedBioEMEngine.run must honour a per-call
    checkpoint_path even when the engine was built without
    cfg.checkpoint_path (the chunked runner is built lazily) — previously
    the override was silently dropped."""
    import os

    from bioem_tpu.parallel.mesh import ShardedBioEMEngine

    p = tiny_params()
    orients = build_orientations(p)
    model = tiny_model(rng)
    images = tiny_images(rng, 4, p.n_pixels)

    cfg = RunConfig(orient_block=2, mesh_images=2, mesh_orient=2)
    eng = ShardedBioEMEngine(p, orients, model, images, cfg)
    ref = eng.results(eng.run())

    ckpt = str(tmp_path / "percall.npz")
    eng2 = ShardedBioEMEngine(p, orients, model, images, cfg)
    res = eng2.results(eng2.run(checkpoint_path=ckpt))
    assert os.path.exists(ckpt)
    np.testing.assert_allclose(res.log_prob, ref.log_prob, rtol=1e-12)
