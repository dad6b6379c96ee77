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
