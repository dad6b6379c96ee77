"""High-level driver: choose single- vs multi-device engine and run.

The analogue of reference ``main()`` dispatch (CPU vs ``bioem_cuda_create``,
/root/reference/main.cpp:80-89) — here the choice is single chip vs a
(images × orientations) device mesh.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax

from .config import RunConfig
from .core.engine import BioEMEngine, Results
from .core.orientations import OrientationSet
from .io.map_io import ImageStack
from .io.model_io import Model
from .params import BioEMParams


def make_engine(
    p: BioEMParams,
    orients: OrientationSet,
    model: Model,
    images: ImageStack,
    cfg: Optional[RunConfig] = None,
) -> BioEMEngine:
    cfg = cfg or RunConfig.from_env()
    if cfg.mesh_images * cfg.mesh_orient > 1:
        from .parallel.mesh import ShardedBioEMEngine

        return ShardedBioEMEngine(p, orients, model, images, cfg)
    return BioEMEngine(p, orients, model, images, cfg)


def run_bioem(
    p: BioEMParams,
    orients: OrientationSet,
    model: Model,
    images: ImageStack,
    cfg: Optional[RunConfig] = None,
) -> Tuple[Results, dict]:
    """Run the full posterior computation; returns (results, perf stats).

    ``results.grid`` carries the CTF parameter grid for the output writers.
    """
    cfg = cfg or RunConfig.from_env()
    if cfg.autotune and cfg.mesh_images * cfg.mesh_orient == 1:
        from .runtime.autotune import autotune_config

        cfg = autotune_config(
            p, orients, model, images, cfg, verbose=cfg.debug_output >= 1
        )
    eng = make_engine(p, orients, model, images, cfg)
    from .utils.timestat import profile_trace

    t0 = time.perf_counter()
    with profile_trace(cfg.profile_dir):
        state = eng.run()
        jax.block_until_ready(state.total)
    run_s = time.perf_counter() - t0
    results = eng.results(state)
    results.grid = eng.grid
    comparisons = eng.n_orient * eng.n_ctf * eng.n_img
    perf = {
        "run_s": run_s,
        "comparisons": comparisons,
        "comparisons_per_s": comparisons / run_s if run_s > 0 else float("inf"),
        "n_devices": eng.cfg.mesh_images * eng.cfg.mesh_orient,
    }
    return results, perf
