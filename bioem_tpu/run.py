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


# Below this many (image × orientation × ctf) comparisons the autotuner's
# candidate timing runs cost more than they can recover; tiny runs (tests,
# golden cases) stay on the hand-tuned defaults.
AUTOTUNE_MIN_COMPARISONS = 150_000


def maybe_autotune(p, orients, model, images, cfg: RunConfig) -> RunConfig:
    """Resolve cfg.autotune (None = auto by problem size) and run the tuner.

    The reference autotunes its GPU/CPU split by default on every GPU run
    (/root/reference/autotuner.cpp:16-50, bioem.cpp:731-737); here the
    analogue is tuning block sizes/kernel choice whenever the problem is
    large enough to amortise the timing runs. Mesh runs tune too (the
    sharded engine times its own shard_map'd scan); multi-HOST runs keep
    the hand-tuned defaults unless forced — candidate timing is collective
    across processes, and a cache-file divergence between hosts would
    deadlock the fleet on mismatched compile sets."""
    if cfg.mesh_images * cfg.mesh_orient != 1 and jax.process_count() > 1:
        if cfg.autotune:
            import warnings

            warnings.warn(
                "autotune forced on a multi-host run: all processes must "
                "share the autotune cache file or timing may deadlock",
                RuntimeWarning,
            )
        else:
            return cfg
    on = cfg.autotune
    if on is None:
        grid_n = getattr(p, "_ctf_grid_n", None)
        if grid_n is None:
            from .params import make_ctf_grid

            grid_n = make_ctf_grid(p).n
        # Size at the shape the engine will actually run: debug caps
        # (BIOEM_DEBUG_BREAK/NMAPS) shrink the problem after this check.
        n_orient = min(orients.n, cfg.debug_break) if cfg.debug_break else orients.n
        if cfg.debug_break:
            grid_n = min(grid_n, cfg.debug_break)
        n_img = images.maps.shape[0]
        if cfg.debug_nmaps:
            n_img = min(n_img, cfg.debug_nmaps)
        comparisons = n_orient * grid_n * n_img
        on = comparisons >= AUTOTUNE_MIN_COMPARISONS
    if not on:
        return cfg
    from .runtime.autotune import autotune_config

    return autotune_config(
        p, orients, model, images, cfg, verbose=cfg.debug_output >= 1
    )


def make_engine(
    p: BioEMParams,
    orients: OrientationSet,
    model: Model,
    images: ImageStack,
    cfg: Optional[RunConfig] = None,
    model_layout: Optional[dict] = None,
) -> BioEMEngine:
    cfg = cfg or RunConfig.from_env()
    if cfg.mesh_images * cfg.mesh_orient > 1:
        from .parallel.mesh import ShardedBioEMEngine

        return ShardedBioEMEngine(
            p, orients, model, images, cfg, model_layout=model_layout
        )
    return BioEMEngine(p, orients, model, images, cfg, model_layout=model_layout)


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
    cfg = maybe_autotune(p, orients, model, images, cfg)
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
        # the engine itself, for post-passes that reuse its device banks
        # (continuous refinement: cli.py --Refine → refine.refine_results)
        "engine": eng,
    }
    return results, perf
