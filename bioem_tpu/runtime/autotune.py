"""Block-size / kernel-choice autotuner.

TPU-native analogue of the reference autotuner
(/root/reference/autotuner.cpp:16-149, defs.h:188-202): the reference tunes
one scalar — the GPU/CPU workload split — by bisection on comparison
timings. On a homogeneous TPU there is no host/device split; the tunables
are the orientation block size, the comparison kernel (XLA einsum vs fused
Pallas) and the Pallas image tile. The search is a timed argmin over a small
candidate set, measured on the real problem's first orientation blocks
(compile time excluded, like the reference's ``Needed``/``stable`` warmup
logic at autotuner.cpp:35-50).
"""

from __future__ import annotations

import time
from dataclasses import replace
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..config import RunConfig


def default_candidates(cfg: RunConfig) -> List[RunConfig]:
    cands = []
    for o_block in (4, 8, 16):
        cands.append(replace(cfg, autotune=False, orient_block=o_block, use_pallas=False))
        for tile in (8, 16):
            cands.append(
                replace(
                    cfg, autotune=False, orient_block=o_block,
                    use_pallas=True, pallas_img_tile=tile,
                )
            )
    return cands


def autotune_config(
    p,
    orients,
    model,
    images,
    cfg: RunConfig,
    candidates: Optional[Sequence[RunConfig]] = None,
    blocks: int = 3,
    repeats: int = 2,
    verbose: bool = False,
) -> RunConfig:
    """Pick the fastest RunConfig by timing real block steps per candidate."""
    from ..core.engine import BioEMEngine

    candidates = list(candidates) if candidates is not None else default_candidates(cfg)
    best_cfg, best_t = cfg, float("inf")
    for cand in candidates:
        try:
            eng = BioEMEngine(p, orients, model, images, cand)
        except Exception as e:  # incompatible candidate (e.g. tile > images)
            if verbose:
                print(f"autotune: skip {cand}: {e}")
            continue
        nb = min(blocks, eng.ang_blocks.shape[0])
        t_cand = float("inf")
        for _ in range(repeats + 1):  # first pass includes compile → dropped
            state = eng.initial_state()
            t0 = time.perf_counter()
            for b in range(nb):
                state = eng._step(
                    state, eng.banks, eng.ang_blocks[b], eng.offsets[b],
                    eng.mask_blocks[b],
                )
            jax.block_until_ready(state.total)
            np.asarray(state.total)  # force full sync (axon tunnel quirk)
            t_cand = min(t_cand, time.perf_counter() - t0)
        # normalise per orientation (block sizes differ)
        t_cand /= nb * eng.o_block
        if verbose:
            print(
                f"autotune: o_block={cand.orient_block} pallas={cand.use_pallas} "
                f"tile={cand.pallas_img_tile}: {t_cand*1e3:.3f} ms/orientation"
            )
        if t_cand < best_t:
            best_t, best_cfg = t_cand, cand
    return best_cfg
