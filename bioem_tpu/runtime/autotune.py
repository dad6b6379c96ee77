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


VMEM_BUDGET = 96 << 20  # bytes usable for the image tile + weight residents


def default_candidates(cfg: RunConfig, p=None, n_img: int = 0) -> List[RunConfig]:
    """Shape-derived candidate set (reference analogue: the autotuner's
    bisection domain, autotuner.cpp:118-149).

    Tunables: the Pallas image tile (bounded by the VMEM budget — the tile,
    both weight stacks and the per-oc conv block must stay resident), the
    in-kernel vs XLA displacement LSE, and the orientation block. On
    non-TPU backends only the XLA path's orientation block matters. Each
    candidate costs a compile, so the set is kept small."""
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = cfg.use_pallas if cfg.use_pallas is not None else on_tpu
    cands = []
    if use_pallas:
        tiles = [t for t in (8, 16, 32, 64) if not n_img or t <= max(n_img, 8)]
        if p is not None:
            per_img = p.n_pixels * p.n_fft_1d * 2 * 4  # split-f32 spectrum
            tiles = [t for t in tiles if t * per_img * 2 <= VMEM_BUDGET]
        tiles = tiles[-3:]  # the largest feasible tiles dominate
        for fused_lse in (False, True):
            for t in tiles:
                cands.append(
                    replace(
                        cfg, autotune=False, use_pallas=True,
                        pallas_img_tile=t, fused_lse=fused_lse,
                    )
                )
        for o_block in (4, 16):
            if o_block != cfg.orient_block:
                cands.append(
                    replace(
                        cfg, autotune=False, use_pallas=True,
                        orient_block=o_block, fused_lse=False,
                    )
                )
    else:
        for o_block in (4, 8, 16):
            cands.append(
                replace(cfg, autotune=False, orient_block=o_block, use_pallas=False)
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

    candidates = (
        list(candidates)
        if candidates is not None
        else default_candidates(cfg, p=p, n_img=images.maps.shape[0])
    )
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
