"""Kernel compile-cost vs Pallas image tile (VERDICT r2 weak #5).

The comparison kernel unrolls its image loop ``img_tile`` times, so Mosaic
compile time grows with the tile. This measures wall-clock lower+compile
time of the production block step at several tiles (bench problem shape)
and records them in BENCH_COMPILE.json, so the tile choice can account for
compile amortisation (the reference's kernels are compile-free at runtime;
ours pay once per shape, cached across processes by the JAX compile cache).

Usage: python tools/compile_bench.py [tile ...]   (default: 16 32 64)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    from bioem_tpu.config import force_cpu_if_requested

    force_cpu_if_requested()
    import jax

    from bench import build_problem
    from bioem_tpu.config import RunConfig
    from bioem_tpu.core.engine import BioEMEngine

    p, orients, model, images = build_problem()
    out = []
    for tile in tiles:
        cfg = RunConfig(
            autotune=False, use_pallas=True, fused_lse=True,
            pallas_img_tile=tile,
        )
        eng = BioEMEngine(p, orients, model, images, cfg)
        args = (
            eng.initial_state(), eng.banks, eng.ang_blocks[:1],
            eng.offsets[:1], eng.mask_blocks[:1],
        )
        t0 = time.perf_counter()
        lowered = eng._scan_run.lower(*args)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        del compiled
        rec = {
            "img_tile": tile,
            "lower_s": round(t_lower, 2),
            "compile_s": round(t_compile, 2),
            "backend": jax.default_backend(),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_COMPILE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
