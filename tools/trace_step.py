"""Device-time breakdown of the production scan, from a jax.profiler trace.

Wall-clock through the axon tunnel is dominated by dispatch + eager output
transfer (~ms each), so component timings must come from TPU-side trace
events. Runs the bench problem's jitted scan over a few orientation blocks
under the profiler and prints every TPU op ≥1% of device time.

Usage: python tools/trace_step.py [n_blocks]
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def trace_device_ops(make_args, fn, tag):
    """{op_name: (total_us, count)} of TPU-side trace events + total.

    ``make_args`` builds fresh args per call (the scan donates its state)."""
    out = fn(*make_args())
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    args = make_args()
    tracedir = f"/tmp/trace_step/{tag}"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    jax.profiler.stop_trace()
    path = glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pidname = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs = collections.Counter()
    cnts = collections.Counter()
    jit_total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pidname.get(e["pid"], ""):
            name = e["name"]
            if name.startswith("jit_"):
                jit_total += e.get("dur", 0)
                continue
            durs[name] += e.get("dur", 0)
            cnts[name] += 1
    return durs, cnts, jit_total


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from bench import build_problem
    from bioem_tpu.config import RunConfig
    from bioem_tpu.run import make_engine

    p, orients, model, images = build_problem()
    cfg = RunConfig.from_env()
    eng = make_engine(p, orients, model, images, cfg)
    print(
        f"block: O={eng.o_block} C={eng.n_ctf} I={eng.n_img_pad} "
        f"N={p.n_pixels} D={len(eng.disp)} pallas={eng.use_pallas}"
    )

    ang = eng.ang_blocks[:n_blocks]
    off = eng.offsets[:n_blocks]
    msk = eng.mask_blocks[:n_blocks]

    def run(state, banks, ang, off, msk):
        return eng._scan_run(state, banks, ang, off, msk)

    def make_args():
        return (eng.initial_state(), eng.banks, ang, off, msk)

    durs, cnts, jit_total = trace_device_ops(make_args, run, "scan")
    dev_total = sum(durs.values())
    n_cmp = n_blocks * eng.o_block * eng.n_ctf * eng.n_img_pad
    print(f"device total: {dev_total/1e3:.3f} ms over {n_blocks} blocks "
          f"(jit event: {jit_total/1e3:.3f} ms)")
    print(f"→ {n_cmp / (dev_total/1e6):,.0f} comparisons/s (device-bound)")
    print(f"{'op':<60} {'ms':>9} {'count':>6} {'%':>5}")
    for name, us in durs.most_common():
        if us < 0.01 * dev_total:
            break
        print(f"{name[:60]:<60} {us/1e3:9.3f} {cnts[name]:6d} {100*us/dev_total:5.1f}")


if __name__ == "__main__":
    main()
