"""Device-time lab for the fused CC kernel variants (profiler-based).

Wall-clock through the axon tunnel carries ~ms dispatch noise, so every
measurement here is the TPU-side duration of the pallas custom call taken
from a jax.profiler trace. Usage: python tools/kernel_lab.py [variant ...]
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
import jax.numpy as jnp
import numpy as np

from bioem_tpu import defs

defs.enable_x64()

OC, I, N, F, D, S = 64, 64, 224, 113, 21, 2
M = N // S
REPS = 20


def build_args():
    from bioem_tpu.core.posterior import displacement_dft_weights

    rng = np.random.default_rng(0)
    disp = (np.arange(D) - D // 2) * S
    wx, wy = displacement_dft_weights(N, disp)
    return tuple(
        map(
            jnp.asarray,
            (
                rng.normal(0, 1, (OC, N, F)).astype(np.float32),
                rng.normal(0, 1, (OC, N, F)).astype(np.float32),
                rng.normal(0, 1, (I, N, F)).astype(np.float32),
                rng.normal(0, 1, (I, N, F)).astype(np.float32),
                np.ascontiguousarray(wx.real[:, :M]),
                np.ascontiguousarray(wx.imag[:, :M]),
                np.ascontiguousarray(wy.real),
                np.ascontiguousarray(wy.imag),
            ),
        )
    )


def device_ms(fn, args, tag):
    """Per-iteration device time of fn inside a length-REPS scan."""

    @jax.jit
    def g(cr, ci, gr, gi, wxr, wxi, wyr, wyi):
        def body(c, _):
            o = fn(cr, ci, gr, gi, wxr + c, wxi, wyr, wyi)
            return o.ravel()[0] * 1e-30, None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    s = g(*args)
    np.asarray(s)
    tracedir = f"/tmp/kernel_lab/{tag}"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    s = g(*args)
    np.asarray(s)
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
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pidname.get(e["pid"], ""):
            name = e["name"]
            if name.startswith("jit_"):
                total = e.get("dur", 0)
            durs[name] += e.get("dur", 0)
            cnts[name] += 1
    matching = [k for k in durs if "closed_call" in k or "custom" in k]
    if matching:
        k = max(matching, key=durs.get)
        return durs[k] / cnts[k] / 1e3
    return total / REPS / 1e3


def main():
    from bioem_tpu.ops.compare_pallas import fused_displacement_cc

    args = build_args()

    def v(tile, mode):
        return lambda *a: fused_displacement_cc(
            *a, img_tile=tile, n_fold=S, mxu_mode=mode
        )

    variants = {
        "stacked_it8": v(8, "stacked"),
        "stacked_it16": v(16, "stacked"),
        "stacked_it32": v(32, "stacked"),
        "stacked_it64": v(64, "stacked"),
        "simple_bf16_it32": v(32, "default"),  # accuracy floor — bench only
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        t = device_ms(variants[name], args, name)
        print(f"{name}: {t:7.3f} ms/kernel (device)")


if __name__ == "__main__":
    main()
