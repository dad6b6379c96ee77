"""End-to-end device-time lab for the comparison pipeline designs.

kernel_lab.py measures only the pallas custom-call duration; this measures
the FULL per-step pipeline (conv + cc + displacement LSE) so designs that
move work between the kernel and XLA are compared fairly:

* ``fused``  — fused_compare_block: conv, cc AND the log1p/exp LSE in-kernel.
* ``hybrid`` — XLA conv multiply → fused_displacement_cc (cc in VMEM) →
  XLA displacement_lse (the round-1 production pipeline).

Usage: python tools/pipeline_lab.py [fused hybrid ...]
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

O, C, I, N, D, S = 8, 8, 64, 224, 21, 2
F = N // 2 + 1
M = N // S
NTOT = float(N * N)
REPS = 20


def build_args():
    from bioem_tpu.core.posterior import displacement_dft_weights

    rng = np.random.default_rng(0)
    disp = (np.arange(D) - D // 2) * S
    wx, wy = displacement_dft_weights(N, disp)
    a = lambda x: jnp.asarray(np.asarray(x, np.float32))
    return dict(
        pr=a(rng.normal(0, 1, (O, N, F))),
        pi=a(rng.normal(0, 1, (O, N, F))),
        kr=a(rng.normal(0, 1, (C, N, F))),
        ki=a(rng.normal(0, 1, (C, N, F))),
        ir=a(rng.normal(0, 1, (I, N, F))),
        ii=a(rng.normal(0, 1, (I, N, F))),
        wxr=a(np.ascontiguousarray(wx.real[:, :M])),
        wxi=a(np.ascontiguousarray(wx.imag[:, :M])),
        wxr_full=a(np.ascontiguousarray(wx.real)),
        wxi_full=a(np.ascontiguousarray(wx.imag)),
        wyr=a(wy.real.copy()),
        wyi=a(wy.imag.copy()),
        h=a(np.r_[1.0, np.full(F - 2, 2.0), 1.0]),
        sum_ref=a(rng.normal(0, 1, (I,))),
        ssq_ref=a(np.abs(rng.normal(0, 1, (I,))) * NTOT),
        prior=jnp.asarray(np.zeros((O, C)), jnp.float64),
    )


def fused_step(g, img_tile):
    from bioem_tpu.core.posterior import logpro_constants
    from bioem_tpu.ops.compare_pallas import fused_compare_block

    hi = jax.lax.Precision.HIGHEST
    mag_p = (g["pr"] ** 2 + g["pi"] ** 2) * g["h"][None, None, :]
    mag_c = g["kr"] ** 2 + g["ki"] ** 2
    ssq_c = jnp.dot(
        mag_p.reshape(O, -1), mag_c.reshape(C, -1).T,
        preferred_element_type=jnp.float32, precision=hi,
    ) / jnp.float32(NTOT)
    sum_c = (
        g["pr"][:, 0, 0, None] * g["kr"][None, :, 0, 0]
        + g["pi"][:, 0, 0, None] * g["ki"][None, :, 0, 0]
    )
    f0, k = logpro_constants(sum_c, ssq_c, g["sum_ref"], g["ssq_ref"], g["prior"], NTOT)
    f0_32 = f0.astype(jnp.float32)
    a_u = (2.0 * g["sum_ref"][None, None, :] * sum_c[:, :, None] / f0_32).astype(
        jnp.float32
    )
    b_u = jnp.float32(NTOT) / f0_32
    m, se, ds, ccs = fused_compare_block(
        g["pr"], g["pi"], g["kr"], g["ki"], g["ir"], g["ii"],
        g["wxr"], g["wxi"], g["wyr"], g["wyi"],
        a_u.reshape(O * C, I), b_u.reshape(O * C, I),
        a_coef=(3.0 - NTOT) * 0.5, img_tile=img_tile, n_fold=S,
    )
    return m.sum() + se.sum() + ccs.sum() + ds.sum() + k.sum()


def hybrid_step(g, img_tile):
    from bioem_tpu.core.posterior import (
        convolution_sums,
        displacement_lse,
        logpro_constants,
    )
    from bioem_tpu.ops.compare_pallas import fused_displacement_cc

    conv_re = g["pr"][:, None] * g["kr"][None] + g["pi"][:, None] * g["ki"][None]
    conv_im = g["pi"][:, None] * g["kr"][None] - g["pr"][:, None] * g["ki"][None]
    sum_c, ssq_c = convolution_sums(conv_re, conv_im, g["h"], N)
    f0, k = logpro_constants(sum_c, ssq_c, g["sum_ref"], g["ssq_ref"], g["prior"], NTOT)
    cc = fused_displacement_cc(
        conv_re.reshape(O * C, N, F), conv_im.reshape(O * C, N, F),
        g["ir"], g["ii"], g["wxr"], g["wxi"], g["wyr"], g["wyi"],
        img_tile=img_tile, n_fold=S,
    ).reshape(O, C, I, D, D)
    m, se, ds, ccs = displacement_lse(cc, sum_c, g["sum_ref"], f0, NTOT)
    return m.sum() + se.sum() + ccs.sum() + ds.sum() + k.sum()


def device_ms(step, g, tag):
    @jax.jit
    def rep():
        def body(c, _):
            out = step(g)
            return c + out.astype(jnp.float32) * 1e-30, None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    np.asarray(rep())  # compile + warm
    tracedir = f"/tmp/pipeline_lab/{tag}"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    np.asarray(rep())
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
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pidname.get(e["pid"], ""):
            if e["name"].startswith("jit_rep"):
                total = max(total, e.get("dur", 0))
    return total / REPS / 1e3


def main():
    g = build_args()
    variants = {
        "fused_it16": lambda g: fused_step(g, 16),
        "fused_it32": lambda g: fused_step(g, 32),
        "hybrid_it16": lambda g: hybrid_step(g, 16),
        "hybrid_it32": lambda g: hybrid_step(g, 32),
    }
    want = sys.argv[1:] or list(variants)
    ncmp = O * C * I
    for name in want:
        t = device_ms(variants[name], g, name)
        print(
            f"{name}: {t:8.3f} ms/step (device) = "
            f"{ncmp / t * 1e3:,.0f} comparisons/s", flush=True,
        )


if __name__ == "__main__":
    main()
