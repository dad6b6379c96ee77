"""Mosaic micro-probes for the comparison-kernel roofline (round 3).

The fused kernel is ~84% of device time but only ~33% MXU-local
utilisation; per-comparison cost breaks down as bf16 hi/lo splits +
cross-spectrum products (VPU) + 5 small matmul issues per image. Two
empirical questions decide the next optimisation:

P1  Does Mosaic lower a plain f32×f32 `jnp.dot` with multi-pass accuracy
    (~1e-7 rel), or does it silently cast to single-pass bf16 (~1e-3)?
    If accurate, every in-kernel hi/lo split can be deleted.

P2  What is the per-matmul issue overhead? Times a kernel that runs the
    production stage-1 shape as 64 small matmuls (current structure: one
    per image) vs one lane-batched matmul of identical total FLOPs.

Usage: python tools/kernel_probe.py   (runs on the default backend;
interpret mode on CPU checks plumbing only — run on TPU for answers).
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _f32_dot_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = jnp.dot(
        a_ref[:, :], b_ref[:, :], preferred_element_type=jnp.float32
    )


def probe_f32_accuracy(interpret):
    m, k, n = 96, 112, 113
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (m, k)).astype(np.float32)
    b = rng.normal(0, 1, (k, n)).astype(np.float32)
    out = pl.pallas_call(
        _f32_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(np.asarray(out) - ref) / np.maximum(np.abs(ref), 1e-30)
    med = float(np.median(rel))
    print(f"P1 f32-dot rel err: median={med:.2e} max={rel.max():.2e} "
          f"-> {'MULTI-PASS (splits deletable)' if med < 1e-6 else 'bf16 cast (splits required)'}")


def _loop_mm_kernel(a_ref, b_ref, o_ref, *, n_img, reps):
    a = a_ref[:, :]
    acc = jnp.zeros_like(o_ref)
    for _ in range(reps):
        for i in range(n_img):
            acc += jnp.dot(
                a, b_ref[i], preferred_element_type=jnp.float32
            )
    o_ref[:, :] = acc


def _batched_mm_kernel(a_ref, b_ref, o_ref, *, n_img, reps):
    a = a_ref[:, :]
    bb = jnp.concatenate([b_ref[i] for i in range(n_img)], axis=1)
    acc = jnp.zeros((a.shape[0], bb.shape[1]), jnp.float32)
    for _ in range(reps):
        acc += jnp.dot(a, bb, preferred_element_type=jnp.float32)
    s = 0
    red = jnp.zeros_like(o_ref)
    for i in range(n_img):
        red += acc[:, s:s + o_ref.shape[1]]
        s += o_ref.shape[1]
    o_ref[:, :] = red


def probe_issue_overhead(interpret):
    m, k, n, n_img, reps = 96, 112, 128, 64, 4
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 1, (n_img, k, n)).astype(np.float32)).astype(jnp.bfloat16)

    def run(kern, tag):
        f = pl.pallas_call(
            partial(kern, n_img=n_img, reps=reps),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            interpret=interpret,
        )
        o = f(a, b)
        np.asarray(o)
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            o = f(a, b)
        jax.block_until_ready(o)
        np.asarray(o).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        per_mm_ns = dt / (n_img * reps) * 1e9
        print(f"P2 {tag}: {dt*1e6:.1f} us/call  ({per_mm_ns:.0f} ns per "
              f"{m}x{k}x{n} matmul-equivalent)")
        return dt

    t_loop = run(_loop_mm_kernel, "64 small matmuls x4")
    t_batch = run(_batched_mm_kernel, "1 lane-batched matmul x4")
    print(f"P2 issue-overhead ratio loop/batched: {t_loop/t_batch:.2f}x")


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    probe_f32_accuracy(interpret)
    probe_issue_overhead(interpret)


if __name__ == "__main__":
    main()
