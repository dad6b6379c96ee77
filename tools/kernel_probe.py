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


# ---------------------------------------------------------------------------
# P3: ablation timing of the production per-cell body
# ---------------------------------------------------------------------------

def probe_body_ablation(interpret):
    """Times the fused kernel's per-(o,c) cell body at production shape
    (N=224, D=21, 64-image tile) with pieces ablated, attributing the gap
    between the measured ~174 ns/cmp and the ~48 ns MXU floor:

    * full      — product + fold + splits + matmuls + scratch + transpose + LSE
    * no_lse    — stop after the scratch writes (no transpose/LSE)
    * mm_only   — pre-split bf16 operands fed straight to the 5 dots
                  (no product/fold/split VPU work)
    """
    from bioem_tpu.ops.compare_pallas import (
        _cc_tile_stacked, _stacked_weight_banks, _vector_lse,
    )

    n, f, d, s = 224, 113, 21, 2
    m = n // s
    dp = 24
    it = 64
    lanes = it * dp
    rng = np.random.default_rng(2)

    def arr(*shape):
        return jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))

    cr, ci = arr(n, f), arr(n, f)
    img_re, img_im = arr(it, n, f), arr(it, n, f)
    img_bf = (arr(it, m, f) / 8).astype(jnp.bfloat16)
    wx_re, wx_im = arr(d, m), arr(d, m)
    wy_re, wy_im = arr(d, f), arr(d, f)
    a96, w2 = _stacked_weight_banks(wx_re, wx_im, wy_re, wy_im, d, dp)
    au = jnp.abs(arr(1, lanes)) * 1e-6
    bu = jnp.abs(arr(1, lanes)) * 1e-9
    pos = jnp.asarray((np.arange(lanes, dtype=np.int32) % dp).reshape(1, lanes))

    def body(variant):
        def kern(cr_ref, ci_ref, ir_ref, ii_ref, ibf_ref, a96_ref, w2_ref,
                 au_ref, bu_ref, pos_ref, out_ref, cc_scr):
            crv, civ = cr_ref[:, :], ci_ref[:, :]
            a96v = a96_ref[:, :]
            dot = partial(jnp.dot, preferred_element_type=jnp.float32)
            for i in range(it):
                if variant == "mm_only":
                    x = ibf_ref[i]  # (m, f) bf16, pre-split stand-in
                    th = dot(a96v, x)            # (4dp, f)
                    tl = dot(a96v[0:2 * dp], x)  # (2dp, f)
                    t1 = th[0:dp] + th[2 * dp:3 * dp] + tl[0:dp]
                    t2 = jnp.concatenate(
                        [t1.astype(jnp.bfloat16)] * 4, axis=0)  # (4dp, f)
                    o2 = dot(t2, w2_ref[:, :])   # (4dp, 4dp)
                    cc = o2[0:d, 0:d] + o2[dp:dp + d, dp:dp + d]
                else:
                    cc = _cc_tile_stacked(
                        crv, civ, ir_ref[i], ii_ref[i], a96v,
                        a96v[0:2 * dp], w2_ref[:, :], s, d, dp)
                cc_scr[i * dp:(i + 1) * dp, 0:dp] = jnp.pad(
                    cc, ((0, dp - d), (0, dp - d)))
            if variant == "full":
                cc_t = jnp.transpose(cc_scr[:, :], (1, 0))
                mx, se, ds, ccs = _vector_lse(
                    cc_t, pos_ref[:, :], au_ref[:, :], bu_ref[:, :],
                    -3.0, d, dp, it)
                out_ref[0:1, :] = mx + se
            else:
                out_ref[0:1, :] = (
                    jnp.zeros((1, lanes), jnp.float32) + jnp.sum(cc_scr[:, :])
                )
        return kern

    for variant in ("full", "no_lse", "mm_only"):
        f_call = pl.pallas_call(
            body(variant),
            out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            scratch_shapes=[pltpu.VMEM((it * dp, dp), jnp.float32)],
            interpret=interpret,
        )
        args = (cr, ci, img_re, img_im, img_bf, a96, w2, au, bu, pos)
        try:
            o = f_call(*args)
            np.asarray(o)
        except Exception as e:
            print(f"P3 {variant}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f_call(*args)
        jax.block_until_ready(o)
        np.asarray(o).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"P3 {variant}: {dt*1e6:.1f} us/cell "
              f"({dt/it*1e9:.0f} ns per image-comparison)", flush=True)


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    probe_f32_accuracy(interpret)
    probe_issue_overhead(interpret)
    probe_body_ablation(interpret)


if __name__ == "__main__":
    main()


