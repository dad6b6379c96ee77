"""TPU health probe: is the device (and tunnel) running at full speed?

Prints (a) device-side bf16 throughput from a chained in-jit matmul loop
(v5e healthy: >100 TF/s; degraded regimes measured as low as 3.2 TF/s)
and (b) the per-dispatch+transfer round-trip latency (healthy: ~1-5 ms
through the axon tunnel; degraded: ~40 ms). Run BEFORE trusting any
absolute benchmark number or cross-time A/B, via:

    tools/with_tpu.sh python tools/tpu_health.py
"""
import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((4096, 4096), jnp.bfloat16)
@jax.jit
def f(x):
    for _ in range(32):
        x = jnp.tanh(x @ x * 1e-4)
    return x
np.asarray(f(x))  # compile+warm
t0 = time.time(); np.asarray(f(x)); t1 = time.time()
fl = 32 * 2 * 4096**3
print(f"chained-matmul: {t1-t0:.4f}s  {fl/(t1-t0)/1e12:.1f} TF/s")
y = jnp.ones((256, 256))
g = jax.jit(lambda y: y @ y)
np.asarray(g(y))
t0 = time.time()
for _ in range(20):
    np.asarray(g(y))
t1 = time.time()
print(f"dispatch+transfer round-trip: {(t1-t0)/20*1e3:.1f} ms")
