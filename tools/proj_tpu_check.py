"""Real-TPU check of the Pallas Fourier-projection kernel: compile, parity
vs the XLA projection path, and per-block timing at bench scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from bioem_tpu.config import RunConfig
from bioem_tpu.core.engine import BioEMEngine
from bioem_tpu.core.orientations import rotation_matrices
from bioem_tpu.core.projection import (
    project_fourier_batch,
    project_fourier_batch_pallas,
)

print("backend:", jax.default_backend(), flush=True)
OB = int(sys.argv[1]) if len(sys.argv) > 1 else 8

p, orients, model, imgs = build_problem()
eng = BioEMEngine(p, orients, model, imgs,
                  RunConfig(orient_block=OB, projection="fourier",
                            autotune=False))
assert eng.fspec is not None
b = eng.banks
print(f"fspec: G={eng.fspec.n_groups} Pp={eng.fspec.group_pad} "
      f"N={p.n_pixels}", flush=True)
rotm = rotation_matrices(jnp.asarray(orients.angles[:OB]),
                         orients.use_quaternions)
args = (b.points, b.radii, b.dens, b.norm_den, b.st_re, b.st_im, b.st_sums)

f_x = jax.jit(lambda rm: project_fourier_batch(eng.fspec, rm, *args))
f_p = jax.jit(lambda rm: project_fourier_batch_pallas(eng.fspec, rm, *args))

t0 = time.time()
xr, xi = f_x(rotm)
xr_h, xi_h = np.asarray(xr), np.asarray(xi)
print(f"xla compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
pr, pi = f_p(rotm)
pr_h, pi_h = np.asarray(pr), np.asarray(pi)
print(f"pallas compile+run {time.time()-t0:.1f}s", flush=True)

scale = max(np.abs(xr_h).max(), np.abs(xi_h).max())
err = max(np.abs(pr_h - xr_h).max(), np.abs(pi_h - xi_h).max()) / scale
print(f"rel err vs xla: {err:.3e}", flush=True)

for name, fn in [("xla", f_x), ("pallas", f_p)]:
    np.asarray(fn(rotm)[0])  # warm
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = fn(rotm)
    np.asarray(out[0])
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms / {OB}-orient block", flush=True)
print("DONE", flush=True)
