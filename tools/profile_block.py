"""Phase-level timing of the engine block step on the live backend.

Times (a) the full jitted block step, (b) projection alone, (c) the fused
displacement-CC kernel alone, (d) conv+sums, (e) merge, to see where the
block budget goes. Run: python tools/profile_block.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not fully synchronise on axon — force a host
    # read of one leaf.
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, reps=10):
    _sync(fn(*args))  # warmup incl. compile, fully synced
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from bench import build_problem
    from bioem_tpu.config import RunConfig
    from bioem_tpu.core.engine import BioEMEngine
    from bioem_tpu.core.orientations import rotation_matrices
    from bioem_tpu.core.posterior import convolution_sums
    from bioem_tpu.core.projection import project_fourier_batch

    p, orients, model, images = build_problem()
    cfg = RunConfig.from_env()
    eng = BioEMEngine(p, orients, model, images, cfg)
    banks = eng.banks
    n, nf = p.n_pixels, p.n_fft_1d
    o, c = eng.o_block, eng.n_ctf
    print(f"block: O={o} C={c} I={eng.n_img_pad} N={n} F={nf} D={len(eng.disp)}"
          f" pallas={eng.use_pallas} fourier={eng.fspec is not None}")

    state = eng.initial_state()
    step = jax.jit(eng._block_step)
    t_full = timeit(step, state, banks, eng.ang_blocks[0], eng.offsets[0],
                    eng.mask_blocks[0])
    print(f"full block step: {t_full*1e3:9.3f} ms")

    # projection alone
    @jax.jit
    def proj_only(angles):
        rotm = rotation_matrices(angles, eng.orients.use_quaternions)
        return project_fourier_batch(
            eng.fspec, rotm, banks.points, banks.radii, banks.dens,
            banks.norm_den, banks.st_re, banks.st_im, banks.st_sums)

    if eng.fspec is not None:
        t_proj = timeit(proj_only, eng.ang_blocks[0])
        print(f"projection:      {t_proj*1e3:9.3f} ms")
        pr, pi = proj_only(eng.ang_blocks[0])
    else:
        pr = jnp.zeros((o, n, nf), jnp.float32)
        pi = jnp.zeros((o, n, nf), jnp.float32)

    @jax.jit
    def conv_only(pr, pi):
        conv_re = pr[:, None] * banks.ctf_re[None] + pi[:, None] * banks.ctf_im[None]
        conv_im = pi[:, None] * banks.ctf_re[None] - pr[:, None] * banks.ctf_im[None]
        return convolution_sums(conv_re, conv_im, banks.h, n), conv_re, conv_im

    t_conv = timeit(conv_only, pr, pi)
    print(f"conv+sums:       {t_conv*1e3:9.3f} ms")
    (_, conv_re, conv_im) = conv_only(pr, pi)
    conv_re = conv_re.reshape(o * c, n, nf)
    conv_im = conv_im.reshape(o * c, n, nf)

    from bioem_tpu.ops.compare_pallas import fused_displacement_cc

    s = p.grid_space_center
    n_fold = s if (s > 1 and n % s == 0) else 1

    @jax.jit
    def cc_only(conv_re, conv_im):
        return fused_displacement_cc(
            conv_re, conv_im, banks.img_re, banks.img_im,
            banks.wx_re[:, : n // n_fold], banks.wx_im[:, : n // n_fold],
            banks.wy_re, banks.wy_im, img_tile=eng.i_block, n_fold=n_fold)

    t_cc = timeit(cc_only, conv_re, conv_im)
    print(f"fused CC kernel: {t_cc*1e3:9.3f} ms")

    d = len(eng.disp)
    i_tot = eng.n_img_pad
    # effective FLOPs of the CC kernel (3pass bf16 counts 3x)
    flops = 2 * o * c * i_tot * (4 * (n // n_fold) * nf * d + 4 * d * nf * d)
    print(f"CC tensor-flops: {flops/1e9:.1f} GF → {flops/t_cc/1e12:.2f} TF/s "
          f"(x3 passes = {3*flops/t_cc/1e12:.2f})")
    # HBM bytes: conv read + img read + out write
    byts = 4 * (2 * o * c * n * nf + 2 * i_tot * n * nf + o * c * i_tot * d * d)
    print(f"CC HBM bytes:    {byts/1e6:.1f} MB → {byts/t_cc/1e9:.1f} GB/s")
    rest = t_full - t_cc - t_conv - (t_proj if eng.fspec is not None else 0)
    print(f"residual (lse+merge+overhead): {rest*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
