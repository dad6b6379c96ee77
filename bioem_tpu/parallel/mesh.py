"""Multi-device execution over a 2-D (images × orientations) mesh.

TPU-native replacement for the reference's MPI layer
(/root/reference/main.cpp:64-68, bioem.cpp:453-503, 748-753, 909-1044):

* the reference's rank-sliced orientation loop (P1) → orientation blocks
  sharded over the ``orient`` mesh axis via shard_map;
* the reference's OpenMP image parallelism (P2) → images sharded over the
  ``img`` mesh axis (each shard holds its image FFT bank and its slice of
  the streaming posterior state);
* the end-of-run MPI max/rescale/sum reduction + argmax shipping → one
  collective log-sum-exp (`merge_across_orient`) riding the ICI.

The main loop is communication-free, exactly like the reference: shards
work independently between setup and the single final collective.

Multi-host: initialise jax.distributed before constructing the engine and
pass the global mesh; per-host ingest feeds the shards it owns.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RunConfig
from ..core.engine import Banks, BioEMEngine, Results, _cdiv
from ..core.posterior import PosteriorState, init_state, merge_across_orient
from ..io.map_io import ImageStack
from ..io.model_io import Model


def make_bioem_mesh(n_img_shards: int, n_orient_shards: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_img_shards * n_orient_shards
    if len(devices) < need:
        raise ValueError(f"Mesh {n_img_shards}×{n_orient_shards} needs {need} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_img_shards, n_orient_shards)
    return Mesh(dev, axis_names=("img", "orient"))


class ShardedBioEMEngine(BioEMEngine):
    """BioEMEngine running under shard_map on an (img, orient) mesh."""

    def __init__(
        self,
        p,
        orients,
        model: Model,
        images: ImageStack,
        cfg: Optional[RunConfig] = None,
        mesh: Optional[Mesh] = None,
    ):
        cfg = cfg or RunConfig()
        self.mesh = mesh or make_bioem_mesh(cfg.mesh_images, cfg.mesh_orient)
        self.n_img_shards = self.mesh.shape["img"]
        self.n_orient_shards = self.mesh.shape["orient"]
        super().__init__(p, orients, model, images, cfg)
        self._build_sharded()

    # ------------------------------------------------------------------
    def _build_sharded(self):
        mesh = self.mesh
        img_spec = P("img")
        rep = P()

        img_sharded = {"img_re", "img_im", "sum_ref", "ssq_ref"}
        self.banks_specs = Banks(
            **{f: (img_spec if f in img_sharded else rep) for f in Banks._fields}
        )
        state_specs = PosteriorState(
            total=img_spec,
            const=img_spec,
            best_orient=img_spec,
            best_conv=img_spec,
            best_cent_x=img_spec,
            best_cent_y=img_spec,
            best_norm=img_spec,
            best_mu=img_spec,
            ang_total=P("img", "orient") if self.p.write_angles else None,
            ang_const=P("img", "orient") if self.p.write_angles else None,
        )
        blk_spec = P("orient")  # leading block axis sharded over orientations

        n_blk = self.ang_blocks.shape[0]
        blocks_per_shard = n_blk // self.n_orient_shards
        o_per_shard = blocks_per_shard * self.o_block

        def shard_fn(state, banks, ang_blocks, offsets, masks):
            # Local offsets within this shard's per-angle slab.
            local_off = (
                jnp.arange(blocks_per_shard, dtype=jnp.int32) * self.o_block
            )

            def body(st, xs):
                ang, off, mask, loff = xs
                return (
                    self._block_step(st, banks, ang, off, mask, ang_offset=loff),
                    None,
                )

            state, _ = jax.lax.scan(
                body, state, (ang_blocks, offsets, masks, local_off)
            )
            return merge_across_orient(state, "orient")

        self._sharded_run = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(state_specs, self.banks_specs, blk_spec, blk_spec, blk_spec),
                out_specs=state_specs,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

        # Place inputs according to their specs so no implicit reshard runs.
        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        self.banks = Banks(
            *(put(v, s) for v, s in zip(self.banks, self.banks_specs))
        )
        self.ang_blocks = put(self.ang_blocks, blk_spec)
        self.offsets = put(self.offsets, blk_spec)
        self.mask_blocks = put(self.mask_blocks, blk_spec)
        self._state_specs = state_specs

    # ------------------------------------------------------------------
    def initial_state(self) -> PosteriorState:
        st = init_state(self.n_img_pad, self.n_orient_pad, self.p.write_angles > 0)

        def put(x, spec):
            if x is None:
                return None
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return PosteriorState(
            *(put(v, s) for v, s in zip(st, self._state_specs))
        )

    def run(self, progress: bool = False) -> PosteriorState:
        state = self.initial_state()
        return self._sharded_run(
            state, self.banks, self.ang_blocks, self.offsets, self.mask_blocks
        )
