"""Multi-host initialisation and global-mesh construction.

TPU-native replacement for the reference's MPI bootstrap
(/root/reference/main.cpp:64-68 MPI_Init/rank/size and the configure-time
MPI_Bcast at bioem.cpp:453-503): `jax.distributed.initialize` joins the
hosts; input dissemination happens through sharded array creation (each
host materialises the shards it owns via `jax.make_array_from_callback`)
instead of broadcasting whole inputs to every rank.

Typical multi-host driver:

    from bioem_tpu.parallel.distributed import initialize, global_bioem_mesh
    initialize()                        # no-op on single host
    mesh = global_bioem_mesh(n_img_shards=..., n_orient_shards=...)
    eng = ShardedBioEMEngine(p, orients, model, images, cfg, mesh=mesh)

The main loop is communication-free; only the final collective log-sum-exp
(`merge_across_orient`) crosses hosts, riding ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host run (MPI_Init analogue). Safe no-op single-host.

    With no arguments, jax.distributed auto-detects the cluster environment
    (TPU pod metadata / SLURM / Open MPI env vars). Explicit arguments
    mirror jax.distributed.initialize for manual setups.
    """
    if jax.process_count() > 1:
        return  # already initialised
    env_addr = coordinator_address or os.environ.get("BIOEM_TPU_COORDINATOR")
    n_proc = num_processes or (
        int(os.environ["BIOEM_TPU_NUM_PROCESSES"])
        if "BIOEM_TPU_NUM_PROCESSES" in os.environ
        else None
    )
    pid = process_id or (
        int(os.environ["BIOEM_TPU_PROCESS_ID"])
        if "BIOEM_TPU_PROCESS_ID" in os.environ
        else None
    )
    if env_addr is None and n_proc is None:
        # Single-host run or auto-detectable environment: try auto-init,
        # fall back silently to single-process mode.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=env_addr, num_processes=n_proc, process_id=pid
    )


def global_bioem_mesh(n_img_shards: int, n_orient_shards: int) -> Mesh:
    """(img, orient) mesh over all devices of all hosts.

    The device-to-axis assignment keeps each host's local devices contiguous
    along the image axis so per-host image ingest feeds host-local shards
    (no cross-host input scatter) whenever n_img_shards is a multiple of the
    process count.
    """
    devs = np.array(jax.devices())
    need = n_img_shards * n_orient_shards
    if devs.size < need:
        raise ValueError(
            f"mesh {n_img_shards}×{n_orient_shards} needs {need} devices, "
            f"have {devs.size}"
        )
    return Mesh(
        devs[:need].reshape(n_img_shards, n_orient_shards),
        axis_names=("img", "orient"),
    )
