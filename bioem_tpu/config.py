"""Performance configuration (never changes results).

Mirrors the reference's environment-variable performance layer
(/root/reference/bioem.cpp:97-138, doc/index.rst:1535-1653): the reference
deliberately separates physics parameters (keyword file) from performance
knobs (env vars). Here the same split: :class:`RunConfig` holds block sizes,
precision and mesh options, overridable via ``BIOEM_TPU_*`` env vars.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import FrozenSet, Optional


@dataclass
class RunConfig:
    # Orientations processed per jitted device step (reference analogue:
    # BIOEM_PROJ_CONV_AT_ONCE, bioem.cpp:105-121).
    orient_block: int = 8
    # Images per inner scan step; 0 = all images at once.
    image_block: int = 0
    # Debug reductions (reference BIOEM_DEBUG_BREAK / BIOEM_DEBUG_NMAPS,
    # bioem.cpp:518-525, map.cpp:545-548).
    debug_break: int = 0  # cap on n_orientations and n_ctfs
    debug_nmaps: int = 0  # cap on images
    # Verbosity 0/1/2 (reference BIOEM_DEBUG_OUTPUT).
    debug_output: int = 0
    # Device mesh: images × orientations. 1×1 = single chip.
    mesh_images: int = 1
    mesh_orient: int = 1
    # Autotune block sizes before the main run. None = auto: on when the
    # problem is large enough to amortise the candidate timing runs
    # (n_orient·n_ctf·n_img ≥ run.AUTOTUNE_MIN_COMPARISONS — the analogue of
    # the reference autotuner running by default whenever GPUs are used,
    # /root/reference/autotuner.cpp:16-50). BIOEM_TPU_AUTOTUNE=0/1 forces.
    autotune: Optional[bool] = None
    # Use the fused Pallas comparison kernel. None = auto: on for TPU
    # backends (it wins there), off elsewhere (interpret mode is slow).
    use_pallas: Optional[bool] = None
    # Images per Pallas grid step (VMEM-resident image tile). v5e bench at
    # production N=224 (hybrid LSE): tile 16 → 1.78 M cmp/s, 32 → 2.48 M,
    # 64 → 2.57 M. 32 is the safe default (tile VMEM grows with N·tile);
    # the autotuner probes 64.
    pallas_img_tile: int = 32
    # Fuse the displacement log-sum-exp into the Pallas kernel (True) or
    # run it as a batched XLA reduction over the kernel's cc output
    # (False). None = auto: True on TPU (vectorized in-kernel LSE, 1.22×
    # the hybrid on v5e — see ops/compare_pallas._vector_lse).
    fused_lse: Optional[bool] = None
    # Checkpoint/resume of the streaming accumulator state (improves on the
    # reference, which restarts long runs from scratch on failure).
    checkpoint_path: str = ""
    checkpoint_every: int = 0  # orientation blocks between checkpoints
    # jax.profiler trace output dir (NVTX analogue); empty = off.
    profile_dir: str = ""
    # Projection backend: "auto" (Fourier when the model has <= 32 distinct
    # radii, else raster), "fourier", or "raster".
    projection: str = "auto"
    # Run the Fourier projection through the Pallas kernel (in-kernel phase
    # tables + 3-pass bf16 group dots, ops/project_pallas.py). None = auto:
    # follows use_pallas (on for TPU). BIOEM_TPU_PROJ_PALLAS=0/1 forces.
    pallas_projection: Optional[bool] = None
    # Lane-batched stage-1 in the fused kernel (4 wide matmuls per cell
    # instead of 4 per image — see compare_pallas._fused_block_kernel_batched).
    # BIOEM_TPU_FUSED_BATCHED=0/1 forces.
    fused_batched: bool = False
    # Tuned fields the user pinned explicitly (env var or caller): the
    # autotuner must never override these — a cached winner re-enabling a
    # kernel the user force-disabled would violate the reference's contract
    # that performance knobs are obeyed verbatim (doc/index.rst:1535-1653).
    forced: FrozenSet[str] = field(default_factory=frozenset)

    @classmethod
    def from_env(cls) -> "RunConfig":
        cfg = cls()
        mapping = {
            "BIOEM_TPU_ORIENT_BLOCK": "orient_block",
            "BIOEM_TPU_IMAGE_BLOCK": "image_block",
            "BIOEM_DEBUG_BREAK": "debug_break",
            "BIOEM_DEBUG_NMAPS": "debug_nmaps",
            "BIOEM_DEBUG_OUTPUT": "debug_output",
            "BIOEM_TPU_MESH_IMAGES": "mesh_images",
            "BIOEM_TPU_MESH_ORIENT": "mesh_orient",
            "BIOEM_TPU_PALLAS_IMG_TILE": "pallas_img_tile",
            "BIOEM_TPU_CHECKPOINT_EVERY": "checkpoint_every",
        }
        forced = set()
        tunable = {"orient_block", "image_block", "pallas_img_tile"}
        for env, attr in mapping.items():
            v = os.environ.get(env)
            if v is not None:
                setattr(cfg, attr, int(v))
                if attr in tunable:
                    forced.add(attr)
        cfg.checkpoint_path = os.environ.get("BIOEM_TPU_CHECKPOINT", "")
        cfg.profile_dir = os.environ.get("BIOEM_TPU_PROFILE_DIR", "")
        cfg.projection = os.environ.get("BIOEM_TPU_PROJECTION", "auto")
        if os.environ.get("BIOEM_TPU_AUTOTUNE"):
            cfg.autotune = bool(int(os.environ["BIOEM_TPU_AUTOTUNE"]))
        if os.environ.get("BIOEM_TPU_PALLAS"):
            cfg.use_pallas = bool(int(os.environ["BIOEM_TPU_PALLAS"]))
            forced.add("use_pallas")
        if os.environ.get("BIOEM_TPU_PROJ_PALLAS"):
            cfg.pallas_projection = bool(int(os.environ["BIOEM_TPU_PROJ_PALLAS"]))
            forced.add("pallas_projection")
        if os.environ.get("BIOEM_TPU_FUSED_BATCHED"):
            cfg.fused_batched = bool(int(os.environ["BIOEM_TPU_FUSED_BATCHED"]))
            forced.add("fused_batched")
        if os.environ.get("BIOEM_TPU_FUSED_LSE"):
            cfg.fused_lse = bool(int(os.environ["BIOEM_TPU_FUSED_LSE"]))
            forced.add("fused_lse")
        cfg.forced = frozenset(forced)
        return cfg


def force_cpu_if_requested() -> None:
    """BIOEM_TPU_FORCE_CPU=1 pins JAX to the host CPU (CPU-mesh smoke
    testing / CI). The axon TPU plugin force-sets JAX_PLATFORMS, so only a
    jax.config update AFTER importing jax is authoritative — call this
    before the first backend touch."""
    if os.environ.get("BIOEM_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
