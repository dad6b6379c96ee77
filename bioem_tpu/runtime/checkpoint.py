"""Checkpoint/resume of the streaming posterior accumulator.

The reference has no mid-run state checkpointing — a crashed multi-hour run
restarts from scratch (/root/reference/include/defs.h:18-26 ``myError``
exits; SURVEY.md §5). Here the per-image accumulator (``PosteriorState``) is
a few KB per image, and the orientation scan is a clean resume point: we
persist (state, next block index, problem fingerprint) every K blocks and
resume when the fingerprint matches.

Writes are atomic (tmp + rename) so a crash mid-write never corrupts the
last good checkpoint.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np

from ..core.posterior import PosteriorState

_FIELDS = PosteriorState._fields


def problem_fingerprint(p, orients, model, images, cfg) -> str:
    """Hash of everything that affects the accumulated state."""
    h = hashlib.sha256()
    h.update(repr((
        p.n_pixels, p.pixel_size, p.n_ctf, p.max_displace_center,
        p.grid_space_center, p.write_angles, p.use_psf,
        cfg.orient_block, cfg.debug_break, cfg.debug_nmaps,
        getattr(cfg, "mesh_images", 1), getattr(cfg, "mesh_orient", 1),
    )).encode())
    h.update(np.ascontiguousarray(orients.angles).tobytes())
    h.update(np.ascontiguousarray(model.points).tobytes())
    h.update(np.ascontiguousarray(images.maps[:1]).tobytes())
    h.update(str(images.maps.shape).encode())
    return h.hexdigest()


def save_checkpoint(path: str, state: PosteriorState, next_block: int, fingerprint: str) -> None:
    arrays = {"__next_block": np.int64(next_block)}
    for name in _FIELDS:
        v = getattr(state, name)
        if v is not None:
            arrays[name] = np.asarray(v)
    arrays["__fingerprint"] = np.frombuffer(fingerprint.encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, fingerprint: str) -> Optional[Tuple[PosteriorState, int]]:
    """(state, next_block) if a matching checkpoint exists, else None."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            stored = bytes(z["__fingerprint"]).decode()
            if stored != fingerprint:
                return None
            next_block = int(z["__next_block"])
            fields = {
                name: (z[name] if name in z.files else None) for name in _FIELDS
            }
    except (OSError, KeyError, ValueError):
        return None
    import jax.numpy as jnp

    state = PosteriorState(
        **{k: (jnp.asarray(v) if v is not None else None) for k, v in fields.items()}
    )
    return state, next_block
