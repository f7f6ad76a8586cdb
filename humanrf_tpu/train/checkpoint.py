"""Checkpoint save/load with the reference's workspace semantics.

Mirrors `/root/reference/humanrf/trainer.py:528-620`:
- rolling ``step_%08d.ckpt`` every N steps, pruned to `max_num_checkpoints`
- ``best.ckpt`` gated on best validation LPIPS
- `resolve_checkpoint('latest')` = max step_* glob; `'best'` = best.ckpt
- full state = params + optimizer + step/val_step/stats. (No GradScaler state:
  bf16 training needs no loss scaling — accepted-but-inert, SURVEY.md §5.)

Format: a single msgpack file via flax.serialization (framework-neutral,
host-readable, no orbax daemon needed for these small models).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from flax import serialization

CHECKPOINT_SUFFIX = ".ckpt"

# msgpack caps a single bin object at 2**32 - 1 bytes. to_bytes(opt_state) for a
# reference-capacity model (~537M params → Adam mu+nu ≈ 4.3 GB in one blob)
# exceeds that when re-wrapped as one payload entry, so any section larger than
# _MAX_SECTION is stored as a list of chunks instead of a single bytes object.
_MAX_SECTION = 1 << 30  # 1 GiB per chunk, far under the msgpack bin limit


def _split(blob: bytes):
    if len(blob) <= _MAX_SECTION:
        return blob
    return [blob[i : i + _MAX_SECTION] for i in range(0, len(blob), _MAX_SECTION)]


def _join(section) -> bytes:
    return section if isinstance(section, bytes) else b"".join(section)


def save_checkpoint(path: Path, params, opt_state, step: int, val_step: int, stats: Dict[str, Any]) -> None:
    payload = {
        "params": _split(serialization.to_bytes(params)),
        "opt_state": _split(serialization.to_bytes(opt_state)),
        "meta": json.dumps({"step": step, "val_step": val_step, "stats": stats}).encode(),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = Path(str(path) + ".tmp")
    tmp.write_bytes(blob)
    tmp.rename(path)


def load_checkpoint(path: Path, params_template, opt_state_template) -> Tuple[Any, Any, int, int, Dict]:
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    params = serialization.from_bytes(params_template, _join(payload["params"]))
    opt_state = None
    if opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, _join(payload["opt_state"]))
    meta = json.loads(payload["meta"].decode())
    return params, opt_state, meta["step"], meta["val_step"], meta["stats"]


def resolve_checkpoint(checkpoints_dir: Path, checkpoint: Optional[str]) -> Optional[Path]:
    """'latest' → newest step_*.ckpt; 'best' → best.ckpt; else a literal path.
    Returns None when nothing is found (trainer.py:583-596)."""
    if checkpoint is None:
        return None
    if checkpoint == "latest":
        candidates = sorted(Path(checkpoints_dir).glob(f"step_*{CHECKPOINT_SUFFIX}"))
        return candidates[-1] if candidates else None
    if checkpoint == "best":
        best = Path(checkpoints_dir) / f"best{CHECKPOINT_SUFFIX}"
        return best if best.exists() else None
    p = Path(checkpoint)
    return p if p.exists() else None
