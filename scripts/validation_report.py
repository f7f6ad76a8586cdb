"""Shared parsing of a workspace's validation.txt (trainer append-log format:
`Step: N` header lines followed by per-image `... psnr=X ssim=Y ...` lines).
Single source of truth for the long-run drivers' reporting
(full_schedule_run.py, quality_at_capacity.py) so a trainer format change
cannot silently desynchronize them."""
from __future__ import annotations

import re
from pathlib import Path


def parse_validation_blocks(ws: Path) -> list[dict]:
    """→ [{step, psnr: [..], ssim: [..]}, ...] in file order; [] if absent."""
    path = Path(ws) / "validation.txt"
    if not path.exists():
        return []
    blocks = []
    for block in path.read_text().split("Step: ")[1:]:
        lines = block.splitlines()
        # A watchdog/deadline kill can truncate the file mid-append ("Step: "
        # with no number, or a garbled header) — skip the bad block rather
        # than crash the driver that exists to report partial results.
        if not lines or not lines[0].strip().isdigit():
            continue
        blocks.append(
            {
                "step": int(lines[0].strip()),
                "psnr": [float(m.group(1)) for ln in lines[1:] if (m := re.search(r"psnr=([\d.]+)", ln))],
                "ssim": [float(m.group(1)) for ln in lines[1:] if (m := re.search(r"ssim=([\d.]+)", ln))],
            }
        )
    return blocks


def block_means(blocks: list[dict]) -> list[dict]:
    """Per-block mean PSNR/SSIM summary rows (protocol table format)."""
    out = []
    for b in blocks:
        if not b["psnr"]:
            continue
        out.append(
            {
                "step": b["step"],
                "psnr": round(sum(b["psnr"]) / len(b["psnr"]), 3),
                "ssim": round(sum(b["ssim"]) / max(len(b["ssim"]), 1), 4),
                "n_images": len(b["psnr"]),
            }
        )
    return out


def best_block(blocks: list[dict]) -> dict:
    """Best-mean-PSNR block (the reference's best-checkpoint protocol),
    plus the last validated step. Stable schema: {} only when no block was
    parsed at all; a metric-less block set still reports last_val_step so a
    cut-off run is distinguishable from one that never validated."""
    if not blocks:
        return {}
    rows = block_means(blocks)
    if not rows:
        return {
            "psnr": 0.0,
            "ssim": 0.0,
            "at_step": None,
            "n_val_images": 0,
            "last_val_step": blocks[-1]["step"],
        }
    best = max(rows, key=lambda r: r["psnr"])
    return {
        "psnr": best["psnr"],
        "ssim": best["ssim"],
        "at_step": best["step"],
        "n_val_images": best["n_images"],
        "last_val_step": rows[-1]["step"],
    }
