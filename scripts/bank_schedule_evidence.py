#!/usr/bin/env python3
"""Bank the round-4 reference-schedule run artifacts into runs_evidence/.

Copies the durable, judge-checkable evidence (validation trajectory, metrics
CSVs, config, sample renders, result JSONs, the final checkpoint) from the
/tmp workspace into the repo so the run survives the instance. Keeps the
checkpoint smallest-sufficient: only the newest one (resume seed for round 5).

Usage: python scripts/bank_schedule_evidence.py [--root /tmp/full_schedule]
           [--dest runs_evidence/r4_full_schedule_748]
"""
from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/full_schedule"))
    ap.add_argument("--dest", type=Path, default=REPO / "runs_evidence" / "r4_full_schedule_748")
    ap.add_argument("--max-images", type=int, default=6)
    args = ap.parse_args()

    ws = args.root / "workspace"
    dest = args.dest
    dest.mkdir(parents=True, exist_ok=True)

    def cp(src: Path, name: str | None = None):
        if src.exists():
            shutil.copy(src, dest / (name or src.name))
            print(f"  banked {src} -> {dest / (name or src.name)}")

    cp(ws / "validation.txt")
    cp(ws / "config.yaml")
    cp(args.root / "result.json")
    cp(args.root / "phases_result.json")
    cp(args.root / "scene" / "scene_meta.json")

    # Evaluate-phase CSVs (the protocol's quality artifacts).
    for f in ("metrics.csv", "averages.csv"):
        cp(ws / "results" / f)

    # Log tail for provenance (full log is huge).
    log = ws / "driver.log"
    if log.exists():
        (dest / "driver_log_tail.txt").write_text(log.read_text()[-20000:])
        print("  banked driver.log tail")
    phases_log = ws / "phases.log"
    if phases_log.exists():
        (dest / "phases_log_tail.txt").write_text(phases_log.read_text()[-10000:])
        print("  banked phases.log tail")

    # Newest checkpoint (resume seed) + the best checkpoint marker if distinct.
    ckpts = sorted((ws / "checkpoints").glob("step_*.ckpt"))
    if ckpts:
        cp(ckpts[-1])
    best = ws / "checkpoints" / "best.ckpt"
    if best.exists():
        cp(best)

    # A few validation comparison renders, spread over the run (first / last /
    # evenly between), plus up to 3 evaluate-phase test renders.
    val_images = sorted((ws / "validation").glob("*_comparison.png")) if (ws / "validation").exists() else []
    if val_images:
        n = args.max_images
        picks = {val_images[round(i * (len(val_images) - 1) / max(1, n - 1))] for i in range(min(n, len(val_images)))}
        for p in sorted(picks):
            cp(p)
    test_dir = ws / "results" / "test_frames"
    if test_dir.exists():
        for p in sorted(test_dir.glob("*.png"))[:3]:
            cp(p, f"eval_{p.name}")
    traj_dir = ws / "results" / "test_calibration_file"
    if traj_dir.exists():
        for p in sorted(traj_dir.glob("*.png"))[:3]:
            cp(p, f"traj_{p.name}")

    print(f"banked into {dest}")


if __name__ == "__main__":
    main()
