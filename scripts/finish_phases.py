#!/usr/bin/env python3
"""Finish the reference-protocol phases from an existing schedule-run workspace.

The full protocol is train -> trajectory render -> evaluate
(`/root/reference/humanrf/run.py:23-205`). When a wall-clock budget forces the
training phase to stop early (partial-but-resumable, scripts/
full_schedule_run.py), this script completes the remaining phases from the
workspace's BEST checkpoint without retraining:

  1. evaluate: render the held-out test camera at siggraph_test coverage and
     write metrics.csv / averages.csv (the decisive quality artifacts,
     `/root/reference/actorshq/evaluation/evaluate.py:88-187`) — run FIRST so
     a further budget cut still banks the metrics;
  2. trajectory: the calibration ping-pong novel-view render
     (`/root/reference/actorshq/dataset/trajectory.py:62-74`).

Usage: python scripts/finish_phases.py [--root /tmp/full_schedule]
           [--deadline-epoch E] [--skip-trajectory]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env  # noqa: E402
from run_supervisor import BUDGET_RC, supervise  # noqa: E402


def base_cmd(scene: Path, ws: Path, frames: int) -> list:
    # Model/sampler flags must match the training run exactly (the checkpoint
    # is a pytree of that model); see scripts/full_schedule_run.py.
    return [
        sys.executable, "-m", "humanrf_tpu.run",
        "--config", "example_synthetic",
        "--dataset.path", str(scene),
        "--workspace", str(ws),
        "--model.log2_hashmap_size", "13",
        "--model.n_levels", "8",
        "--model.n_features_per_level", "4",
        "--model.finest_resolution", "2048",
        "--model.temporal_partitioning", "adaptive",
        "--model.camera_embedding_dim", "2",
        "--tpu.field_backend", "fused",
        "--tpu.sampling", "proposal",
        "--tpu.proposal_samples_per_ray", "32",
        "--tpu.render_samples_per_ray", "16",
        "--tpu.candidate_rays_factor", "2",
        "--train", "false",
        "--test.checkpoint", "best",
        "--dataset.frame_numbers", *[str(i) for i in range(frames)],
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/full_schedule"))
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--deadline-epoch", type=float, default=None)
    ap.add_argument("--skip-trajectory", action="store_true")
    ap.add_argument("--stall-timeout", type=float, default=1200.0)
    args = ap.parse_args()

    scene = args.root / "scene"
    ws = args.root / "workspace"
    assert (ws / "checkpoints").exists(), f"no checkpoints under {ws}"

    env = compile_cache_env(REPO)
    log = ws / "phases.log"
    result = {}

    t0 = time.time()
    eval_cmd = base_cmd(scene, ws, args.frames) + ["--evaluate", "true"]
    print("# phase 1/2 (evaluate):", " ".join(eval_cmd), flush=True)
    rc, restarts = supervise(
        eval_cmd, log, env, REPO, stall_timeout=args.stall_timeout,
        max_restarts=4, deadline=args.deadline_epoch,
    )
    result["evaluate"] = {"rc": rc, "wall_s": round(time.time() - t0, 1), "restarts": restarts}
    averages = ws / "results" / "averages.csv"
    if averages.exists():
        result["averages_csv"] = averages.read_text().strip().splitlines()

    if not args.skip_trajectory and rc == 0:
        t1 = time.time()
        traj_cmd = base_cmd(scene, ws, args.frames) + [
            "--evaluate", "false",
            "--test.trajectory_via_calibration_file",
            str(scene / "SynthActor" / "Sequence1" / "1x" / "calibration.csv"),
        ]
        print("# phase 2/2 (trajectory):", " ".join(traj_cmd), flush=True)
        rc2, restarts2 = supervise(
            traj_cmd, log, env, REPO, stall_timeout=args.stall_timeout,
            max_restarts=4, deadline=args.deadline_epoch,
        )
        n_pngs = len(list((ws / "results" / "test_calibration_file").glob("*.png"))) \
            if (ws / "results" / "test_calibration_file").exists() else 0
        result["trajectory"] = {
            "rc": rc2, "wall_s": round(time.time() - t1, 1),
            "restarts": restarts2, "n_images": n_pngs,
        }

    result["partial"] = any(
        v.get("rc") == BUDGET_RC for v in result.values() if isinstance(v, dict)
    )
    out = args.root / "phases_result.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
