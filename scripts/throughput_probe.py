#!/usr/bin/env python3
"""Trainer-scale throughput at the 748² protocol shape WITH the segment skip
(VERDICT round-4 weak #3 / next-round #4).

The r4 50k run sustained 35–38k rays/s but predates the lax.cond segment
skip; bench.py's 58.5k is the 16,384-ray bench shape. This probe resumes the
banked step-50,000 checkpoint on the banked 748² scene and runs 2,000 more
steps with validation/checkpointing pushed out of the window, so the 500-step
logs measure pure train-loop throughput at the protocol shape (8,192-ray
batches, [25, 25] segments, frame-window batches → one active segment).

Usage: python scripts/throughput_probe.py [--steps 2000]
"""
from __future__ import annotations

import argparse
import re
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env  # noqa: E402

SCENE = Path("/tmp/full_schedule/scene")
CKPT = Path("/tmp/full_schedule/workspace/checkpoints/step_00050000.ckpt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--root", type=Path, default=Path("/tmp/tput_probe"))
    args = ap.parse_args()

    ws = args.root / "ws"
    ckpts = ws / "checkpoints"
    ckpts.mkdir(parents=True, exist_ok=True)
    target = ckpts / CKPT.name
    if not target.exists():
        shutil.copyfile(CKPT, target)

    max_steps = 50_000 + args.steps
    big = 10_000_000  # push validation/save cadence out of the window
    cmd = [
        sys.executable, "-m", "humanrf_tpu.run",
        "--config", "example_synthetic",
        "--dataset.path", str(SCENE),
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
        "--tpu.steps_per_dispatch", "10",
        "--training.max_steps", str(max_steps),
        "--training.rays_initial_batch_size", "8192",
        "--training.save_checkpoint_every_n_steps", str(big),
        "--training.checkpoint", "latest",
        "--validation.every_n_steps", str(big),
        "--validation.rays_batch_size", "16384",
        "--validation.repeat_cameras", "1",
        "--dataset.frame_numbers", *[str(i) for i in range(50)],
        "--dataset.max_buffer_size", "48",
        "--dataset.max_num_frames_per_batch", "8",
    ]
    log = ws / "driver.log"
    print("# launching:", " ".join(cmd), flush=True)
    env = compile_cache_env(REPO)
    env["PYTHONUNBUFFERED"] = "1"
    with open(log, "w") as f:
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, env=env, cwd=REPO).returncode

    rates, fetches = [], []
    for line in log.read_text().splitlines():
        m = re.search(r"step (\d+):.*rays/s=(\d+) \[fetch (\d+)%", line)
        if m and int(m.group(1)) > 50_000:
            rates.append(int(m.group(2)))
            fetches.append(int(m.group(3)))
    print(f"rc={rc} windows={len(rates)} rates={rates} fetch%={fetches}")
    if rates:
        # Drop the first window (contains the resume compile).
        steady = rates[1:] or rates
        print(f"steady rays/s: mean={sum(steady)/len(steady):.0f} max={max(steady)}")


if __name__ == "__main__":
    main()
