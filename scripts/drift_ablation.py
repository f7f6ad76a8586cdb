#!/usr/bin/env python3
"""Root-cause the late-horizon validation drift (VERDICT round-4 weak #1).

The round-4 50k reference-schedule run peaked at 25.81 dB (step 17,500) and
shed ~2.8 dB by step 27,500 with `weight_decay 0.03` (the round-2b stability
setting, tuned on 2k-step runs). Candidates: (a) weight decay eroding
converged tables over the long horizon, (b) proposal-PDF drift, (c) lr floor.

This driver A/Bs them by RESUMING from the banked step-17,500 best checkpoint
(`runs_evidence/r4_full_schedule_748` protocol, scene regenerated bit-identical
via the parameter-keyed cache) and training 10k further steps per arm with one
knob changed. The original 50k run is NOT the resume control — a resume
reshuffles the loader/rng streams — so arm `wd0.03` re-runs the reference
setting through the same resume path; the other arms differ from it by exactly
one flag:

    wd0.03   — weight_decay 0.03 (reference of the resume cohort)
    wd0      — weight_decay 0    (candidate (a): decay erodes converged tables)
    frozen-proposal — proposal_loss_weight 0 after resume (candidate (b):
               the proposal PDF keeps moving and drags sampling around)

Verdict criterion: an arm whose validation at 27,500 is within 0.5 dB of the
25.81 peak identifies the driver; wd0.03 drifting like the original run
(~-2.3 dB at 27,500) confirms the effect is hyperparameter-driven, not a
resume artifact.

Schedule parity: every arm keeps `--training.max_steps 50000`, so the lr
schedule (0.5^(step/max_steps), trainer.py::make_lr_schedule) is IDENTICAL
to the original run's — arms are cut by a per-arm wall-clock deadline
instead (the supervisor's BUDGET_RC partial-result path; validation blocks
land every 2,500 steps regardless of where the cut falls).

Usage:
    python scripts/drift_ablation.py --arms wd0.03 wd0 [--minutes 80]
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env, ensure_scene  # noqa: E402
from full_schedule_run import make_scene  # noqa: E402
from run_supervisor import BUDGET_RC, supervise  # noqa: E402

RESUME_STEP = 17_500
BEST_CKPT = Path("/tmp/full_schedule/workspace/checkpoints/best.ckpt")

ARMS = {
    # name: extra CLI flags relative to the round-4 protocol command
    "wd0.03": [],
    "wd0": ["--training.weight_decay", "0"],
    "frozen-proposal": ["--tpu.proposal_loss_weight", "0"],
    "lrfloor": ["--training.lr_decay", "0.1"],
}


def arm_cmd(name: str, scene: Path, ws: Path, max_steps: int) -> list:
    """The round-4 748² protocol command (scripts/full_schedule_run.py:132-162)
    with train-only phases, resuming from the seeded checkpoint."""
    cmd = [
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
        "--tpu.steps_per_dispatch", "10",
        "--training.max_steps", str(max_steps),
        "--training.rays_initial_batch_size", "8192",
        "--training.save_checkpoint_every_n_steps", "2500",
        "--training.checkpoint", "latest",
        "--validation.every_n_steps", "2500",
        "--validation.rays_batch_size", "16384",
        "--validation.repeat_cameras", "1",
        "--dataset.frame_numbers", *[str(i) for i in range(50)],
        "--dataset.max_buffer_size", "48",
        "--dataset.max_num_frames_per_batch", "8",
    ]
    return cmd + ARMS[name]


def seed_workspace(ws: Path) -> None:
    """Plant the banked step-17,500 best checkpoint as the resume point."""
    ckpts = ws / "checkpoints"
    ckpts.mkdir(parents=True, exist_ok=True)
    target = ckpts / f"step_{RESUME_STEP:08d}.ckpt"
    if not target.exists():
        shutil.copyfile(BEST_CKPT, target)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+", default=["wd0.03", "wd0"], choices=list(ARMS))
    ap.add_argument(
        "--minutes", type=float, default=80.0,
        help="wall-clock budget per arm (cuts the run; ~10k steps at the "
        "measured 748² rate); the lr horizon stays the full 50k schedule",
    )
    ap.add_argument("--root", type=Path, default=Path("/tmp/drift_ablation"))
    ap.add_argument("--scene-root", type=Path, default=Path("/tmp/full_schedule"))
    ap.add_argument("--out", type=Path, default=Path("/tmp/drift_ablation/results.json"))
    args = ap.parse_args()

    scene = args.scene_root / "scene"
    # Same cache key as full_schedule_run.py: reuse the banked 748²/50f scene
    # (regenerate bit-identically if it was cleaned). NOTE: stale_dirs does NOT
    # include the r4 workspace — the banked best.ckpt lives there.
    if ensure_scene(
        scene,
        {"size": 748, "frames": 50},
        lambda root: make_scene(root, 50, 748, 748),
    ):
        print("# regenerated the 748² x 50-frame scene", flush=True)
    assert BEST_CKPT.exists(), f"missing resume checkpoint {BEST_CKPT}"

    env = compile_cache_env(REPO)
    results = []
    for name in args.arms:
        ws = args.root / name
        seed_workspace(ws)
        cmd = arm_cmd(name, scene, ws, 50_000)  # full lr horizon; deadline cuts
        deadline = time.time() + args.minutes * 60.0
        print(f"# arm {name}: resume {RESUME_STEP}, {args.minutes:.0f} min budget", flush=True)
        t0 = time.time()
        rc, restarts = supervise(
            cmd, ws / "driver.log", env, REPO,
            stall_timeout=1500.0, max_restarts=4, deadline=deadline,
        )
        r = {
            "name": name, "rc": rc, "restarts": restarts,
            "wall_s": round(time.time() - t0, 1), "partial": rc == BUDGET_RC,
        }
        from validation_report import block_means, parse_validation_blocks

        try:
            r["validation_blocks"] = block_means(parse_validation_blocks(ws))
        except Exception as e:
            r["validation_error"] = repr(e)
        results.append(r)
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(results, indent=2))
        print(json.dumps(r), flush=True)

    print("\n| arm | blocks (step: mean PSNR) |")
    print("|---|---|")
    for r in results:
        blocks = r.get("validation_blocks") or []
        print(f"| {r['name']} | " + " ".join(
            f"{b['step']}:{b['psnr']:.2f}" for b in blocks) + " |")


if __name__ == "__main__":
    main()
