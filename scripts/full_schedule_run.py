#!/usr/bin/env python3
"""Full reference-schedule run (VERDICT round-2 item #2).

Executes the reference protocol end-to-end through the real CLI on a
high-detail synthetic scene at ActorsHQ-like scale: 748x748 pixels, 12
cameras, 50 frames with enough subject motion that adaptive temporal
partitioning produces >= 2 segments, 50,001 steps with validation every
2,500 (the reference schedule: /root/reference/humanrf/configs/
example_humanrf.py:21, args/run_args.py:46), best-checkpoint selection,
trajectory test render, and the evaluate phase (metrics.csv/averages.csv).

Flagship model/sampler config (PERF.md): fused interpolating-matmul field
L8/F4, log2_hashmap 13 -> per-25-frame-segment tables of 2^11 = 2048 (the
quality-validated flagship capacity per frame), CP proposal importance
sampling Kc=32 -> Kf=16 with 2x candidate-ray compaction.

Usage: python scripts/full_schedule_run.py [--steps 50001] [--root /tmp/full_schedule]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env, ensure_scene  # noqa: E402
from run_supervisor import BUDGET_RC, supervise  # noqa: E402


def make_scene(root: Path, num_frames: int, width: int, height: int) -> None:
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    cfg = SyntheticSceneConfig(
        num_cameras=12,
        width=width,
        height=height,
        num_frames=num_frames,
        sphere_radius=0.3,
        # Total travel 0.16 in z: the occupancy-union expansion factor crosses
        # the 1.25 threshold after ~25-30 frames, so the partitioning ladder
        # emits [25, 25] instead of one 50-frame segment.
        center_start=(0.0, 0.0, -0.08),
        center_end=(0.0, 0.0, 0.08),
        grid_resolution=128,
        texture_frequency=30.0,  # high-frequency surface detail
        num_rods=12,             # thin sub-voxel structures
        rod_radius=0.015,
        rod_length=0.25,
    )
    generate_synthetic_dataset(root, cfg)


def check_segments(scene: Path, num_frames: int) -> list:
    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.train.partitioning import compute_adaptive_segment_sizes

    ds = VolumetricDataset(scene / "SynthActor" / "Sequence1" / "1x")
    sizes = compute_adaptive_segment_sizes(ds, list(range(num_frames)))
    return sizes


def summarize_validation(ws: Path) -> list:
    """Per-validation-block mean PSNR/SSIM from validation.txt."""
    from validation_report import block_means, parse_validation_blocks

    return block_means(parse_validation_blocks(ws))


def main():
    ap = argparse.ArgumentParser()
    # 50,000 = the reference's 50,001 rounded to a steps_per_dispatch multiple;
    # the protocol's last validation/checkpoint lands at step 50,000 either way.
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--root", type=Path, default=Path("/tmp/full_schedule"))
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--size", type=int, default=748)
    # The reference default (args/run_args.py:27).
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--steps-per-dispatch", type=int, default=10)
    ap.add_argument("--validate-every", type=int, default=2500)
    ap.add_argument("--scene-only", action="store_true")
    ap.add_argument(
        "--smoke", action="store_true",
        help="pipeline shakeout: skip the trajectory/evaluate phases (train+validate only)",
    )
    # Watchdog: the axon TPU tunnel can die mid-run, leaving the child wedged
    # in a remote call forever (observed: 50 min at step 840, idle tunnel
    # thread, two busy-polling host threads). Supervise: if the child's log
    # stops growing for --stall-timeout seconds, kill it, wait for the tunnel
    # to answer a probe again, and relaunch (--training.checkpoint latest
    # resumes from the newest checkpoint).
    ap.add_argument("--stall-timeout", type=float, default=1500.0,
                    help="seconds of zero log growth before the child is declared wedged "
                         "(must exceed the worst cold tunnel compile, ~10 min)")
    ap.add_argument("--max-restarts", type=int, default=12)
    ap.add_argument(
        "--deadline-epoch", type=float, default=None,
        help="absolute wall-clock budget (epoch seconds); on expiry the child "
        "is stopped, result.json carries partial=true + the validation "
        "trajectory so far, and the run stays resumable",
    )
    args = ap.parse_args()

    scene = args.root / "scene"
    # Cache keyed on the scene parameters; regeneration also clears the
    # workspace (its `--training.checkpoint latest` state belongs to the old
    # scene). See driver_common.ensure_scene.
    t0 = time.time()
    if ensure_scene(
        scene,
        {"size": args.size, "frames": args.frames},
        lambda root: make_scene(root, args.frames, args.size, args.size),
        stale_dirs=(args.root / "workspace",),
    ):
        print(f"# generated {args.size}^2 x {args.frames}-frame scene in {time.time()-t0:.0f}s", flush=True)

    sizes = check_segments(scene, args.frames)
    print(f"# adaptive segment sizes: {sizes}", flush=True)
    assert len(sizes) >= 2, f"scene motion too small for multi-segment partitioning: {sizes}"
    if args.scene_only:
        return

    ws = args.root / "workspace"
    ws.mkdir(parents=True, exist_ok=True)
    cmd = [
        sys.executable, "-m", "humanrf_tpu.run",
        "--config", "example_synthetic",
        "--dataset.path", str(scene),
        "--workspace", str(ws),
        # Flagship field at per-frame flagship capacity: 25-frame segments
        # scale 2^13 tables to round(log2(25/100 * 8192)) = 11 -> T=2048.
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
        # Amortize tunnel dispatch RTT: K training steps per device dispatch.
        "--tpu.steps_per_dispatch", str(args.steps_per_dispatch),
        # The reference schedule.
        "--training.max_steps", str(args.steps),
        "--training.rays_initial_batch_size", str(args.rays),
        "--training.save_checkpoint_every_n_steps", str(args.validate_every),
        "--training.checkpoint", "latest",  # resumable
        "--validation.every_n_steps", str(args.validate_every),
        "--validation.rays_batch_size", "16384",
        "--validation.repeat_cameras", "1",
        "--dataset.frame_numbers", *[str(i) for i in range(args.frames)],
        "--dataset.max_buffer_size", "48",
        "--dataset.max_num_frames_per_batch", "8",
    ]
    if not args.smoke:
        # Trajectory test render + evaluation phase (best checkpoint).
        cmd += [
            "--test.trajectory_via_calibration_file",
            str(scene / "SynthActor" / "Sequence1" / "1x" / "calibration.csv"),
            "--evaluate", "true",
        ]
    print("# launching:", " ".join(cmd), flush=True)
    t0 = time.time()
    log = ws / "driver.log"
    # Persistent XLA compile cache so resumes/retries skip the ~5-min
    # tunnel compile of the chunked step + render programs.
    env = compile_cache_env(REPO)
    rc, restarts = supervise(
        cmd, log, env, REPO, stall_timeout=args.stall_timeout,
        max_restarts=args.max_restarts, deadline=args.deadline_epoch,
    )
    elapsed = time.time() - t0

    result = {"rc": rc, "wall_s": round(elapsed, 1), "segment_sizes": sizes, "restarts": restarts}
    if rc == 0:
        result["validation_blocks"] = summarize_validation(ws)
    elif rc == BUDGET_RC:
        # Wall-clock budget expired: partial but resumable — report the
        # validation trajectory reached so far.
        result["partial"] = True
        result["validation_blocks"] = summarize_validation(ws)
    else:
        result["tail"] = log.read_text()[-2000:] if log.exists() else ""
    out = args.root / "result.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
