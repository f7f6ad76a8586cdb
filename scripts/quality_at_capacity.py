#!/usr/bin/env python3
"""Quality-at-capacity sweep: does the TPU-native gather-free field match the
reference-capacity gather field on a scene with high-frequency detail?

Runs the real CLI (python -m humanrf_tpu.run) per configuration on a shared
synthetic scene with high-frequency texture + thin rods (core/synthetic.py
detail controls), then tabulates the final validation PSNR/SSIM.

Capacity accounting: per-segment hashmap scaling is
round(log2(segment_size / 100 * 2^log2_hashmap_size)) (models/humanrf.py:113),
so with the 2-frame scene (one segment of size 2, scale factor 2/100 →
−5.64 doublings):
    log2=24 → 2^18 tables   (the reference example_humanrf capacity)
    log2=17 → 2^11 = 2048   (the benched one-hot flagship)
    log2=16 → 2^10 = 1024   (the next construction-bandwidth lever)

Usage: python scripts/quality_at_capacity.py [--steps 2000] [--out PERF_sweep.json]
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

CONFIGS = {
    # name: (field_backend, log2_hashmap, n_levels, n_features, extra_flags)
    # Cheap one-hot configs first; the reference-capacity gather run last
    # (it is ~10x slower — gathers cost ~10ns/element on TPU, PERF.md).
    "onehot-2048-L8F4": ("onehot", 17, 8, 4, []),   # the round-2 benched flagship
    "onehot-1024-L8F4": ("onehot", 16, 8, 4, []),
    "onehot-2048-L16F2": ("onehot", 17, 16, 2, []),
    # Two-level proposal cascade: half the fine samples (Kf=8 via a second
    # cheap-proposal refinement of 16 mids) — the next throughput lever.
    "onehot-2048-L8F4-Kf8-cascade": (
        "onehot", 17, 8, 4,
        ["--tpu.proposal_mid_samples_per_ray", "16", "--tpu.render_samples_per_ray", "8"],
    ),
    "gather-2^18-L16F2": ("gather", 24, 16, 2, []),
    # At-scale pair (use with --size 384 --frames 25 --steps 5000): the fused
    # flagship at per-frame flagship capacity (log2 13 → T=2048 at 25-frame
    # segments) vs the reference-capacity gather control (log2 24 → 2^22 at
    # 25-frame segments — the same per-frame capacity the reference's
    # example_humanrf accounting yields).
    "fused-flagship": ("fused", 13, 8, 4, []),
    "gather-ref-capacity": ("gather", 24, 16, 2, []),
}


def make_scene(root: Path, width: int, height: int, num_frames: int) -> None:
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    # Motion scaled so ≥25-frame sequences cross the occupancy-union expansion
    # threshold and adaptive partitioning emits ≥2 segments (full_schedule_run
    # uses 0.16 total travel over 50 frames for [25, 25]).
    travel = 0.06 if num_frames <= 2 else 0.16 * (num_frames / 50.0)
    cfg = SyntheticSceneConfig(
        num_cameras=12,
        width=width,
        height=height,
        num_frames=num_frames,
        sphere_radius=0.3,
        center_start=(0.0, 0.0, -travel / 2),
        center_end=(0.0, 0.0, travel / 2),
        grid_resolution=128,
        texture_frequency=30.0,  # high-frequency surface detail
        num_rods=12,             # thin sub-voxel structures
        rod_radius=0.015,
        rod_length=0.25,
    )
    generate_synthetic_dataset(root, cfg)


def run_config(
    name: str, scene: Path, work: Path, steps: int, extra: list[str],
    frames: int = 2, chunk: int = 1, deadline: float | None = None,
    stall_timeout: float = 1500.0,
) -> dict:
    backend, log2, levels, feats, cfg_extra = CONFIGS[name]
    extra = cfg_extra + extra
    ws = work / name
    validate_every = max(steps // 4, 1)
    if chunk > 1:
        validate_every = max(validate_every - validate_every % chunk, chunk)
    cmd = [
        sys.executable, "-m", "humanrf_tpu.run",
        "--config", "example_synthetic",
        "--dataset.path", str(scene),
        "--workspace", str(ws),
        "--model.log2_hashmap_size", str(log2),
        "--model.n_levels", str(levels),
        "--model.n_features_per_level", str(feats),
        "--model.finest_resolution", "2048",
        "--tpu.field_backend", backend,
        "--tpu.sampling", "proposal",
        "--tpu.proposal_samples_per_ray", "32",
        "--tpu.render_samples_per_ray", "16",
        "--tpu.candidate_rays_factor", "2",
        "--tpu.steps_per_dispatch", str(chunk),
        "--training.max_steps", str(steps),
        "--training.rays_initial_batch_size", "4096",
        "--training.checkpoint", "latest",  # resumable across watchdog restarts
        "--training.save_checkpoint_every_n_steps", str(validate_every),
        "--validation.every_n_steps", str(validate_every),
        "--validation.rays_batch_size", "16384",
        "--dataset.frame_numbers", *[str(i) for i in range(frames)],
    ] + extra
    if frames > 2:
        cmd += [
            "--model.temporal_partitioning", "adaptive",
            "--model.camera_embedding_dim", "2",
            "--dataset.max_buffer_size", "48",
            "--dataset.max_num_frames_per_batch", "8",
        ]
    t0 = time.time()
    ws.mkdir(parents=True, exist_ok=True)
    env = compile_cache_env(REPO)
    log = ws / "driver.log"
    # Long gather-control runs (~hours) need the tunnel-stall watchdog; the
    # child resumes from its newest checkpoint on relaunch. CAUTION: the
    # trainer prints one log line per 500 steps, so stall_timeout must
    # comfortably exceed 500 steps of the SLOWEST config (the reference-
    # capacity gather arm takes ~1400s/500 steps at 384² — a 1500s timeout
    # killed a healthy child in round 5; use --stall-timeout ~3600 for it).
    rc, restarts = supervise(
        cmd, log, env, REPO, stall_timeout=stall_timeout, max_restarts=4, deadline=deadline
    )
    elapsed = time.time() - t0
    result = {"name": name, "wall_s": round(elapsed, 1), "rc": rc, "restarts": restarts}
    if rc == BUDGET_RC:
        # Wall-clock budget expired: report the best validation block reached
        # so far (the run checkpoints at every validation, so it is resumable).
        result["partial"] = True
    elif rc != 0:
        result["tail"] = log.read_text()[-1500:] if log.exists() else ""
        return result
    if not (ws / "validation.txt").exists():
        return result

    # Best validation epoch (the protocol the reference's best-checkpoint
    # gating implements, trainer.py:552-581): per validation block, average
    # the per-image metrics; report the best block.
    from validation_report import best_block, parse_validation_blocks

    result.update(best_block(parse_validation_blocks(ws)))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--root", type=Path, default=Path("/tmp/quality_sweep"))
    ap.add_argument("--out", type=Path, default=Path("/tmp/quality_sweep/results.json"))
    ap.add_argument("--only", nargs="*", default=None, help="subset of config names")
    ap.add_argument("--size", type=int, default=192, help="image width=height")
    ap.add_argument("--frames", type=int, default=2, help=">2 enables adaptive multi-segment")
    ap.add_argument("--chunk", type=int, default=1, help="--tpu.steps_per_dispatch")
    ap.add_argument(
        "--extra", type=str, default="",
        help="extra CLI flags passed through (single string, whitespace-split; "
        "argparse cannot take ---prefixed tokens via nargs)",
    )
    ap.add_argument(
        "--deadline-epoch", type=float, default=None,
        help="absolute wall-clock budget (epoch seconds) shared by the whole "
        "sweep; a config cut off by it reports its best validation block so "
        "far with partial=true",
    )
    ap.add_argument(
        "--stall-timeout", type=float, default=1500.0,
        help="watchdog: seconds of zero log growth before the child is "
        "killed+relaunched; must exceed 500 steps of the slowest config",
    )
    args = ap.parse_args()

    scene = args.root / "scene"
    # Cache keyed on the scene parameters; regeneration also clears the run
    # workspaces (their `--training.checkpoint latest` state belongs to the
    # old scene). See driver_common.ensure_scene.
    if ensure_scene(
        scene,
        {"size": args.size, "frames": args.frames},
        lambda root: make_scene(root, args.size, args.size, args.frames),
        stale_dirs=(args.root / "runs",),
    ):
        print(f"# generated {args.size}^2 x {args.frames}-frame scene", flush=True)

    results = []
    for name in args.only or CONFIGS:
        print(f"# running {name} ({args.steps} steps) ...", flush=True)
        r = run_config(
            name, scene, args.root / "runs", args.steps, args.extra.split(),
            frames=args.frames, chunk=args.chunk, deadline=args.deadline_epoch,
            stall_timeout=args.stall_timeout,
        )
        print(json.dumps(r), flush=True)
        results.append(r)
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(results, indent=2))

    print("\n| config | PSNR | SSIM | wall |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['name']} | {r.get('psnr', 'FAIL')} | {r.get('ssim', '-')} | {r['wall_s']}s |")


if __name__ == "__main__":
    main()
