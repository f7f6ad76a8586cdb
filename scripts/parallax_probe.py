#!/usr/bin/env python3
"""Decompose the val→test quality gap (VERDICT round-4 weak #2).

The r4 50k run validated at 25.81 dB (best block) but the evaluate phase
scored 19.22 dB on the single held-out test camera. Two hypotheses are
entangled, plus one metric artifact:

1. *Metric definition*: trainer validation reports UNMASKED ROI PSNR
   (`trainer.py::_evaluate_one_image`), the evaluate phase reports MASKED
   PSNR (`evaluation/evaluate.py`, mirroring the reference's protocol,
   `/root/reference/actorshq/evaluation/evaluate.py:55-73`). Foreground-only
   averaging excludes the easy black background, so the same image scores
   systematically lower.
2. *Parallax extrapolation*: quality should decay smoothly with angular
   distance from the nearest training camera on a 12-camera rig.
3. *Overfit cliff*: the test anchor scores far below the smooth decay curve.

This probe mints held-out cameras at controlled angular offsets from a
training azimuth (camera ring geometry: 12 slots every 30°, training slots
{0,1,2,4,5,7,9,10}; `humanrf_tpu/run.py::derive_synthetic_presets`), renders
them from the banked best checkpoint, and reports BOTH metric styles per
view. Probe set: base 60° (training cam 2) + offsets {0,5,10,15,20,25,30}°
— nearest-training-camera distance {0,5,10,15,20,25,30}° — plus a replica of
the r4 test camera (330°) to tie to the 19.22 number.

Usage: python scripts/parallax_probe.py [--frames 0 12 25 37 49]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env, ensure_scene  # noqa: E402

BEST_CKPT = Path("/tmp/full_schedule/workspace/checkpoints/best.ckpt")

RING = 12  # the r4 protocol rig
TRAIN_SLOTS = (0, 1, 2, 4, 5, 7, 9, 10)  # derive_synthetic_presets on 12 cams
BASE_DEG = 60.0  # training cam 2's azimuth
OFFSETS_DEG = (0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0)
TEST_DEG = 330.0  # the r4 test camera's azimuth (cam 11)


def probe_angles_deg() -> list:
    return [BASE_DEG + o for o in OFFSETS_DEG] + [TEST_DEG]


def make_probe_scene(root: Path, frames: int = 50, size: int = 748) -> None:
    """The full_schedule_run scene (identical content/motion/detail), observed
    by the probe cameras instead of the uniform ring."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    cfg = SyntheticSceneConfig(
        num_cameras=len(probe_angles_deg()),
        camera_angles=tuple(math.radians(a) for a in probe_angles_deg()),
        width=size,
        height=size,
        num_frames=frames,
        sphere_radius=0.3,
        center_start=(0.0, 0.0, -0.08),
        center_end=(0.0, 0.0, 0.08),
        grid_resolution=128,
        texture_frequency=30.0,
        num_rods=12,
        rod_radius=0.015,
        rod_length=0.25,
    )
    generate_synthetic_dataset(root, cfg)


def eye_at(deg: float, distance: float = 3.0) -> np.ndarray:
    a = math.radians(deg)
    return np.array([distance * math.cos(a), distance * math.sin(a), 0.4 * math.sin(2 * a + 0.5)])


def nearest_training_angle_deg(deg: float) -> float:
    """3D angle (about the scene origin) to the nearest training camera."""
    v = eye_at(deg)
    best = 180.0
    for slot in TRAIN_SLOTS:
        u = eye_at(slot * 30.0)
        cos = float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))
        best = min(best, math.degrees(math.acos(max(-1.0, min(1.0, cos)))))
    return round(best, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[0, 12, 25, 37, 49])
    ap.add_argument("--root", type=Path, default=Path("/tmp/parallax_probe"))
    ap.add_argument("--out", type=Path, default=Path("/tmp/parallax_probe/results.json"))
    ap.add_argument("--size", type=int, default=748)
    ap.add_argument("--rays", type=int, default=16384, help="render batch size")
    args = ap.parse_args()

    # Compile cache before jax import-heavy work.
    import os

    for k, v in compile_cache_env(REPO).items():
        os.environ.setdefault(k, v)

    scene = args.root / "scene"
    if ensure_scene(
        scene,
        {"probe": probe_angles_deg(), "size": args.size, "frames": 50},
        lambda root: make_probe_scene(root, 50, args.size),
    ):
        print("# generated probe scene", flush=True)

    import cv2  # noqa: F401  (loader dependency)
    import jax
    import jax.numpy as jnp

    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.data.loader import DataLoader
    from humanrf_tpu.evaluation.metrics import compute_psnr, compute_ssim
    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
    from humanrf_tpu.train.checkpoint import load_checkpoint
    from humanrf_tpu.train.pipeline import PipelineConfig, make_render_fn

    # The r4 protocol model (scripts/full_schedule_run.py:132-147): fused
    # L8/F4 log2 13 over the adaptive [25, 25] segments of the 50-frame scene.
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=tuple(range(50)),
            segment_sizes=(25, 25),
            log2_hashmap_size=13,
            n_levels=8,
            n_features_per_level=4,
            coarsest_resolution=32,
            finest_resolution=2048,
            camera_embedding_dim=2,
            field_backend="fused",
            proposal_rank=32,
            proposal_resolution=128,
        )
    )
    template = model.init_params(jax.random.PRNGKey(0))
    params, _, step, _, stats = load_checkpoint(BEST_CKPT, template, None)
    print(f"# loaded {BEST_CKPT} at step {step} (best_psnr={stats.get('best_psnr'):.2f})", flush=True)

    pcfg = PipelineConfig(
        num_rays=args.rays,
        sampling="proposal",
        proposal_samples_per_ray=32,
        render_samples_per_ray=16,
        space_pruning="occupancy",
        march_grid_factor=2,
        candidate_rays_factor=1,  # validation/test renders every pixel
    )

    dataset = VolumetricDataset(scene / "SynthActor" / "Sequence1" / "1x")
    n_cams = len(dataset.cameras)
    render_sequence = [(c, f) for c in range(n_cams) for f in args.frames]
    loader = DataLoader(
        dataset=dataset,
        mode=DataLoader.Mode.VALIDATION,
        dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
        space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
        batch_size=args.rays,
        camera_numbers=list(range(n_cams)),
        frame_numbers=args.frames,
        max_buffer_size=1,
        use_mask=True,
        render_sequence=render_sequence,
        seed=123,
    )
    aabb = jnp.asarray(loader.aabb)
    width = height = args.size
    render_fn = make_render_fn(pcfg, model, width, height)

    angles = probe_angles_deg()
    rows = []
    partial_colors, partial_rgba = [], []
    img_idx = 0
    for data_idx, (batch, pool, grids, info) in enumerate(loader):
        out, _ = render_fn(params, batch, pool, grids, aabb, 0.0)
        partial_colors.append(np.asarray(out.color)[: info.num_real])
        partial_rgba.append(np.asarray(batch.rgba)[: info.num_real])
        if (data_idx + 1) % loader.num_batches_per_full_image != 0:
            continue
        colors = np.concatenate(partial_colors, axis=0)
        rgba = np.concatenate(partial_rgba, axis=0)
        partial_colors, partial_rgba = [], []

        cam_idx, frame = render_sequence[img_idx]
        img_idx += 1
        gt = (rgba[:, 0:3] * rgba[:, 3:4]).reshape(height, width, 3)
        mask = rgba[:, 3].reshape(height, width)
        pred = colors.reshape(height, width, 3)

        x, y, w, h = cv2.boundingRect(((mask > 0) * 255).astype(np.uint8))
        pred_roi, gt_roi = pred[y : y + h, x : x + w], gt[y : y + h, x : x + w]
        mask_roi = (mask[y : y + h, x : x + w, None] > 0).astype(np.uint8)

        row = {
            "azimuth_deg": angles[cam_idx],
            "nearest_train_deg": nearest_training_angle_deg(angles[cam_idx]),
            "frame": frame,
            "psnr_roi": round(float(compute_psnr(pred_roi, gt_roi)), 3),
            "psnr_masked": round(float(compute_psnr(pred_roi, gt_roi, mask=mask_roi)), 3),
            "ssim": round(float(compute_ssim(pred_roi, gt_roi, data_range=1.0)), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(rows, indent=2))

    # Per-camera summary: mean over frames, both metric styles.
    print("\n| azimuth | nearest-train | PSNR (ROI, val-style) | PSNR (masked, eval-style) | SSIM |")
    print("|---|---|---|---|---|")
    for cam_idx, az in enumerate(angles):
        sel = [r for r in rows if r["azimuth_deg"] == az]
        if not sel:
            continue
        m = lambda k: sum(r[k] for r in sel) / len(sel)  # noqa: E731
        print(
            f"| {az:.0f}° | {sel[0]['nearest_train_deg']}° | {m('psnr_roi'):.2f} "
            f"| {m('psnr_masked'):.2f} | {m('ssim'):.4f} |"
        )


if __name__ == "__main__":
    main()
