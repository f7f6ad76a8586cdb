#!/usr/bin/env python3
"""Instant-NGP exporter: per-camera transformsNNN.json + masked RGBA pngs.

Semantics match `/root/reference/actorshq/toolbox/export_ngp.py:17-105`: axis
permutations into NGP's world convention, 0.95·3/extent scene scaling, one
transforms json per camera.
"""
from __future__ import annotations

import argparse
import json
import math
import os
from pathlib import Path
from typing import List

import cv2
import numpy as np
from scipy.spatial.transform import Rotation as R

from humanrf_tpu.core.camera import CameraData
from humanrf_tpu.core.dataset import VolumetricDataset


def export_as_ngp(
    cameras: List[CameraData],
    output_folder: Path,
    image_folder: Path,
    scene_offset: np.ndarray,
    scene_scale: float,
) -> None:
    to_ngp_camera = R.from_euler("x", [180], degrees=True).as_matrix()
    to_ngp_world = R.from_euler("xz", [90, 90], degrees=True).as_matrix()
    image_paths = sorted(image_folder.glob("*"))
    for camera_idx, camera in enumerate(cameras):
        matrix = np.eye(4)
        matrix[:3, :3] = to_ngp_world @ camera.rotation_matrix_cam2world() @ to_ngp_camera
        matrix[:3, 3] = to_ngp_world @ ((camera.translation + scene_offset) * scene_scale)

        output = {
            "cx": camera.cx_pixel,
            "cy": camera.cy_pixel,
            "w": camera.width,
            "h": camera.height,
            "aabb_scale": 1,
            "frames": [
                {
                    "file_path": str(os.path.relpath(image_paths[camera_idx], output_folder)),
                    "camera_name": camera.name,
                    "transform_matrix": [list(map(float, v)) for v in matrix],
                }
            ],
            "fl_x": camera.fx_pixel,
            "fl_y": camera.fy_pixel,
            "camera_angle_x": 2.0 * math.atan2(0.5 * camera.width, camera.fx_pixel),
            "camera_angle_y": 2.0 * math.atan2(0.5 * camera.height, camera.fy_pixel),
            "p1": 0.0,
            "p2": 0.0,
            "k1": 0.0,
            "k2": 0.0,
        }
        (output_folder / f"transforms{camera_idx:03d}.json").write_text(
            json.dumps(output, indent=2), encoding="UTF-8"
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", type=Path, required=True)
    parser.add_argument("--frame_number", type=int, required=True)
    parser.add_argument("--output_dir", type=Path, required=True)
    args = parser.parse_args()

    dataset = VolumetricDataset(args.data_folder)

    # NGP internally scales loaded scenes by 0.33 → pre-scale to ~95% · 3.
    aabb = dataset.get_aabb([args.frame_number])
    scene_scale = 0.95 * (3 / np.max(aabb[1] - aabb[0]))
    scene_offset = -aabb.mean(0)

    available_camera_numbers, available_frame_numbers = dataset.get_available_cameras_and_frames()
    if args.frame_number not in available_frame_numbers:
        raise RuntimeError("Requested frame number does not exist in the dataset!")

    image_folder = args.output_dir / "images"
    image_folder.mkdir(parents=True, exist_ok=True)
    for camera_number in available_camera_numbers:
        rgb = dataset.get_rgb(camera_number, args.frame_number)
        mask = dataset.get_mask(camera_number, args.frame_number)
        rgb = rgb * mask
        frame_png = np.concatenate((rgb, mask), axis=-1)
        cv2.imwrite(str(image_folder / f"{dataset.cameras[camera_number].name}.png"), frame_png * 255)

    export_as_ngp(
        cameras=[dataset.cameras[i] for i in available_camera_numbers],
        output_folder=args.output_dir,
        image_folder=image_folder,
        scene_offset=scene_offset,
        scene_scale=scene_scale,
    )


if __name__ == "__main__":
    main()
