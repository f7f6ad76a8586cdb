#!/usr/bin/env python3
"""Dynamic-Furry-Animals → ActorsHQ-format importer.

Same pipeline as `/root/reference/actorshq/toolbox/import_dfa.py:30-176`: copy
images/mattes into the layout, convert the DFA column-permuted extrinsics,
bootstrap ±1.5-cube AABBs → occupancy grids → tightened AABBs → final grids.
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

from humanrf_tpu.core.aabb import AabbData, write_aabbs_csv
from humanrf_tpu.core.camera import CameraData, write_calibration_csv
from humanrf_tpu.core.dataset import VolumetricDataset, VolumetricDatasetFilepaths
from humanrf_tpu.toolbox.generate_occupancy_grids_from_masks import generate_occupancy_grid_from_masks

NUM_DFA_CAMERAS = 36


def import_dfa(dfa_dataset_folder: Path, motion_type: str, output_folder: Path) -> None:
    dfa_dataset_path = Path(dfa_dataset_folder)
    images_path = dfa_dataset_path / "img" / motion_type
    output_fp = VolumetricDatasetFilepaths(Path(output_folder))

    frame_dirs = sorted(images_path.glob("*"))
    frame_numbers = [int(fdir.stem) for fdir in frame_dirs]

    for frame_number, fdir in zip(frame_numbers, frame_dirs):
        for camera_number in range(NUM_DFA_CAMERAS):
            rgb_path = fdir / f"img_{camera_number:04d}.png"
            mask_path = fdir / f"img_{camera_number:04d}_alpha.png"
            camera_name = f"Cam{camera_number:03d}"
            dst_rgb = output_fp.get_rgb_path(camera_name, frame_number)
            dst_mask = output_fp.get_mask_path(camera_name, frame_number)
            dst_rgb.parent.mkdir(parents=True, exist_ok=True)
            dst_mask.parent.mkdir(parents=True, exist_ok=True)
            assert rgb_path.exists(), f"An RGB image is missing: {rgb_path}"
            assert mask_path.exists(), f"A mask image is missing: {mask_path}"
            cv2.imwrite(str(dst_rgb), cv2.imread(str(rgb_path)))
            shutil.copy(mask_path, dst_mask)

    # Intrinsics: "idx \n fx 0 cx \n 0 fy cy \n 0 0 1 \n \n" per camera.
    cameras = []
    with open(dfa_dataset_path / "Intrinsic.inf") as f:
        for camera_number in range(NUM_DFA_CAMERAS):
            assert camera_number == int(f.readline().strip(" \n"))
            fx, _, cx = [float(v) for v in f.readline().strip(" \n").split(" ")]
            _, fy, cy = [float(v) for v in f.readline().strip(" \n").split(" ")]
            f.readline()
            f.readline()
            cameras.append(
                CameraData(
                    name=f"Cam{camera_number:03d}",
                    width=1920,
                    height=1080,
                    rotation_axisangle=None,
                    translation=None,
                    focal_length=np.array([fx / 1920, fy / 1080]),
                    principal_point=np.array([cx / 1920, cy / 1080]),
                )
            )

    # Extrinsics: per row, [R T] displayed in columns (3rd, 1st, 2nd, then T).
    with open(dfa_dataset_path / "CamPose.inf") as f:
        for camera, line in zip(cameras, f):
            vals = np.array([float(v) for v in line.strip(" \n").split(" ")])
            cam2world = np.zeros((3, 3))
            cam2world[:, 2] = vals[0:3]
            cam2world[:, 0] = vals[3:6]
            cam2world[:, 1] = vals[6:9]
            camera.rotation_axisangle = Rotation.from_matrix(cam2world).as_rotvec()
            camera.translation = vals[-3:]

    write_calibration_csv(cameras, output_fp.calibration_path)
    print("Calibration file is written.")

    frame_numbers = sorted(frame_numbers)
    bound = 1.5  # DFA scenes are contained in the ±1.5 cube.
    initial_aabb = np.array([[-bound] * 3, [bound] * 3])
    write_aabbs_csv([AabbData(fn, initial_aabb) for fn in frame_numbers], output_fp.aabbs_path)
    print("Initial aabbs.csv is written.")

    grid_resolution = 256
    generate_occupancy_grid_from_masks(
        data_folder=Path(output_folder), grid_resolution=grid_resolution,
        camera_coverage_threshold=NUM_DFA_CAMERAS,
    )
    print("Initial occupancy grids are generated.")

    # Tighten the AABBs from the carved grids ([z][y][x] storage: the world x
    # coordinate varies along the innermost array axis).
    aabbs = []
    output_dataset = VolumetricDataset(Path(output_folder))
    lin = np.linspace(-bound, bound, grid_resolution)
    gz, gy, gx = np.meshgrid(lin, lin, lin, indexing="ij")
    coords = np.stack((gx, gy, gz), axis=-1)
    for frame_number in frame_numbers:
        grid = output_dataset.get_occupancy_grid(frame_number)
        occupied = coords[grid > 0]
        aabb = np.stack((occupied.min(0), occupied.max(0)), axis=0)
        assert (np.abs(aabb) < bound).all()
        aabbs.append(AabbData(frame_number=frame_number, aabb=aabb))
    write_aabbs_csv(aabbs, output_fp.aabbs_path)
    print("Final aabbs.csv is written.")

    generate_occupancy_grid_from_masks(
        data_folder=Path(output_folder), grid_resolution=grid_resolution,
        camera_coverage_threshold=NUM_DFA_CAMERAS,
    )
    print("Final occupancy grids are generated.")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dfa_dataset_folder", type=Path, required=True)
    parser.add_argument("--motion_type", type=str, required=True)
    parser.add_argument("--output_folder", type=Path, required=True)
    args = parser.parse_args()
    import_dfa(args.dfa_dataset_folder, args.motion_type, args.output_folder)


if __name__ == "__main__":
    main()
