#!/usr/bin/env python3
"""Occupancy-grid generation by visual-hull carving from masks.

Replaces the reference's CUDA kernel + driver
(`/root/reference/actorshq/toolbox/occupancy_grid_generation.cu:16-121`,
`/root/reference/actorshq/toolbox/generate_occupancy_grids_from_masks.py:17-117`):
every voxel center is projected into all cameras; a voxel is occupied (255)
when ≥ `camera_coverage_threshold` cameras see it inside the (dilated) mask,
checking a 2×2 pixel neighborhood like the CUDA kernel (`:53-60`).

TPU/XLA recast: the per-voxel-per-camera loop becomes one batched matmul
(voxels × projection matrices) + a vectorized mask gather — no early-exit
pruning needed, the MXU eats the projection and the gather is one pass.
Runs fine on CPU too (it's an offline tool).
"""
from __future__ import annotations

import argparse
import itertools
import multiprocessing
from multiprocessing.pool import ThreadPool
from pathlib import Path

import cv2
import numpy as np

from humanrf_tpu.core.dataset import VolumetricDataset


def _carve(masks, projections, landscape_modes, widths, heights, threshold, grid_resolution, chunk=262144):
    """masks: (C, maxW*maxH) uint8; projections: (C, 4, 4) world→pixel.
    Returns (res³,) uint8 grid flattened in (x, y, z)-major order
    (matching the CUDA kernel's x + y·res + z·res² layout, `:20-24`)."""
    import jax
    import jax.numpy as jnp

    res = grid_resolution
    # Corner-aligned voxel coords i/(res-1) − 0.5, [z][y][x]-major flat order
    # (occupancy_grid_generation.cu:32-37,81).
    coords = np.arange(res) / (res - 1) - 0.5
    gz, gy, gx = np.meshgrid(coords, coords, coords, indexing="ij")
    voxels = np.stack([gx, gy, gz, np.ones_like(gx)], axis=-1).reshape(-1, 4).astype(np.float32)

    masks_j = jnp.asarray(masks)
    projections_j = jnp.asarray(projections.astype(np.float32))
    widths_j = jnp.asarray(widths)
    heights_j = jnp.asarray(heights)

    @jax.jit
    def carve_chunk(vox):
        # (V, 4) @ (C, 4, 4)^T → (C, V, 4)
        proj = jnp.einsum("cij,vj->cvi", projections_j, vox)
        z = proj[..., 2]
        px = proj[..., 0] / z
        py = proj[..., 1] / z
        in_front = z > 0

        # 2×2 neighborhood test (occupancy_grid_generation.cu:53-60).
        covered = jnp.zeros(px.shape, dtype=bool)
        for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            x = jnp.floor(px).astype(jnp.int32) + dx
            y = jnp.floor(py).astype(jnp.int32) + dy
            in_bounds = (x >= 0) & (x < widths_j[:, None]) & (y >= 0) & (y < heights_j[:, None])
            flat = jnp.clip(y * widths_j[:, None] + x, 0, masks_j.shape[1] - 1)
            val = jnp.take_along_axis(masks_j, flat, axis=1)
            covered = covered | (in_bounds & (val > 0))

        count = (covered & in_front).sum(axis=0)
        return (count >= threshold).astype(jnp.uint8) * 255

    out = np.empty(res**3, dtype=np.uint8)
    for start in range(0, voxels.shape[0], chunk):
        out[start : start + chunk] = np.asarray(carve_chunk(jnp.asarray(voxels[start : start + chunk])))
    return out


def generate_occupancy_grid_from_masks(
    data_folder: Path, grid_resolution: int, camera_coverage_threshold: int
) -> None:
    """Assumes the scene resides in [-0.5, 0.5] after normalization (the same
    formula the data loader uses, `generate_occupancy_grids_from_masks.py:31-40`)."""
    dataset = VolumetricDataset(data_folder)

    scene_offset, scene_scale = dataset.get_scene_normalization()
    cameras = dataset.get_scaled_cameras(scene_offset=scene_offset, scene_scale=scene_scale)

    available_camera_numbers, available_frame_numbers = dataset.get_available_cameras_and_frames()
    available_cameras = [cameras[i] for i in available_camera_numbers]
    num_cameras = len(available_cameras)
    max_w = max(max(c.width, c.height) for c in available_cameras)
    max_h = max_w

    projections = np.stack(
        [cam.projection_matrix_world2pixel() for cam in available_cameras], axis=0
    ).astype(np.float32)
    widths = np.asarray([cam.width for cam in available_cameras], dtype=np.int32)
    heights = np.asarray([cam.height for cam in available_cameras], dtype=np.int32)
    landscape_modes = np.asarray([cam.width > cam.height for cam in available_cameras])

    # Mask dilation margin so ray marching can't cross the surface
    # (generate_occupancy_grids_from_masks.py:63-67).
    dilation_size = max(max_w, max_h) // 128
    dilation_mask = np.ones((max(dilation_size, 1), max(dilation_size, 1)), np.uint8)

    masks = np.zeros((num_cameras, max_w * max_h), dtype=np.uint8)
    print(f"Generating occupancy grids for {data_folder} at resolution {grid_resolution}")
    for frame_number in available_frame_numbers:

        def load_mask(buffer_index, camera_number, fnum):
            mask = dataset.get_mask(camera_number, fnum, normalize=False)
            mask = cv2.dilate(mask.astype(np.uint8), dilation_mask, iterations=1)
            masks[buffer_index, : mask.size] = mask.reshape(-1)

        with ThreadPool(min(multiprocessing.cpu_count(), num_cameras)) as pool:
            pool.starmap(
                load_mask,
                zip(range(num_cameras), available_camera_numbers, itertools.repeat(frame_number)),
            )

        # Already [z][y][x]-major — the dataset's storage convention.
        grid = _carve(
            masks, projections, landscape_modes, widths, heights,
            camera_coverage_threshold, grid_resolution,
        ).reshape(grid_resolution, grid_resolution, grid_resolution)

        output_path = dataset.filepaths.get_occupancy_grid_path(frame_number)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(str(output_path), occupancy_grid=grid)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", type=Path, required=True)
    parser.add_argument("--grid_resolution", type=int, required=True)
    parser.add_argument("--camera_coverage_threshold", type=int, required=True)
    args = parser.parse_args()
    generate_occupancy_grid_from_masks(args.data_folder, args.grid_resolution, args.camera_coverage_threshold)


if __name__ == "__main__":
    main()
