"""Novel-view trajectory data loaders.

Semantics match `/root/reference/actorshq/dataset/trajectory.py:13-163` (ping-pong
(camera, frame) zipper over a calibration file) and
`/root/reference/actorshq/dataset/generate_camera_trajectory.py:11-62` (Slerp
rotations + quadratic-spline translations between key cameras, arc-length-ish
time parametrization in world-to-camera form).
"""
from __future__ import annotations

import shutil
from pathlib import Path
from tempfile import TemporaryDirectory
from typing import List, Tuple

import numpy as np
from scipy import interpolate
from scipy.spatial.transform import Rotation, Slerp

from humanrf_tpu.core.camera import CameraData, read_calibration_csv, write_calibration_csv
from humanrf_tpu.core.dataset import VolumetricDataset, VolumetricDatasetFilepaths
from humanrf_tpu.data.loader import DataLoader


def generate_camera_trajectory(
    key_cameras: List[CameraData],
    intrinsics_camera: CameraData,
    num_frames: int,
) -> List[CameraData]:
    """Smooth trajectory through key cameras: slerp world2cam rotations and
    spline world2cam translations, time-parametrized by inter-key distance."""
    key_rotations_w2c = np.stack([cam.rotation_matrix_cam2world().T for cam in key_cameras], axis=0)
    key_translations_w2c = np.stack(
        [-rot @ cam.translation for cam, rot in zip(key_cameras, key_rotations_w2c)], axis=0
    )
    key_positions = np.stack([cam.translation for cam in key_cameras], axis=0)

    interval_lengths = np.linalg.norm(key_positions[1:] - key_positions[:-1], axis=1)
    interval_lengths = interval_lengths / interval_lengths.sum()
    key_times = np.cumsum([0] + list(interval_lengths))

    slerp = Slerp(key_times, Rotation.from_matrix(key_rotations_w2c))
    spline = interpolate.make_interp_spline(key_times, key_translations_w2c, k=min(2, len(key_cameras) - 1))

    times = np.linspace(1e-5, 1 - 1e-5, num_frames)
    rotations = slerp(times).as_matrix().astype(np.float32)
    translations = spline(times).astype(np.float32)

    cameras = []
    num_decimals = int(np.log10(num_frames)) + 1
    for idx, (rot_w2c, t_w2c) in enumerate(zip(rotations, translations)):
        cameras.append(
            CameraData(
                name=f"Cam{idx + 1}".zfill(num_decimals),
                width=intrinsics_camera.width,
                height=intrinsics_camera.height,
                rotation_axisangle=Rotation.from_matrix(rot_w2c.T).as_rotvec(),
                translation=-rot_w2c.T @ t_w2c,
                focal_length=intrinsics_camera.focal_length.copy(),
                principal_point=intrinsics_camera.principal_point.copy(),
            )
        )
    return cameras


def _ping_pong_sequence(num_cameras: int, frame_numbers: Tuple[int, ...]) -> List[Tuple[int, int]]:
    """(camera, frame) zipper from trajectory.py:62-74."""
    render_sequence = []
    total_num_frames = len(frame_numbers)
    total_length = max(total_num_frames, num_cameras)
    for num in range(total_length):
        camera_number = num % num_cameras
        if (num // num_cameras) % 2 == 1:
            camera_number = num_cameras - 1 - camera_number
        frame_idx = num % total_num_frames
        if (num // total_num_frames) % 2 == 1:
            frame_idx = total_num_frames - 1 - frame_idx
        render_sequence.append((camera_number, frame_numbers[frame_idx]))
    return render_sequence


def get_trajectory_dataloader_from_calibration(
    calibration_path: Path,
    base_data_folder: Path,
    dataloader_output_mode: DataLoader.OutputMode,
    space_pruning_mode: DataLoader.SpacePruningMode,
    batch_size: int,
    frame_numbers: Tuple[int, ...],
) -> DataLoader:
    """Copies the calibration into `<seq>/test/` (reference layout) and builds a
    TEST loader whose render sequence ping-pongs cameras against frames."""
    base_data_folder = Path(base_data_folder)
    test_data_folder = base_data_folder.parent / "test"
    if test_data_folder.exists():
        shutil.rmtree(test_data_folder)
    test_data_folder.mkdir()
    new_fp = VolumetricDatasetFilepaths(test_data_folder)
    shutil.copy(calibration_path, new_fp.calibration_path)

    new_cameras = read_calibration_csv(new_fp.calibration_path)
    assert len(new_cameras) > 0
    render_sequence = _ping_pong_sequence(len(new_cameras), tuple(frame_numbers))

    return DataLoader(
        dataset=VolumetricDataset(new_fp.folder, crop_center_square=False),
        mode=DataLoader.Mode.TEST,
        dataloader_output_mode=dataloader_output_mode,
        space_pruning_mode=space_pruning_mode,
        batch_size=batch_size,
        camera_numbers=tuple(range(len(new_cameras))),
        frame_numbers=tuple(frame_numbers),
        max_buffer_size=1,
        render_sequence=render_sequence,
    )


def get_trajectory_dataloader_from_keycams(
    trajectory: Tuple[int, ...],
    base_data_folder: Path,
    dataloader_output_mode: DataLoader.OutputMode,
    space_pruning_mode: DataLoader.SpacePruningMode,
    batch_size: int,
    frame_numbers: Tuple[int, ...],
    trajectory_num_cameras: int,
) -> DataLoader:
    base_data_folder = Path(base_data_folder)
    if len(trajectory) == 1:
        render_sequence = [(trajectory[0], fn) for fn in frame_numbers]
        return DataLoader(
            dataset=VolumetricDataset(base_data_folder, crop_center_square=False),
            mode=DataLoader.Mode.TEST,
            dataloader_output_mode=dataloader_output_mode,
            space_pruning_mode=space_pruning_mode,
            batch_size=batch_size,
            camera_numbers=tuple(trajectory),
            frame_numbers=tuple(frame_numbers),
            max_buffer_size=1,
            render_sequence=render_sequence,
        )

    cameras = read_calibration_csv(VolumetricDatasetFilepaths(base_data_folder).calibration_path)
    trajectory_cameras = generate_camera_trajectory(
        key_cameras=[cameras[i] for i in trajectory],
        intrinsics_camera=cameras[trajectory[1]],
        num_frames=trajectory_num_cameras,
    )
    with TemporaryDirectory() as tmpdir:
        tmp_calibration = Path(tmpdir) / "calibration.csv"
        write_calibration_csv(trajectory_cameras, tmp_calibration)
        return get_trajectory_dataloader_from_calibration(
            calibration_path=tmp_calibration,
            base_data_folder=base_data_folder,
            dataloader_output_mode=dataloader_output_mode,
            space_pruning_mode=space_pruning_mode,
            batch_size=batch_size,
            frame_numbers=tuple(frame_numbers),
        )
