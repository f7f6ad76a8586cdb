"""Trajectory generation + trajectory data loaders (novel-view rendering)."""
import numpy as np
import pytest

from humanrf_tpu.core.camera import read_calibration_csv
from humanrf_tpu.data.loader import DataLoader
from humanrf_tpu.data.trajectory import (
    _ping_pong_sequence,
    generate_camera_trajectory,
    get_trajectory_dataloader_from_keycams,
)


def test_ping_pong_sequence():
    # Matches the reference CODE's ping-pong (trajectory.py:62-74), which
    # repeats the endpoint on reversal (its docstring says otherwise — the
    # code wins).
    seq = _ping_pong_sequence(5, (10, 11, 12))
    assert seq == [(0, 10), (1, 11), (2, 12), (3, 12), (4, 11)]
    seq = _ping_pong_sequence(3, (0, 1, 2, 3, 4))
    assert seq == [(0, 0), (1, 1), (2, 2), (2, 3), (1, 4)]


def test_generate_camera_trajectory_interpolates(synthetic_dataset):
    data_dir, cfg = synthetic_dataset
    cameras = read_calibration_csv(data_dir / "calibration.csv")
    key = [cameras[0], cameras[2], cameras[4]]
    traj = generate_camera_trajectory(key, cameras[1], num_frames=20)
    assert len(traj) == 20
    # Endpoints ~ the key cameras' positions.
    np.testing.assert_allclose(traj[0].translation, key[0].translation, atol=1e-2)
    np.testing.assert_allclose(traj[-1].translation, key[-1].translation, atol=1e-2)
    # Intrinsics copied from the intrinsics camera.
    np.testing.assert_allclose(traj[5].focal_length, cameras[1].focal_length)
    # Positions stay on a smooth path (bounded step sizes).
    steps = [
        np.linalg.norm(traj[i + 1].translation - traj[i].translation) for i in range(19)
    ]
    assert max(steps) < 4 * (sum(steps) / len(steps))


def test_keycam_trajectory_dataloader(synthetic_dataset):
    data_dir, cfg = synthetic_dataset
    loader = get_trajectory_dataloader_from_keycams(
        trajectory=(0, 2, 4),
        base_data_folder=data_dir,
        dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
        space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
        batch_size=512,
        frame_numbers=(0, 1),
        trajectory_num_cameras=6,
    )
    assert loader.mode == DataLoader.Mode.TEST
    assert loader.num_camera_frame_pairs == 6
    batch, pool, grids, info = next(iter(loader))
    assert batch.pixel_idx.shape == (512,)
    assert info.camera_number is not None
    loader.shutdown()
