"""Exporters (NGP / COLMAP) against the synthetic dataset."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from humanrf_tpu.core.camera import read_calibration_csv


def test_export_colmap(synthetic_dataset, tmp_path):
    data_dir, cfg = synthetic_dataset
    res = subprocess.run(
        [
            sys.executable, "-m", "humanrf_tpu.toolbox.export_colmap",
            "--csv", str(data_dir / "calibration.csv"),
            "--output_dir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parent.parent,
    )
    assert res.returncode == 0, res.stderr
    cameras_txt = (tmp_path / "cameras.txt").read_text().strip().splitlines()
    images_txt = (tmp_path / "images.txt").read_text()
    assert len(cameras_txt) == cfg.num_cameras
    assert cameras_txt[0].split()[1] == "PINHOLE"
    assert (tmp_path / "points3D.txt").exists()

    # Quaternion/translation roundtrip: COLMAP world2cam must invert our cam2world.
    cams = read_calibration_csv(data_dir / "calibration.csv")
    from scipy.spatial.transform import Rotation

    first = images_txt.strip().splitlines()[0].split()
    w, x, y, z = map(float, first[1:5])
    t = np.array(list(map(float, first[5:8])))
    R_w2c = Rotation.from_quat([x, y, z, w]).as_matrix()
    np.testing.assert_allclose(R_w2c @ cams[0].rotation_matrix_cam2world(), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(-R_w2c.T @ t, cams[0].translation, atol=1e-6)


def test_export_ngp(synthetic_dataset, tmp_path):
    data_dir, cfg = synthetic_dataset
    res = subprocess.run(
        [
            sys.executable, "-m", "humanrf_tpu.toolbox.export_ngp",
            "--data_folder", str(data_dir),
            "--frame_number", "0",
            "--output_dir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parent.parent,
    )
    assert res.returncode == 0, res.stderr
    transforms = sorted(tmp_path.glob("transforms*.json"))
    assert len(transforms) == cfg.num_cameras
    t0 = json.loads(transforms[0].read_text())
    assert t0["w"] == cfg.width and t0["h"] == cfg.height
    assert len(t0["frames"]) == 1
    m = np.asarray(t0["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])
    # Masked RGBA images written.
    assert len(list((tmp_path / "images").glob("*.png"))) == cfg.num_cameras


def test_occupancy_generation_matches_synthetic(synthetic_dataset, tmp_path):
    """Visual-hull carving from the synthetic masks must cover the analytic
    sphere grid (carve is a superset: hull ⊇ sphere)."""
    import shutil

    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.toolbox.generate_occupancy_grids_from_masks import (
        generate_occupancy_grid_from_masks,
    )

    data_dir, cfg = synthetic_dataset
    # Work on a copy so the session-scoped fixture's grids stay pristine.
    root = tmp_path / "copy"
    shutil.copytree(data_dir.parent, root)
    copy_dir = root / data_dir.name

    ds = VolumetricDataset(copy_dir)
    original = ds.get_occupancy_grid(0)

    generate_occupancy_grid_from_masks(copy_dir, grid_resolution=cfg.grid_resolution,
                                       camera_coverage_threshold=cfg.num_cameras)
    carved = VolumetricDataset(copy_dir).get_occupancy_grid(0)
    assert carved.shape == original.shape

    sphere = original > 0  # analytic (dilated) sphere
    hull = carved > 0
    # The visual hull must cover nearly all of the true sphere interior
    # (modulo the analytic grid's own dilation margin)...
    core = sphere & np.roll(sphere, 2, 0) & np.roll(sphere, -2, 0) & np.roll(sphere, 2, 2) & np.roll(sphere, -2, 2)
    assert (hull & core).sum() / max(core.sum(), 1) > 0.95
    # ...and not blow up to the whole cube.
    assert hull.mean() < 4 * sphere.mean() + 0.02
