"""Build + run the native C++ mesh renderer and check its masks against the
synthetic dataset's analytic sphere masks."""
import shutil
import subprocess
from pathlib import Path

import cv2
import numpy as np
import pytest

SRC = Path(__file__).resolve().parent.parent / "humanrf_tpu" / "native" / "mesh_renderer" / "main.cpp"


@pytest.fixture(scope="module")
def renderer_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    out = tmp_path_factory.mktemp("bin") / "mesh_renderer"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", str(out), str(SRC), "-lpthread"], check=True
    )
    return out


def _write_icosphere_obj(path: Path, center, radius, subdivisions=3):
    """UV-sphere OBJ around `center`."""
    n_lat, n_lon = 24, 48
    verts = []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append(
                (
                    center[0] + radius * np.sin(theta) * np.cos(phi),
                    center[1] + radius * np.sin(theta) * np.sin(phi),
                    center[2] + radius * np.cos(theta),
                )
            )
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append((a, c, b))
            faces.append((b, c, d))
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def test_renderer_masks_match_analytic(renderer_bin, synthetic_dataset, tmp_path):
    data_dir, cfg = synthetic_dataset
    obj = tmp_path / "Frame000000.obj"
    # Frame 0 sphere center from the synthetic config.
    _write_icosphere_obj(obj, cfg.center_start, cfg.sphere_radius)

    out = tmp_path / "rendered"
    res = subprocess.run(
        [
            str(renderer_bin),
            "--objs", str(obj),
            "--csv", str(data_dir / "calibration.csv"),
            "--output", str(out),
            "--mask", "--depth",
            "--cameras", "Cam001", "Cam002",
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr

    for cam in ("Cam001", "Cam002"):
        mask_path = out / "masks" / cam / f"{cam}_mask000000.png"
        assert mask_path.exists()
        rendered = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
        assert rendered is not None, "png not readable by cv2"
        gt = cv2.imread(
            str(data_dir / "masks" / cam / f"{cam}_mask000000.png"), cv2.IMREAD_GRAYSCALE
        )
        inter = ((rendered > 0) & (gt > 0)).sum()
        union = ((rendered > 0) | (gt > 0)).sum()
        iou = inter / max(union, 1)
        assert iou > 0.93, f"{cam}: mask IoU {iou:.3f} too low"

        depth_path = out / "depths" / cam / f"{cam}_depth000000.pfm"
        assert depth_path.exists()
        with open(depth_path, "rb") as f:
            assert f.readline().strip() == b"Pf"


def test_renderer_bad_args(renderer_bin):
    res = subprocess.run([str(renderer_bin), "--nope"], capture_output=True, text=True)
    assert res.returncode == 2
    res = subprocess.run([str(renderer_bin)], capture_output=True, text=True)
    assert res.returncode == 2
    assert "usage" in res.stderr
