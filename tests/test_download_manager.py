"""Hermetic download-manager test: network stubbed, layout logic exercised
(reference capability: /root/reference/actorshq/dataset/download_manager.py)."""
import io
import json
import tarfile

import pytest
import yaml

from humanrf_tpu.data import download_manager as dm


def _tar_bytes(names, mode="w"):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tar:
        for name, payload in names.items():
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


@pytest.fixture
def fake_remote(tmp_path, monkeypatch):
    """An in-memory 'server' plus the signed-URL yaml pointing into it."""
    frames = [0, 1]
    store = {
        "u://scene": json.dumps({"num_frames": len(frames)}).encode(),
        "u://calib": b"name,width,height\n",
        "u://aabbs": b"frame_number\n",
        "u://light": b"camera,frame,x,y\n",
        "u://occ": _tar_bytes(
            {"occupancy_grids/occupancy_grid000000.npz": b"npzdata"}, mode="w:gz"
        ),
    }
    links = {"scene": "u://scene", "aabbs": "u://aabbs", "occupancy_grids": "u://occ",
             "4x": {"calibration": "u://calib", "light_annotations": "u://light",
                    "rgbs": {}, "masks": {}}}
    for f in frames:
        rgb_key, mask_key = f"u://rgb{f}", f"u://mask{f}"
        store[rgb_key] = _tar_bytes(
            {f"Cam{c:03d}_rgb{f:06d}.jpg": b"jpg" for c in (1, 2)}
        )
        store[mask_key] = _tar_bytes(
            {f"Cam{c:03d}_mask{f:06d}.png": b"png" for c in (1, 2)}
        )
        links["4x"]["rgbs"][f"rgbs_{f:06d}"] = rgb_key
        links["4x"]["masks"][f"masks_{f:06d}"] = mask_key

    yaml_path = tmp_path / "links.yaml"
    yaml_path.write_text(yaml.safe_dump({"Actor01": {"Sequence1": links}}))

    calls = []

    def fake_fetch_bytes(self, url):
        calls.append(url)
        return store[url]

    def fake_fetch(self, url, target):
        if not target.exists():
            calls.append(url)
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(store[url])
        return target

    monkeypatch.setattr(dm._Fetcher, "fetch_bytes", fake_fetch_bytes)
    monkeypatch.setattr(dm._Fetcher, "fetch", fake_fetch)
    return yaml_path, calls


def test_download_dataset_assembles_layout(tmp_path, fake_remote):
    yaml_path, calls = fake_remote
    out = dm.download_dataset(yaml_path, tmp_path / "data", "Actor01", "Sequence1", 4)

    assert out == tmp_path / "data" / "Actor01" / "Sequence1" / "4x"
    # View images fanned out into per-camera folders.
    for cam in ("Cam001", "Cam002"):
        for f in (0, 1):
            assert (out / "rgbs" / cam / f"{cam}_rgb{f:06d}.jpg").read_bytes() == b"jpg"
            assert (out / "masks" / cam / f"{cam}_mask{f:06d}.png").exists()
    assert (out / "calibration.csv").exists()
    assert (out.parent / "scene.json").exists()
    assert (out.parent / "aabbs.csv").exists()
    assert (out.parent / "occupancy_grids" / "occupancy_grid000000.npz").exists()
    assert (out / "light_annotations.csv").exists()

    # Lazy resume: a second run re-fetches nothing.
    calls.clear()
    dm.download_dataset(yaml_path, tmp_path / "data", "Actor01", "Sequence1", 4)
    assert calls == []


def test_download_dataset_rejects_private_sequences(tmp_path, fake_remote):
    yaml_path, _ = fake_remote
    with pytest.raises(RuntimeError, match="not publicly available"):
        dm.download_dataset(yaml_path, tmp_path, "Actor03", "Sequence2", 4)
