"""Build + run the native alembic_extractor on archives produced by the
Python writer (toolbox/write_alembic.py). Reader (C++) and writer (Python) are
independent implementations of the format subset documented in
abc_ogawa.hpp, so a layout bug on either side breaks the round trip."""
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from humanrf_tpu.toolbox.write_alembic import objs_to_abc, write_polymesh_abc

SRC = Path(__file__).resolve().parent.parent / "humanrf_tpu" / "native" / "alembic_extractor" / "main.cpp"


@pytest.fixture(scope="module")
def extractor_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    out = tmp_path_factory.mktemp("bin") / "alembic_extractor"
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", str(out), str(SRC), "-lpthread"], check=True)
    return out


def _tetra(offset):
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    ) + np.asarray(offset, dtype=np.float32)
    counts = np.asarray([3, 3, 3, 3], dtype=np.int32)
    indices = np.asarray([0, 2, 1, 0, 1, 3, 0, 3, 2, 1, 2, 3], dtype=np.int32)
    return verts, counts, indices


def _parse_obj(path: Path):
    verts, faces = [], []
    for line in path.read_text().splitlines():
        parts = line.split()
        if parts and parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts and parts[0] == "f":
            faces.append([int(t) - 1 for t in parts[1:]])
    return np.asarray(verts, dtype=np.float32), faces


def test_extractor_roundtrip(extractor_bin, tmp_path):
    frames = [_tetra((0.0, 0.0, 0.1 * i)) for i in range(3)]
    abc = write_polymesh_abc(tmp_path / "anim.abc", frames, mesh_name="person")

    out = tmp_path / "objs"
    res = subprocess.run(
        [str(extractor_bin), "--alembic", str(abc), "--output", str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "3 frames" in res.stdout and "person" in res.stdout

    for i, (verts, counts, indices) in enumerate(frames):
        got_v, got_f = _parse_obj(out / f"Frame{i:06d}.obj")
        np.testing.assert_allclose(got_v, verts, rtol=1e-6)
        assert len(got_f) == len(counts)
        # Faces are rewound clockwise -> counter-clockwise on export.
        offset = 0
        for f, n in zip(got_f, counts):
            np.testing.assert_array_equal(f, indices[offset : offset + n][::-1])
            offset += n


def test_extractor_varying_topology(extractor_bin, tmp_path):
    """Per-frame topology changes (different vertex/face counts) round-trip."""
    quad = (
        np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32),
        np.asarray([4], dtype=np.int32),
        np.asarray([0, 3, 2, 1], dtype=np.int32),
    )
    frames = [_tetra((0, 0, 0)), quad]
    abc = write_polymesh_abc(tmp_path / "vary.abc", frames)
    out = tmp_path / "objs"
    res = subprocess.run(
        [str(extractor_bin), "--alembic", str(abc), "--output", str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    v0, f0 = _parse_obj(out / "Frame000000.obj")
    v1, f1 = _parse_obj(out / "Frame000001.obj")
    assert v0.shape == (4, 3) and len(f0) == 4
    assert v1.shape == (4, 3) and len(f1) == 1 and len(f1[0]) == 4


def test_objs_to_abc_roundtrip(extractor_bin, tmp_path):
    """OBJ sequence -> .abc -> extractor -> identical OBJ geometry."""
    objs = []
    for i in range(2):
        verts, counts, indices = _tetra((0.2 * i, 0, 0))
        lines = [f"v {x} {y} {z}" for x, y, z in verts]
        offset = 0
        for n in counts:
            face = indices[offset : offset + n][::-1] + 1  # CCW obj winding
            lines.append("f " + " ".join(str(k) for k in face))
            offset += n
        p = tmp_path / f"in{i}.obj"
        p.write_text("\n".join(lines) + "\n")
        objs.append(p)

    abc = objs_to_abc(objs, tmp_path / "seq.abc")
    out = tmp_path / "objs"
    res = subprocess.run(
        [str(extractor_bin), "--alembic", str(abc), "--output", str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    for i, src in enumerate(objs):
        got_v, got_f = _parse_obj(out / f"Frame{i:06d}.obj")
        src_v, src_f = _parse_obj(src)
        np.testing.assert_allclose(got_v, src_v, rtol=1e-6)
        assert got_f == src_f


def test_extractor_rejects_garbage(extractor_bin, tmp_path):
    bad = tmp_path / "bad.abc"
    bad.write_bytes(b"not an ogawa file at all")
    res = subprocess.run(
        [str(extractor_bin), "--alembic", str(bad), "--output", str(tmp_path / "o")],
        capture_output=True, text=True,
    )
    assert res.returncode != 0
    assert "not an Ogawa archive" in res.stderr
