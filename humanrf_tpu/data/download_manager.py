#!/usr/bin/env python3
"""ActorsHQ download manager.

Same CLI and lazy-download capability as the reference tool
(`/root/reference/actorshq/dataset/download_manager.py`): given the signed-URL
yaml issued by the ActorsHQ website, assemble the on-disk dataset layout —
per-frame rgb/mask tars fanned out into per-camera folders, calibration,
scene metadata, occupancy grids, aabbs, light annotations, and optionally the
alembic meshes. Every artifact is skipped when it already exists locally, so
interrupted downloads resume for free.

Implementation is stdlib-only (urllib + tarfile + lzma); requires network
access, which CI images lack — exercised only on developer machines.
"""
from __future__ import annotations

import argparse
import io
import json
import lzma
import tarfile
from pathlib import Path
from typing import Sequence

from humanrf_tpu.core.dataset import VolumetricDatasetFilepaths

_UNAVAILABLE = {("Actor03", "Sequence2"), ("Actor07", "Sequence2")}


class _Fetcher:
    """Lazy HTTP fetcher: a target that already exists is never re-fetched."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose

    def fetch(self, url: str, target: Path) -> Path:
        if not target.exists():
            if self.verbose:
                print(f"Downloading {target.name} ...")
            from urllib.request import urlopen

            target.parent.mkdir(parents=True, exist_ok=True)
            tmp = target.with_suffix(target.suffix + ".part")
            with urlopen(url) as response, open(tmp, "wb") as f:
                while chunk := response.read(1 << 20):
                    f.write(chunk)
            tmp.rename(target)
        return target

    def fetch_bytes(self, url: str) -> bytes:
        from urllib.request import urlopen

        with urlopen(url) as response:
            return response.read()


def _extract_view_tar(tar_bytes: bytes, kind_root: Path) -> None:
    """Fan a per-frame tar of 160 view images out into per-camera folders.

    Members are named ``Cam{NNN}_{rgb|mask}{FFFFFF}.{jpg|png}``; the camera
    folder is derived from each member's name prefix.
    """
    with tarfile.open(fileobj=io.BytesIO(tar_bytes)) as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            camera_name = Path(member.name).name.split("_", 1)[0]
            dest_dir = kind_root / camera_name
            dest_dir.mkdir(parents=True, exist_ok=True)
            payload = tar.extractfile(member)
            (dest_dir / Path(member.name).name).write_bytes(payload.read())


def download_dataset(
    dataset_file: Path,
    dataset_target: Path,
    actor: str,
    sequence: str,
    scale: int,
    frame_start: int = 0,
    frame_stop: int = 0,
    include_rgb: bool = True,
    include_mask: bool = True,
    include_mesh: bool = False,
    include_lightannotations: bool = True,
) -> Path:
    if (actor, sequence) in _UNAVAILABLE:
        raise RuntimeError(f"{actor}{sequence} is not publicly available!")

    import yaml

    print("Reading links ...")
    with open(dataset_file, "r", encoding="UTF-8") as f:
        seq_links = yaml.safe_load(f)[actor][sequence]
    scale_links = seq_links[f"{scale}x"]

    sequence_dir = Path(dataset_target) / actor / sequence
    scale_dir = sequence_dir / f"{scale}x"
    paths = VolumetricDatasetFilepaths(scale_dir)
    scale_dir.mkdir(parents=True, exist_ok=True)

    fetcher = _Fetcher()

    # Sequence-level metadata first: scene.json bounds the frame range.
    fetcher.fetch(seq_links["scene"], paths.metadata_path)
    if frame_stop == 0:
        frame_stop = json.loads(paths.metadata_path.read_text())["num_frames"]

    # Per-frame view tars. Existence of the Cam001 image is the resume marker.
    view_kinds = []
    if include_rgb:
        view_kinds.append(("rgbs", paths.get_rgb_path))
    if include_mask:
        view_kinds.append(("masks", paths.get_mask_path))
    for frame in range(frame_start, frame_stop):
        for kind, probe in view_kinds:
            if probe("Cam001", frame).exists():
                continue
            url = scale_links[kind][f"{kind}_{frame:06d}"]
            _extract_view_tar(fetcher.fetch_bytes(url), scale_dir / kind)

    fetcher.fetch(scale_links["calibration"], paths.calibration_path)
    fetcher.fetch(seq_links["aabbs"], paths.aabbs_path)
    if include_lightannotations:
        fetcher.fetch(scale_links["light_annotations"], paths.get_light_annotations_path())

    if not paths.get_occupancy_grid_path(0).exists():
        with tarfile.open(fileobj=io.BytesIO(fetcher.fetch_bytes(seq_links["occupancy_grids"])), mode="r:gz") as tar:
            tar.extractall(sequence_dir, filter="data")

    if include_mesh:
        mesh_path = sequence_dir / "meshes.abc"
        if not mesh_path.exists():
            mesh_path.write_bytes(lzma.decompress(fetcher.fetch_bytes(seq_links["meshes"])))

    return scale_dir


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset_file", type=Path)
    parser.add_argument("target", type=Path)
    parser.add_argument("--actor", choices=[f"Actor{i:02d}" for i in range(1, 9)], required=True)
    parser.add_argument("--sequence", choices=["Sequence1", "Sequence2"], required=True)
    parser.add_argument("--scale", type=int, choices=[1, 2, 4], default=4)
    parser.add_argument("--frame_start", type=int, default=0)
    parser.add_argument("--frame_stop", type=int, default=0)
    parser.add_argument("--include", default=["rgb", "mask"], choices=["mesh", "rgb", "mask"], nargs="*")
    args = parser.parse_args(argv)

    download_dataset(
        args.dataset_file,
        args.target,
        args.actor,
        args.sequence,
        args.scale,
        args.frame_start,
        args.frame_stop,
        include_rgb="rgb" in args.include,
        include_mask="mask" in args.include,
        include_mesh="mesh" in args.include,
    )


if __name__ == "__main__":
    main()
