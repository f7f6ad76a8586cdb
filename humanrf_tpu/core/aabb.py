"""Per-frame AABB CSV IO; schema matches `/root/reference/actorshq/dataset/aabb_data.py:15-68`."""
from __future__ import annotations

import csv
from dataclasses import dataclass
from pathlib import Path
from typing import List

import numpy as np


@dataclass
class AabbData:
    frame_number: int
    aabb: np.ndarray  # (2, 3): [min_xyz, max_xyz]


def read_aabbs_csv(input_csv_path: Path) -> List[AabbData]:
    aabbs = []
    with open(input_csv_path, "r", newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            aabbs.append(
                AabbData(
                    frame_number=int(row["frame_number"]),
                    aabb=np.array(
                        [
                            float(row["aabb_min_x"]),
                            float(row["aabb_min_y"]),
                            float(row["aabb_min_z"]),
                            float(row["aabb_max_x"]),
                            float(row["aabb_max_y"]),
                            float(row["aabb_max_z"]),
                        ]
                    ).reshape(2, 3),
                )
            )
    return aabbs


def write_aabbs_csv(aabbs: List[AabbData], output_csv_path: Path) -> None:
    names = [
        "frame_number",
        "aabb_min_x",
        "aabb_min_y",
        "aabb_min_z",
        "aabb_max_x",
        "aabb_max_y",
        "aabb_max_z",
    ]
    with open(output_csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=names)
        writer.writeheader()
        for a in aabbs:
            writer.writerow(
                {
                    "frame_number": str(a.frame_number),
                    "aabb_min_x": str(a.aabb[0, 0]),
                    "aabb_min_y": str(a.aabb[0, 1]),
                    "aabb_min_z": str(a.aabb[0, 2]),
                    "aabb_max_x": str(a.aabb[1, 0]),
                    "aabb_max_y": str(a.aabb[1, 1]),
                    "aabb_max_z": str(a.aabb[1, 2]),
                }
            )
