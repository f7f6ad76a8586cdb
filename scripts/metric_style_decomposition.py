#!/usr/bin/env python3
"""Decompose the r4 'val→test 6 dB gap' into metric definition vs view gap.

Trainer validation reports UNMASKED ROI PSNR (background pixels included,
`trainer.py::_evaluate_one_image`); the evaluate phase reports MASKED PSNR
(foreground-only, `evaluation/evaluate.py`, mirroring the reference protocol
`/root/reference/actorshq/evaluation/evaluate.py:55-73`). The two were never
comparable. This recomputes BOTH styles on the SAME banked test renders
(the r4 evaluate phase's 17 Cam012 frames), isolating the metric component;
scripts/parallax_probe.py supplies the PSNR-vs-angle curve for the rest.

Measured 2026-08-19 (round 5): ROI 23.95 dB vs masked 19.22 dB on identical
images → 4.73 dB of the 25.81-vs-19.22 gap is metric definition; the
like-for-like view gap is ~1.9 dB.

Usage: python scripts/metric_style_decomposition.py
       [--results /tmp/full_schedule/workspace/results/test_frames]
       [--scene /tmp/full_schedule/scene/SynthActor/Sequence1/1x]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from humanrf_tpu.evaluation.metrics import compute_psnr  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=Path, default=Path("/tmp/full_schedule/workspace/results/test_frames"))
    ap.add_argument("--scene", type=Path, default=Path("/tmp/full_schedule/scene/SynthActor/Sequence1/1x"))
    ap.add_argument("--camera", default="Cam012")
    args = ap.parse_args()

    roi, masked = [], []
    for p in sorted(args.results.glob(f"{args.camera}_rgb*.png")):
        frame = int(p.stem.split("rgb")[1])
        gt_c = list((args.scene / "rgbs" / args.camera).glob(f"*{frame:06d}*"))
        mask_c = list((args.scene / "masks" / args.camera).glob(f"*{frame:06d}*"))
        if not gt_c or not mask_c:
            continue
        pred = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB).astype(np.float64) / 255
        gt = cv2.cvtColor(cv2.imread(str(gt_c[0])), cv2.COLOR_BGR2RGB).astype(np.float64) / 255
        mask = cv2.imread(str(mask_c[0]))[..., 0:1]
        gt_black = gt * (mask > 0)  # validation composites GT on black
        x, y, w, h = cv2.boundingRect(mask)
        pr, gr, mr = pred[y : y + h, x : x + w], gt_black[y : y + h, x : x + w], mask[y : y + h, x : x + w]
        roi.append(compute_psnr(pr, gr))
        masked.append(compute_psnr(pr, gr, mask=mr))

    assert roi, f"no comparable frames under {args.results}"
    print(f"n={len(roi)} frames ({args.camera})")
    print(f"ROI (val-style)      PSNR: {np.mean(roi):.2f} dB")
    print(f"masked (eval-style)  PSNR: {np.mean(masked):.2f} dB")
    print(f"metric-style delta:        {np.mean(roi) - np.mean(masked):.2f} dB")


if __name__ == "__main__":
    main()
