#!/usr/bin/env python3
"""Bank round-5 run artifacts into runs_evidence/ (judge-checkable, durable).

Round-5 runs (each section banks whatever exists, so the script can be re-run
as results land without losing earlier banks):
  - quality control `gather-ref-capacity` at 384²/25f/5k (VERDICT r4 #1)
  - drift ablation arms wd0.03 / wd0 resumed from step 17,500 (VERDICT #2)
  - parallax probe PSNR-vs-angle rows (VERDICT #3)
  - 748² post-segment-skip throughput probe (VERDICT #4)
  - multiseg 4-segment FSDP run on the 8-virtual-device CPU mesh (VERDICT #6)

Checkpoints are NOT banked here: the control's are 6.4 GB each (reference-
capacity model) — validation.txt + config + renders are the evidence.

Usage: python scripts/bank_r5_evidence.py
"""
from __future__ import annotations

import shutil
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEST = REPO / "runs_evidence" / "r5_quality_and_dynamics"


def cp(src: Path, sub: str, name: str | None = None) -> bool:
    if not src.exists():
        return False
    d = DEST / sub
    d.mkdir(parents=True, exist_ok=True)
    shutil.copy(src, d / (name or src.name))
    print(f"  banked {src} -> {d / (name or src.name)}")
    return True


def bank_workspace(ws: Path, sub: str, n_images: int = 3) -> None:
    cp(ws / "validation.txt", sub)
    cp(ws / "config.yaml", sub)
    log = ws / "driver.log"
    if log.exists():
        tail = "\n".join(log.read_text(errors="replace").splitlines()[-80:])
        d = DEST / sub
        d.mkdir(parents=True, exist_ok=True)
        (d / "driver_log_tail.txt").write_text(tail + "\n")
        print(f"  banked log tail -> {d / 'driver_log_tail.txt'}")
    comps = sorted((ws / "validation").glob("*_comparison.png"))
    for img in comps[-n_images:]:
        cp(img, sub)


def main() -> None:
    # 1. Quality-at-capacity control (+ the banked treatment row for context).
    bank_workspace(Path("/tmp/quality_sweep/runs/gather-ref-capacity"), "control_gather_ref_capacity")
    cp(Path("/tmp/quality_sweep/results.json"), "control_gather_ref_capacity", "results_treatment.json")
    for f in ("results_r5.json", "results_r5_final.json", "results_r5_resume.json"):
        cp(Path("/tmp/quality_sweep") / f, "control_gather_ref_capacity")
    bank_workspace(Path("/tmp/quality_sweep/runs/fused-flagship"), "treatment_fused_flagship", n_images=2)

    # 2. Drift ablation arms.
    for arm in ("wd0.03", "wd0", "frozen-proposal", "lrfloor"):
        ws = Path("/tmp/drift_ablation") / arm
        if ws.exists():
            bank_workspace(ws, f"drift_{arm.replace('.', '_')}", n_images=2)
    cp(Path("/tmp/drift_ablation/results.json"), "drift_ablation_summary", "results.json")

    # 3. Parallax probe.
    cp(Path("/tmp/parallax_probe/results.json"), "parallax_probe")
    cp(Path("/tmp/parallax_probe_driver.log"), "parallax_probe", "driver_log.txt")

    # 4. Throughput probe at the 748² protocol shape.
    tput_ws = Path("/tmp/tput_probe/ws")
    if (tput_ws / "driver.log").exists():
        bank_workspace(tput_ws, "throughput_probe_748", n_images=0)
    cp(Path("/tmp/tput_probe_driver.log"), "throughput_probe_748", "probe_summary.txt")

    # 5. Multiseg 4-segment FSDP run (8-virtual-device CPU mesh).
    bank_workspace(Path("/tmp/multiseg_fsdp/ws"), "multiseg_fsdp_cpu8")
    cp(Path("/tmp/multiseg_fsdp/results.json"), "multiseg_fsdp_cpu8")
    cp(Path("/tmp/multiseg_fsdp/scene/scene_meta.json"), "multiseg_fsdp_cpu8")


if __name__ == "__main__":
    main()
