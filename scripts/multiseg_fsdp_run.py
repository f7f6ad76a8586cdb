#!/usr/bin/env python3
"""Long-sequence evidence run: ≥4 adaptive segments + FSDP tables + chunked
dispatch, end to end (VERDICT round-4 next #6).

Everything banked to date trains [25, 25]; this run crosses the >2-segment
regime the reference reaches via the `siggraph_interval_2` 250-frame preset
(`/root/reference/actorshq/evaluation/presets.py:41`) and CPU paging of
inactive segments. The TPU answer is FSDP table sharding (parallel/fsdp.py),
which needs >1 device — so the natural venue is the 8-virtual-device CPU mesh
(the same mesh the multichip dryrun and test suite use), not the single real
chip. 100 frames with 2× the 50-frame protocol travel partitions adaptively
into 4 segments of 25 (train/partitioning.py ladder).

The run exercises, in one process: adaptive partitioning at n=4, frame-window
batches crossing segment boundaries, `lax.cond` inactive-segment skipping,
FSDP sharding of segment tables + Adam moments (with the per-device-bytes
assertion), and K>1 chunked dispatch under FSDP (the round-5 composition fix).

Usage: python scripts/multiseg_fsdp_run.py [--steps 900] [--size 192]
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from driver_common import compile_cache_env, ensure_scene  # noqa: E402


def make_scene(root: Path, frames: int, size: int) -> None:
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    # 0.16 travel / 50 frames → [25, 25] (full_schedule_run); double the
    # horizon at the same speed → 4 boundary crossings of the occupancy-union
    # expansion threshold → [25, 25, 25, 25].
    travel = 0.16 * (frames / 50.0)
    cfg = SyntheticSceneConfig(
        num_cameras=12,
        width=size,
        height=size,
        num_frames=frames,
        sphere_radius=0.3,
        center_start=(0.0, 0.0, -travel / 2),
        center_end=(0.0, 0.0, travel / 2),
        grid_resolution=128,
        texture_frequency=30.0,
        num_rods=12,
        rod_radius=0.015,
        rod_length=0.25,
    )
    generate_synthetic_dataset(root, cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--frames", type=int, default=100)
    # CPU-mesh reality: the onehot/fused interpolating-matmul trick is a TPU
    # (MXU) design; on the virtual CPU mesh the gather backend is the
    # idiomatic choice and orders of magnitude faster. FSDP sharding/routing
    # semantics are backend-independent (tables are sharded either way).
    ap.add_argument("--backend", default="gather")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--prop-samples", type=int, default=16)
    ap.add_argument("--render-samples", type=int, default=8)
    ap.add_argument("--root", type=Path, default=Path("/tmp/multiseg_fsdp"))
    ap.add_argument("--out", type=Path, default=Path("/tmp/multiseg_fsdp/results.json"))
    args = ap.parse_args()

    scene = args.root / "scene"
    ws = args.root / "ws"
    if ensure_scene(
        scene,
        {"size": args.size, "frames": args.frames, "multiseg": True},
        lambda root: make_scene(root, args.frames, args.size),
        stale_dirs=(ws,),
    ):
        print("# generated scene", flush=True)

    cmd = [
        sys.executable, "-m", "humanrf_tpu.run",
        "--config", "example_synthetic",
        "--dataset.path", str(scene),
        "--workspace", str(ws),
        "--device", "cpu",
        "--tpu.num_devices", "8",
        "--tpu.param_sharding", "fsdp",
        "--tpu.steps_per_dispatch", "5",
        "--tpu.field_backend", args.backend,
        "--tpu.sampling", "proposal",
        "--tpu.proposal_samples_per_ray", str(args.prop_samples),
        "--tpu.render_samples_per_ray", str(args.render_samples),
        "--tpu.candidate_rays_factor", "2",
        "--model.temporal_partitioning", "adaptive",
        "--model.log2_hashmap_size", "13",
        "--model.n_levels", "8",
        "--model.n_features_per_level", "4",
        "--model.finest_resolution", "1024",
        "--model.camera_embedding_dim", "2",
        "--training.max_steps", str(args.steps),
        "--training.rays_initial_batch_size", str(args.batch),
        "--training.save_checkpoint_every_n_steps", str(args.steps),
        # Must stay a multiple of steps_per_dispatch=5 (trainer boundary rule).
        "--validation.every_n_steps", str(max(100, args.steps // 4 // 5 * 5)),
        "--validation.rays_batch_size", str(2 * args.batch),
        "--validation.repeat_cameras", "1",
        "--dataset.frame_numbers", *[str(i) for i in range(args.frames)],
        "--dataset.max_buffer_size", "24",
        "--dataset.max_num_frames_per_batch", "8",
    ]
    env = compile_cache_env(REPO)
    # 8 virtual CPU devices; run.py's --device cpu pins jax_platforms=cpu.
    xla = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"

    log = args.root / "driver.log"
    print("# launching:", " ".join(cmd), flush=True)
    t0 = time.time()
    with open(log, "w") as f:
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, env=env, cwd=REPO).returncode

    text = log.read_text()
    seg = re.search(r"segment sizes: \[([^\]]+)\]", text)
    fsdp_lines = [l for l in text.splitlines() if "fsdp" in l.lower() or "per-device" in l.lower()]
    from validation_report import block_means, parse_validation_blocks

    result = {
        "rc": rc,
        "wall_s": round(time.time() - t0, 1),
        "segment_sizes": [int(s) for s in seg.group(1).split(",")] if seg else None,
        "fsdp_log_lines": fsdp_lines[:8],
        "validation_blocks": None,
    }
    try:
        result["validation_blocks"] = block_means(parse_validation_blocks(ws))
    except Exception as e:  # pragma: no cover - reporting only
        result["validation_error"] = repr(e)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2), flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
