#!/usr/bin/env python3
"""Benchmark: flagship HumanRF training step throughput on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Setup mirrors the reference's example_humanrf run (BASELINE.md):
50-frame sequence (single adaptive segment → per-segment hashmap 2^18),
16-level hash grids (32→2048), 640k-sample budget, 8192-ray batches,
occupancy-guided sampling at step 4e-4, visibility pruning, Huber+BCE loss,
Adam — the full differentiable pipeline, one jitted step.

Baseline: the reference publishes no numbers (BASELINE.md); we use an
estimated A100 reference of 50,000 supervised training rays/sec — ≈8.2k
supervised rays/step (the 640k budget at the measured ~78 samples/ray fill)
× ~6 it/s (iNGP-class tcnn throughput scaled to HumanRF's 4-grid model on
A100). Derivation + sensitivity band (±2×: 25k-100k) in BASELINE.md — the
constant is the central estimate, not a measured number.
"""
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 50_000.0

def main():
    import jax

    # Persistent XLA compile cache: the flagship scan-chunked step costs
    # ~3-20 min to compile through the remote-TPU tunnel; with the
    # repo-resident cache a repeat bench (same config/jax build) reaches its
    # first timed step in seconds. NB this must go through jax.config.update,
    # not os.environ: the container's sitecustomize imports jax before this
    # module runs, so env vars set here are never read.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from humanrf_tpu.core.camera import CameraData
    from humanrf_tpu.core.synthetic import _look_at_cam2world
    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
    from humanrf_tpu.train.pipeline import HostBatch, PipelineConfig, PoolArrays, make_train_step
    from humanrf_tpu.train.trainer import make_optimizer

    # "fused" (default): the gather-free interpolating-matmul field through
    # the VMEM-resident Pallas kernel — the TPU-native flagship (PERF.md).
    # "onehot": same math, XLA-materialized rows. "gather": exact
    # tcnn-semantics lookups.
    backend = os.environ.get("BENCH_BACKEND", "fused")
    # onehot/fused pair with small per-level tables (2^12 → 2^11 after the
    # 50-frame segment scaling); gather keeps the reference's 2^19 → 2^18.
    log2_hashmap = 12 if backend in ("onehot", "fused") else 19
    # "proposal" (default): CP proposal field + importance resampling — the
    # TPU-native sampling flagship (every valid ray supervised, static (R, K)
    # lattice). "dense": the reference's 4e-4 march + budget compaction.
    sampling = os.environ.get("BENCH_SAMPLING", "proposal")
    num_rays = int(os.environ.get("BENCH_RAYS", "16384" if sampling == "proposal" else "8192"))

    num_frames = 50
    # BENCH_SEGMENTS=k splits the sequence into k equal temporal segments
    # (e.g. 2 → [25, 25], the 748² schedule-run shape) to measure the
    # multi-segment routing cost and the lax.cond segment skip
    # (models/humanrf.py::features). Default: the single-segment flagship.
    n_segments = int(os.environ.get("BENCH_SEGMENTS", "1"))
    assert num_frames % n_segments == 0
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=tuple(range(num_frames)),
            segment_sizes=(num_frames // n_segments,) * n_segments,
            log2_hashmap_size=int(os.environ.get("BENCH_LOG2_T", str(log2_hashmap))),
            # L8/F4: same 32 feature channels as the reference's L16/F2 but half
            # the one-hot construction passes — quality-equal-or-better on the
            # high-detail synthetic sweep (PERF.md quality table).
            n_levels=int(os.environ.get("BENCH_LEVELS", "8")),
            n_features_per_level=int(os.environ.get("BENCH_FEATURES", "4")),
            coarsest_resolution=32,
            finest_resolution=2048,
            camera_embedding_dim=2,
            field_backend=backend,
            proposal_rank=int(os.environ.get("BENCH_RANK", "32")) if sampling == "proposal" else 0,
            proposal_resolution=128,
        )
    )
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = model.num_params(params)

    if backend == "fused" and os.environ.get("BENCH_SKIP_KERNEL_GATE", "0") != "1":
        # On-device correctness gate: the COMPILED Mosaic kernel (both
        # variants, both passes) must match the jnp oracle before anything is
        # timed — interpreter-mode tests can't catch a Mosaic miscompile.
        # Shapes are derived from the ACTUAL benched model (a miscompile can
        # be shape-specific), for both kernel callsites: the 8-corner grid
        # interp at (4L, F, T) and the 2-corner vector interp at (4, L·F, R)
        # (models/fused_field.py::apply_decomposition4d_fused).
        from humanrf_tpu.ops.fused_interp import verify_on_device

        seg0 = params["segments"][0]
        L_t, F_t, T_t = seg0["xyz"].shape
        P_v, F_v, R_v = seg0["vectors"].shape
        tile = model.segment_grid_configs[0].fused_tile_n
        t0 = time.time()
        errs = verify_on_device(P=4 * L_t, F=F_t, T=T_t, C=8, tile_n=tile)
        errs_v = verify_on_device(P=P_v, F=F_v, T=R_v, C=2, tile_n=tile)
        print(
            f"# kernel gate PASS ({time.time()-t0:.1f}s) "
            f"grids(P={4*L_t},F={F_t},T={T_t}) "
            + " ".join(f"{v}:fwd={e['fwd']:.1e},bwd={e['bwd']:.1e}" for v, e in errs.items())
            + f" vectors(P={P_v},F={F_v},T={R_v}) "
            + " ".join(f"{v}:fwd={e['fwd']:.1e},bwd={e['bwd']:.1e}" for v, e in errs_v.items()),
            file=sys.stderr,
        )

    if sampling == "proposal":
        # Importance sampling: 32 coarse proposal bins (cheap CP field) → 16
        # field samples/ray; supervised rays == valid rays, no budget
        # truncation (ops/resample.py).
        cfg = PipelineConfig(
            num_rays=num_rays,
            sampling="proposal",
            proposal_samples_per_ray=int(os.environ.get("BENCH_KC", "32")),
            render_samples_per_ray=int(os.environ.get("BENCH_KF", "16")),
            proposal_mid_samples_per_ray=int(os.environ.get("BENCH_KM", "0")),
            space_pruning="occupancy",
            march_grid_factor=int(os.environ.get("BENCH_MARCH", "2")),
            # Ship 2× candidate pixels; compact hull-hitters into the render
            # slots (the reference's ray compaction, static-shape form).
            candidate_rays_factor=int(os.environ.get("BENCH_CAND_FACTOR", "2")),
        )
    else:
        # One-pass dense configuration: on TPU the gather-bound cost of the
        # no-grad visibility-prune pass (an extra density eval over 2× the
        # budget) exceeds what it saves in the differentiable pass, so the
        # budget-sized candidate set is rendered directly (the reference's
        # prune exists to cut CUDA MLP work, volume_rendering.py:42-84).
        cfg = PipelineConfig(
            num_rays=num_rays,
            samples_per_ray=1024,
            candidate_budget=640_000,
            sample_budget=640_000,
            space_pruning="occupancy",
            use_visibility_prune=False,
        )

    # Camera pool: 8 entries around a human-sized occupied region. Cameras are
    # close enough that the "actor" fills a large part of the frame (as in the
    # ActorsHQ center-square crops), so the sample budget actually fills like a
    # real training batch.
    width = height = 748  # ≈ ActorsHQ 4x landscape pixel count scale
    num_pool = 8
    krs, origins = [], []
    for i in range(num_pool):
        ang = 2 * np.pi * i / num_pool
        eye = np.array([1.1 * np.cos(ang), 1.1 * np.sin(ang), 0.2 * np.sin(2 * ang)])
        cam = CameraData(
            name=f"c{i}",
            width=width,
            height=height,
            rotation_axisangle=Rotation.from_matrix(_look_at_cam2world(eye, np.zeros(3))).as_rotvec(),
            translation=eye,
            focal_length=np.array([1.2, 1.2]),
            principal_point=np.array([0.5, 0.5]),
        )
        krs.append(cam.inverse_kr().astype(np.float32))
        origins.append(eye.astype(np.float32))

    # Pool frames: "window" (default) keeps all pool entries inside the first
    # temporal segment — the loader's frame-window behavior, where the
    # lax.cond skips every other segment's field. "mixed" alternates segments
    # so every batch runs all of them (the pre-skip worst case, for A/B).
    if os.environ.get("BENCH_FRAME_SPREAD", "window") == "mixed" and n_segments > 1:
        seg_len = num_frames // n_segments
        pool_frames = (np.arange(num_pool) % n_segments) * seg_len + (np.arange(num_pool) // n_segments) % seg_len
    else:
        pool_frames = np.arange(num_pool) % min(num_frames, num_frames // n_segments)
    pool = PoolArrays(
        inverse_krs=jnp.asarray(np.stack(krs)),
        camera_origins=jnp.asarray(np.stack(origins)),
        landscape=jnp.ones(num_pool, dtype=bool),
        frame_numbers=jnp.asarray(pool_frames, dtype=jnp.int32),
        camera_numbers=jnp.asarray(np.arange(num_pool), dtype=jnp.int32),
        grid_slots=jnp.asarray(np.arange(num_pool) % 2, dtype=jnp.int32),
    )

    # Occupancy: a person-ish capsule (~0.44 wide, 0.9 tall) at grid res 128.
    res = 128
    c = (np.arange(res) + 0.5) / res - 0.5
    gz, gy, gx = np.meshgrid(c, c, c, indexing="ij")  # [z][y][x] storage
    body = (gx**2 + gy**2) < 0.22**2
    body &= np.abs(gz) < 0.45
    grids = jnp.asarray(np.stack([body, body]))
    aabb = jnp.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], dtype=jnp.float32)

    rng = np.random.default_rng(0)
    num_cand = cfg.num_rays * cfg.candidate_rays_factor
    batch = HostBatch(
        buffer_idx=jnp.asarray(rng.integers(0, num_pool, num_cand).astype(np.int32)),
        pixel_idx=jnp.asarray(rng.integers(0, width * height, num_cand).astype(np.int32)),
        rgba=jnp.asarray(rng.uniform(0, 1, (num_cand, 4)).astype(np.float32)),
        ray_light_ok=jnp.ones(num_cand, dtype=bool),
    )

    # weight_decay matches the CLI default (PERF.md round-2b stability A/B).
    optimizer = make_optimizer(1e-2, 0.5, 50_001, weight_decay=0.03)
    opt_state = optimizer.init(params)
    raw_step = make_train_step(cfg, model, optimizer, width, height, jit=False)

    # K training steps per dispatch (lax.scan): the benched quantity is the
    # device's training throughput, not the dispatch path — through the axon
    # relay a per-step Python loop can serialize on tunnel RTT (measured: the
    # identical program swinging 37k -> 17k rays/s purely with relay health).
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    chunk = max(1, n_steps // 2)

    def k_steps(params, opt_state, batch, pool, grids, aabb, rng):
        def body(carry, i):
            p, o, sup = carry
            p, o, loss, aux = raw_step(p, o, batch, pool, grids, aabb, jax.random.fold_in(rng, i))
            return (p, o, sup + aux["num_rays_supervised"]), (loss, aux["num_samples"])

        (params, opt_state, supervised), (losses, n_samples) = jax.lax.scan(
            body, (params, opt_state, jnp.zeros((), jnp.float32)), jnp.arange(chunk)
        )
        return params, opt_state, supervised, losses[-1], n_samples[-1]

    k_steps = jax.jit(k_steps, donate_argnums=(0, 1))

    # Warmup / compile.
    t0 = time.time()
    params, opt_state, supervised, loss, n_samples = k_steps(
        params, opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    print(
        f"# compile(+{chunk} steps) {compile_s:.1f}s params={n_params/1e6:.1f}M "
        f"loss={float(loss):.5f} samples={int(n_samples)} "
        f"rays_supervised={float(supervised)/chunk:.0f}/step device={jax.devices()[0]}",
        file=sys.stderr,
    )

    # Timed: dispatch scan-chunks until >= n_steps accumulate. "supervised" =
    # rays actually contributing to the loss -- the honest apples-to-apples
    # number vs the reference, whose dynamic batching only ever counts rays
    # it supervises (trainer.py:139-163).
    supervised_total = 0.0
    done = 0
    t0 = time.time()
    while done < n_steps:
        params, opt_state, supervised, loss, n_samples = k_steps(
            params, opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(2 + done)
        )
        supervised_total += float(supervised)  # one host sync per chunk
        done += chunk
    elapsed = time.time() - t0
    n_steps = done
    nominal_rays_per_sec = cfg.num_rays * n_steps / elapsed
    supervised_rays_per_sec = supervised_total / elapsed
    samples_per_sec = float(n_samples) * n_steps / elapsed
    print(
        f"# {n_steps} steps in {elapsed:.2f}s → {n_steps/elapsed:.2f} it/s, "
        f"{nominal_rays_per_sec:.0f} nominal rays/s, {supervised_rays_per_sec:.0f} supervised rays/s, "
        f"{samples_per_sec/1e6:.2f}M samples/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "supervised_training_rays_per_sec",
                "value": round(supervised_rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(supervised_rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
                "nominal_rays_per_sec": round(nominal_rays_per_sec, 1),
                "samples_per_sec": round(samples_per_sec, 0),
                "steps_per_sec": round(n_steps / elapsed, 3),
                "params_millions": round(n_params / 1e6, 2),
                "sampling": sampling,
                "backend": backend,
                "segments": n_segments,
            }
        )
    )


if __name__ == "__main__":
    main()
