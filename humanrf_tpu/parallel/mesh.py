"""Data-parallel training over a device mesh (ICI collectives).

The reference is strictly single-GPU (SURVEY.md §2.5: no torch.distributed /
NCCL anywhere); multi-chip data parallelism is a *new first-class component*
of the TPU build, done the XLA way: a 1-D `Mesh(('data',))`, rays (and
therefore samples) sharded on the batch axis, parameters replicated, gradient
`psum` over ICI inserted by the compiler inside `shard_map`.

Each device independently compacts its own R/D rays into S/D sample slots —
budgets are per-shard, so no cross-device communication happens anywhere in
the sampling/rendering path; the ONLY collectives are the loss-normalization
psums and the gradient psum.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.train.pipeline import (
    HostBatch,
    PipelineConfig,
    PoolArrays,
    build_rays,
    build_samples,
    compact_rays,
    training_loss,
)

AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    backend: Optional[str] = None,
    allow_cpu_fallback: bool = False,
) -> Mesh:
    """1-D data mesh over `num_devices` devices of the default (or named)
    backend.

    Under-provisioning is an error: a job configured for N chips must not
    silently train on host CPU cores. The only exception is an *explicit*
    `allow_cpu_fallback=True` (used by hermetic tests/dryruns), which retries
    on the virtual CPU devices configured via
    ``XLA_FLAGS=--xla_force_host_platform_device_count=<n>``.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    if num_devices is not None and len(devices) < num_devices:
        if allow_cpu_fallback and backend is None:
            devices = jax.devices("cpu")
        if len(devices) < num_devices:
            raise RuntimeError(
                f"requested a {num_devices}-device mesh but the "
                f"{backend or 'default'} backend has only {len(devices)} "
                "device(s); refusing to under-provision. For hermetic CPU "
                "testing pass allow_cpu_fallback=True and set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=<n>."
            )
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_pipeline_config(cfg: PipelineConfig, num_devices: int) -> PipelineConfig:
    """Per-shard shapes. Ray count and budgets must divide evenly."""
    assert cfg.num_rays % num_devices == 0, (cfg.num_rays, num_devices)
    assert cfg.candidate_budget % num_devices == 0
    assert cfg.sample_budget % num_devices == 0
    return dataclasses.replace(
        cfg,
        num_rays=cfg.num_rays // num_devices,
        candidate_budget=cfg.candidate_budget // num_devices,
        sample_budget=cfg.sample_budget // num_devices,
    )


def make_sharded_train_step(
    cfg: PipelineConfig,
    model: HumanRFModel,
    optimizer,
    width: int,
    height: int,
    mesh: Mesh,
    k: int = 1,
):
    """Returns train_step(params, opt_state, batch, pool, grids, aabb, rng)
    where `batch` leaves are sharded over rays and everything else replicated.

    ``k > 1`` composes K-steps-per-dispatch with data parallelism: the
    `lax.scan` over K stacked host batches moves INSIDE the shard_map (batch
    leaves gain a leading K axis, still sharded on the ray axis), so a DP run
    through a high-RTT device client is dispatch-rate-independent exactly
    like the single-chip chunked path. Step i uses `fold_in(rng, i)` —
    bit-identical to K sequential dispatches of the k=1 sharded step with
    those keys (tests/test_parallel.py asserts per-leaf equality on the
    8-device CPU mesh). Returns (params, opt_state, losses[K], auxs[K])."""
    num_devices = mesh.devices.size
    shard_cfg = shard_pipeline_config(cfg, num_devices)

    def per_shard(params, opt_state, batch: HostBatch, pool: PoolArrays, grids, aabb, rng):
        # Global ray identities: shard_map splits the batch into contiguous
        # blocks along the mesh axis, so shard i owns rays
        # [i·R_local, (i+1)·R_local). All jitter/background noise is keyed by
        # these ids (utils/rngs.py) — the sharded step therefore computes the
        # SAME per-ray noise, loss, and gradients as the single-device step.
        shard = jax.lax.axis_index(AXIS)
        num_candidates = shard_cfg.num_rays * shard_cfg.candidate_rays_factor
        ray_ids = shard * num_candidates + jnp.arange(num_candidates, dtype=jnp.int32)

        rays = build_rays(shard_cfg, batch, pool, grids, aabb, width, height)
        if shard_cfg.candidate_rays_factor > 1:
            # Each shard compacts its own candidate block into its render
            # slots — per-shard dynamic batching, like the reference's
            # per-process compaction. Noise stays keyed to the global
            # candidate identity, so a ray draws the same jitter on any mesh;
            # WHICH rays fill the slots depends on the per-shard candidate
            # layout (unlike factor=1, which is bit-identical to 1 device).
            rays, batch, ray_ids = compact_rays(rays, batch, ray_ids, shard_cfg.num_rays)
        samples = None
        if shard_cfg.sampling != "proposal":
            samples = build_samples(shard_cfg, rays, pool, grids, batch.buffer_idx)

        def loss_fn(p):
            return training_loss(
                shard_cfg, model, p, rays, samples, batch.rgba, rng, axis_name=AXIS,
                ray_ids=ray_ids, pool=pool, grids=grids, buffer_idx=batch.buffer_idx,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # Loss num/den were already psum-normalized inside; gradients carry
        # each shard's local contribution → sum over the mesh.
        grads = jax.lax.psum(grads, AXIS)
        # Scalar losses are already globally normalized (psum'd num/den inside
        # masked_mean); only the counts need a mesh-wide sum.
        aux = dict(aux)
        aux["num_samples"] = jax.lax.psum(aux["num_samples"], AXIS)
        aux["num_rays_supervised"] = jax.lax.psum(aux["num_rays_supervised"], AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, aux

    pool_specs = PoolArrays(*([P()] * len(PoolArrays._fields)))

    if k == 1:
        batch_specs = HostBatch(
            buffer_idx=P(AXIS), pixel_idx=P(AXIS), rgba=P(AXIS), ray_light_ok=P(AXIS)
        )
        sharded = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs, pool_specs, P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    def per_shard_chunk(params, opt_state, batches: HostBatch, pool, grids, aabb, rng):
        def body(carry, xs):
            p, o = carry
            b, i = xs
            p, o, loss, aux = per_shard(p, o, b, pool, grids, aabb, jax.random.fold_in(rng, i))
            return (p, o), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), (batches, jnp.arange(k, dtype=jnp.uint32))
        )
        return params, opt_state, losses, auxs

    chunk_batch_specs = HostBatch(
        buffer_idx=P(None, AXIS), pixel_idx=P(None, AXIS),
        rgba=P(None, AXIS), ray_light_ok=P(None, AXIS),
    )
    sharded = jax.shard_map(
        per_shard_chunk,
        mesh=mesh,
        in_specs=(P(), P(), chunk_batch_specs, pool_specs, P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
