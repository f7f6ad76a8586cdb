"""The jitted device pipeline: pixels → rays → samples → prune → render → loss.

This is the TPU-native fusion of three reference layers into ONE XLA program
per training step:
- the CUDA ray sampler the data loader calls (`ray_sampler.cu:197-325`),
- `prune_samples`/`render` (`humanrf/volume_rendering.py:42-150`),
- `Trainer.train_step` loss + backward (`humanrf/trainer.py:229-255`).

The host only ships pixel ids, pooled rgba, and per-pool-entry camera
metadata; everything else (ray math, occupancy march, compaction,
rendering, gradients, optimizer update) happens on device, inside jit.

Static-shape recast of the reference's dynamic-batch loop
(`trainer.py:139-163`): the ray count R and the two sample budgets are
compile-time constants; the sample *budget* plays the role of
`samples_max_batch_size`, and rays whose samples did not fit are excluded from
the loss exactly like the reference's merge-truncation at a ray boundary
(`humanrf/input.py:33-47`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.ops.occupancy import coarsen_grid, occupancy_ray_minmax
from humanrf_tpu.ops.rays import aabb_intersect, pixel_to_ray
from humanrf_tpu.ops.render import RenderOutput, prune_samples, render
from humanrf_tpu.ops.sampling import SampleSet, generate_samples
from humanrf_tpu.train.losses import bce_loss, huber_loss, masked_mean


@dataclass(frozen=True)
class PipelineConfig:
    num_rays: int = 8192
    # Static per-ray candidate lattice length; ceil(max_span / step). The
    # occupancy-pruned span of a human rarely exceeds ~0.35 canonical units.
    samples_per_ray: int = 1024
    # Sample slots after occupancy compaction (feeds the no-grad prune pass).
    candidate_budget: int = 1 << 20
    # Sample slots after visibility pruning (feeds the differentiable render);
    # the analog of training.samples_max_batch_size (run_args.py:28-29).
    sample_budget: int = 640_000
    render_step_size: float = 4e-4
    space_pruning: str = "occupancy"  # "occupancy" | "aabb"
    use_visibility_prune: bool = True
    bce_loss_weight: Optional[float] = 1e-3
    huber_delta: float = 0.01
    # tmin/tmax march on a conservatively max-pooled grid (factor× coarser).
    # Gathers on TPU cost per element, so marching a 64³ grid instead of 128³
    # halves the march cost; the per-sample occupancy filter stays full-res,
    # so results only gain a few extra (filtered) candidates.
    march_grid_factor: int = 2


class PoolArrays(NamedTuple):
    """Per-pool-entry camera/frame metadata mirroring the reference's
    buffer-side CUDA tensors (`data_loader.py:261-309`)."""

    inverse_krs: jax.Array     # (B, 3, 3) float32
    camera_origins: jax.Array  # (B, 3) float32
    landscape: jax.Array       # (B,) bool
    frame_numbers: jax.Array   # (B,) int32
    camera_numbers: jax.Array  # (B,) int32
    grid_slots: jax.Array      # (B,) int32 — slot into the grids pool


class HostBatch(NamedTuple):
    """What the host ships per step."""

    buffer_idx: jax.Array    # (R,) int32 — pool entry per ray
    pixel_idx: jax.Array     # (R,) int32 — flat pixel within the image
    rgba: jax.Array          # (R, 4) float32 in [0,1] (zeros at TEST time)
    ray_light_ok: jax.Array  # (R,) bool — light-bloom filter (True = keep)


class RayData(NamedTuple):
    origins: jax.Array       # (R, 3)
    directions: jax.Array    # (R, 3)
    tmin: jax.Array          # (R,)
    tmax: jax.Array          # (R,)
    valid: jax.Array         # (R,)
    frame_numbers: jax.Array  # (R,)
    camera_numbers: jax.Array  # (R,)


def build_rays(
    cfg: PipelineConfig,
    batch: HostBatch,
    pool: PoolArrays,
    grids: jax.Array,
    aabb: jax.Array,
    width: int,
    height: int,
) -> RayData:
    """Pixels → rays with occupancy/AABB [tmin, tmax]."""
    image_number = batch.buffer_idx
    is_landscape = jnp.take(pool.landscape, image_number)
    w = jnp.where(is_landscape, width, height)
    h = jnp.where(is_landscape, height, width)
    pixel_x = (batch.pixel_idx % w).astype(jnp.float32) + 0.5
    pixel_y = ((batch.pixel_idx // w) % h).astype(jnp.float32) + 0.5

    origins, dirs = pixel_to_ray(pool.inverse_krs, pool.camera_origins, image_number, pixel_x, pixel_y)
    tmin, tmax = aabb_intersect(origins, dirs, aabb)

    grid_ids = jnp.take(pool.grid_slots, image_number)
    if cfg.space_pruning == "occupancy":
        march_grids = coarsen_grid(grids, cfg.march_grid_factor)
        tmin, tmax = occupancy_ray_minmax(origins, dirs, tmin, tmax, march_grids, grid_ids)

    valid = (tmin < tmax) & batch.ray_light_ok
    return RayData(
        origins=origins,
        directions=dirs,
        tmin=tmin,
        tmax=tmax,
        valid=valid,
        frame_numbers=jnp.take(pool.frame_numbers, image_number),
        camera_numbers=jnp.take(pool.camera_numbers, image_number),
    )


def build_samples(
    cfg: PipelineConfig,
    rays: RayData,
    pool: PoolArrays,
    grids: jax.Array,
    buffer_idx: jax.Array,
) -> SampleSet:
    grid_ids = jnp.take(pool.grid_slots, buffer_idx)
    use_grids = cfg.space_pruning == "occupancy"
    return generate_samples(
        rays.tmin,
        rays.tmax,
        rays.valid,
        rays.origins,
        rays.directions,
        step_size=cfg.render_step_size,
        samples_per_ray=cfg.samples_per_ray,
        budget=cfg.candidate_budget,
        grids=grids if use_grids else None,
        grid_ids=grid_ids if use_grids else None,
    )


def prune_and_render(
    cfg: PipelineConfig,
    model: HumanRFModel,
    params,
    rays: RayData,
    samples: SampleSet,
    background_rgb,
    rng: Optional[jax.Array],
    is_training: bool,
):
    """prune_samples + render (volume_rendering.py:42-150) on the flat buffers."""
    if is_training and rng is not None and not cfg.use_visibility_prune:
        # The reference jitters sample distances inside prune_samples
        # (volume_rendering.py:63-64); keep the jitter when pruning is off.
        samples = samples._replace(
            t=samples.t + jax.random.uniform(rng, samples.t.shape) * cfg.render_step_size
        )
    if cfg.use_visibility_prune:
        density_fn = lambda p, f: model.density(params, p, f)[0]
        samples = prune_samples(
            density_fn,
            samples,
            rays.origins,
            rays.directions,
            rays.frame_numbers,
            cfg.num_rays,
            cfg.sample_budget,
            rng=rng if is_training else None,
            render_step_size=cfg.render_step_size,
        )

    forward_fn = lambda p, d, f, c: model.forward(params, p, d, f, c, is_training=is_training)
    out = render(
        forward_fn,
        samples,
        rays.origins,
        rays.directions,
        rays.frame_numbers,
        rays.camera_numbers,
        cfg.num_rays,
        background_rgb,
        render_step_size=cfg.render_step_size,
    )
    return out, samples


def training_loss(
    cfg: PipelineConfig,
    model: HumanRFModel,
    params,
    rays: RayData,
    samples: SampleSet,
    rgba: jax.Array,
    rng: jax.Array,
    axis_name: str | None = None,
):
    """Random-background compositing + Huber + BCE (trainer.py:229-248)."""
    rng_bg, rng_jitter = jax.random.split(rng)
    gt_rgb = rgba[:, 0:3]
    gt_mask = rgba[:, 3:4]
    background = jax.random.uniform(rng_bg, gt_rgb.shape)
    gt_rgb = gt_rgb * gt_mask + background * (1.0 - gt_mask)

    out, pruned = prune_and_render(
        cfg, model, params, rays, samples, background, rng_jitter, is_training=True
    )

    loss_mask = rays.valid & pruned.ray_included
    photometric = masked_mean(huber_loss(out.color, gt_rgb, cfg.huber_delta), loss_mask, axis_name)
    total = photometric
    aux = {"photometric": photometric}
    if cfg.bce_loss_weight is not None:
        mask_l = masked_mean(bce_loss(out.weights_sum, gt_mask), loss_mask, axis_name) * cfg.bce_loss_weight
        total = total + mask_l
        aux["mask_loss"] = mask_l

    mse = masked_mean((out.color - gt_rgb) ** 2, loss_mask, axis_name)
    aux["mse"] = mse
    aux["num_samples"] = pruned.num_valid
    aux["num_rays_supervised"] = loss_mask.sum()
    return total, aux


def make_train_step(cfg: PipelineConfig, model: HumanRFModel, optimizer, width: int, height: int):
    """Returns train_step(params, opt_state, batch, pool, grids, aabb, rng)."""

    def step(params, opt_state, batch: HostBatch, pool: PoolArrays, grids, aabb, rng):
        rays = build_rays(cfg, batch, pool, grids, aabb, width, height)
        samples = build_samples(cfg, rays, pool, grids, batch.buffer_idx)

        def loss_fn(p):
            return training_loss(cfg, model, p, rays, samples, batch.rgba, rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, aux

    return jax.jit(step, donate_argnums=(0, 1))


def make_render_fn(cfg: PipelineConfig, model: HumanRFModel, width: int, height: int):
    """Returns render_rays(params, batch, pool, grids, aabb, background) →
    (RenderOutput, ray_valid) for validation/test image assembly."""

    def fn(params, batch: HostBatch, pool: PoolArrays, grids, aabb, background_rgb):
        rays = build_rays(cfg, batch, pool, grids, aabb, width, height)
        samples = build_samples(cfg, rays, pool, grids, batch.buffer_idx)
        out, _ = prune_and_render(cfg, model, params, rays, samples, background_rgb, None, is_training=False)
        color = jnp.where(rays.valid[:, None], out.color, background_rgb)
        wsum = jnp.where(rays.valid[:, None], out.weights_sum, 0.0)
        return RenderOutput(color=color, weights_sum=wsum), rays.valid

    return jax.jit(fn)
