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
from humanrf_tpu.ops.occupancy import coarsen_grid, occupancy_ray_minmax, sample_occupancy
from humanrf_tpu.ops.rays import aabb_intersect, pixel_to_ray
from humanrf_tpu.ops.render import (
    RenderOutput,
    composite_grid,
    prune_samples,
    render,
    render_weights_grid,
)
from humanrf_tpu.ops.resample import (
    proposal_distillation_per_ray,
    sample_intervals,
    stratified_bins,
    weights_to_cdf,
)
from humanrf_tpu.ops.sampling import SampleSet, generate_samples
from humanrf_tpu.train.losses import bce_loss, huber_loss, masked_mean
from humanrf_tpu.utils.rngs import uniform_per_id


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
    # --- sampling strategy ---------------------------------------------------
    # "dense": the reference pipeline — 4e-4 candidate lattice, occupancy
    # filter, optional visibility prune, flat compacted sample buffer.
    # "proposal": TPU-native importance sampling — a cheap CP proposal field
    # (model.proposal_rank > 0 required) shapes a per-ray PDF; rendering uses
    # a static (R, K_f) sample lattice; every valid ray is supervised
    # (ops/resample.py). The candidate/sample budgets are ignored.
    sampling: str = "dense"
    proposal_samples_per_ray: int = 64
    render_samples_per_ray: int = 32
    # Second proposal level (0 = single-level): after the coarse CDF draw,
    # re-evaluate the (cheap) proposal field on this many refined intervals
    # and draw the render samples from THAT histogram instead. Concentrates
    # the expensive field samples ~2× tighter, enabling small
    # render_samples_per_ray (mip-NeRF 360's proposal cascade, §3.3 — the
    # reference has no analog; its prune pass re-evaluates the full field).
    proposal_mid_samples_per_ray: int = 0
    proposal_loss_weight: float = 1.0
    # Exploration floor of the resampling CDF: fraction of fine samples drawn
    # ~uniformly regardless of the proposal's opinion. The escape hatch from
    # the saturated-proposal deadlock (a wrongly-opaque proposal sends no
    # samples past its phantom surface, so no evidence against it is ever
    # gathered; observed as rising train loss + collapsing val PSNR).
    proposal_uniform_bonus: float = 5e-2
    # Static candidate-ray compaction: the host ships `factor × num_rays`
    # candidate pixels; after the (cheap) occupancy march, hull-hitting rays
    # are compacted into the `num_rays` render slots. The static-shape analog
    # of the reference's ray-mask compaction (`ray_sampler.cu:258-260`) —
    # without it, ~half the field compute is spent on rays that miss the
    # occupancy hull and contribute nothing to the loss. Training-only;
    # validation/test render every pixel.
    candidate_rays_factor: int = 1
    # Zero the proposal density outside the occupancy hull (instant
    # concentration, same role as the reference's per-sample occupancy filter).
    proposal_use_occupancy: bool = True


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


def compact_rays(rays: RayData, batch: HostBatch, ray_ids: jax.Array, num_out: int):
    """Compact hull-hitting candidate rays into `num_out` static slots.

    Valid rays first, original order preserved (stable sort), so as long as at
    least `num_out` candidates hit the hull every render slot is supervised.
    `ray_ids` (global candidate identities) travel with their rays, so all
    identity-keyed noise (utils/rngs.py) is invariant to the compaction — a
    ray draws the same jitter whether or not compaction moved it.
    """
    order = jnp.argsort(jnp.where(rays.valid, 0, 1).astype(jnp.int32), stable=True)[:num_out]
    take = lambda x: jnp.take(x, order, axis=0)
    rays = RayData(*(take(f) for f in rays))
    batch = HostBatch(*(take(f) for f in batch))
    return rays, batch, take(ray_ids)


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
    ray_ids: Optional[jax.Array] = None,
):
    """prune_samples + render (volume_rendering.py:42-150) on the flat buffers.

    `ray_ids`: global ray identities for shard-invariant jitter (defaults to
    arange — correct on a single device / unsharded step).
    """
    if is_training and rng is not None:
        # The reference jitters every sample distance by U[0, step) inside
        # prune_samples (volume_rendering.py:63-64). Keyed here by
        # (global ray id, lattice slot) instead of buffer slot so the noise —
        # and therefore the gradients — are identical under any data sharding.
        if ray_ids is None:
            ray_ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
        ray_idx = jnp.clip(samples.ray, 0, cfg.num_rays - 1)
        lattice = jnp.round(
            (samples.t - jnp.take(rays.tmin, ray_idx)) / cfg.render_step_size
        ).astype(jnp.int32)
        sample_ids = jnp.take(ray_ids, ray_idx) * cfg.samples_per_ray + lattice
        u = uniform_per_id(rng, sample_ids)
        samples = samples._replace(t=samples.t + u * cfg.render_step_size)
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
            rng=None,  # jitter already applied above, shard-invariantly
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


def proposal_render(
    cfg: PipelineConfig,
    model: HumanRFModel,
    params,
    rays: RayData,
    pool: PoolArrays,
    grids: jax.Array,
    buffer_idx: jax.Array,
    rng: Optional[jax.Array],
    is_training: bool,
    background_rgb,
    ray_ids: Optional[jax.Array] = None,
):
    """Importance-sampled rendering over a static (R, K) lattice.

    1. coarse stratified bins over [tmin, tmax] → proposal density (cheap CP
       field) → coarse compositing weights;
    2. inverse-CDF draw of `render_samples_per_ray` intervals (midpoint +
       per-sample dt);
    3. one differentiable field evaluation on the (R, K_f) lattice, plain
       per-row cumsum rendering.

    Returns (RenderOutput, aux) where aux carries the distillation loss term
    and sample statistics. All noise is keyed by global ray identity
    (utils/rngs.py) so DP sharding reproduces the unsharded step.
    """
    num_rays = cfg.num_rays
    k_coarse = cfg.proposal_samples_per_ray
    k_mid = cfg.proposal_mid_samples_per_ray
    k_fine = cfg.render_samples_per_ray
    if ray_ids is None:
        ray_ids = jnp.arange(num_rays, dtype=jnp.int32)

    u_coarse = u_mid = u_fine = None
    if is_training and rng is not None:
        rng_c, rng_m, rng_f = jax.random.split(rng, 3)
        coarse_ids = ray_ids[:, None] * k_coarse + jnp.arange(k_coarse, dtype=jnp.int32)[None, :]
        u_coarse = uniform_per_id(rng_c, coarse_ids.reshape(-1)).reshape(num_rays, k_coarse)
        if k_mid:
            mid_ids = ray_ids[:, None] * (k_mid + 1) + jnp.arange(k_mid + 1, dtype=jnp.int32)[None, :]
            u_mid = uniform_per_id(rng_m, mid_ids.reshape(-1)).reshape(num_rays, k_mid + 1)
        fine_ids = ray_ids[:, None] * (k_fine + 1) + jnp.arange(k_fine + 1, dtype=jnp.int32)[None, :]
        u_fine = uniform_per_id(rng_f, fine_ids.reshape(-1)).reshape(num_rays, k_fine + 1)

    use_occ = cfg.proposal_use_occupancy and cfg.space_pruning == "occupancy"
    grid_ids = jnp.take(pool.grid_slots, buffer_idx) if use_occ else None

    def proposal_weights(t, dt):
        """Evaluate the cheap proposal field on a (R, K) lattice → weights."""
        k = t.shape[1]
        pts = rays.origins[:, None, :] + rays.directions[:, None, :] * t[..., None]
        sigma = model.proposal_density(
            params, pts.reshape(-1, 3), jnp.repeat(rays.frame_numbers, k)
        ).reshape(num_rays, k)
        mask = jnp.broadcast_to(rays.valid[:, None], (num_rays, k))
        if use_occ:
            mask = mask & sample_occupancy(grids, grid_ids[:, None], pts + 0.5)
        return render_weights_grid(sigma, dt, mask)

    # --- coarse pass (no gradient into sample positions) ----------------------
    t_c, dt_c, edges_c = stratified_bins(rays.tmin, rays.tmax, k_coarse, u_coarse)
    w_prop = proposal_weights(t_c, dt_c)

    # Resampling uses the proposal PDF but must not backprop through it
    # (gradients reach the proposal only via the distillation loss).
    cdf = weights_to_cdf(jax.lax.stop_gradient(w_prop), cfg.proposal_uniform_bonus)
    levels = [(edges_c, w_prop)]
    if k_mid:
        # Second proposal level: refine the coarse draw with another (cheap)
        # proposal evaluation before spending expensive field samples.
        t_m, dt_m, edges_m = sample_intervals(edges_c, cdf, k_mid, u_mid, return_edges=True)
        w_mid = proposal_weights(t_m, dt_m)
        cdf = weights_to_cdf(jax.lax.stop_gradient(w_mid), cfg.proposal_uniform_bonus)
        edges_c = edges_m
        levels.append((edges_m, w_mid))
    t_f, dt_f = sample_intervals(edges_c, cdf, k_fine, u_fine)

    # --- fine (render) pass ----------------------------------------------------
    pts_f = rays.origins[:, None, :] + rays.directions[:, None, :] * t_f[..., None]
    density, radiance = model.forward(
        params,
        pts_f.reshape(-1, 3),
        jnp.repeat(rays.directions, k_fine, axis=0),
        jnp.repeat(rays.frame_numbers, k_fine),
        jnp.repeat(rays.camera_numbers, k_fine),
        is_training=is_training,
    )
    density = density.reshape(num_rays, k_fine)
    radiance = radiance.reshape(num_rays, k_fine, 3)
    fine_mask = jnp.broadcast_to(rays.valid[:, None], (num_rays, k_fine))
    w_fine = render_weights_grid(density, dt_f, fine_mask)
    out = composite_grid(w_fine, radiance, background_rgb)

    prop_loss = 0.0
    for lvl_edges, lvl_weights in levels:
        prop_loss = prop_loss + proposal_distillation_per_ray(
            lvl_edges, lvl_weights, t_f - 0.5 * dt_f, t_f + 0.5 * dt_f, w_fine,
        )
    aux = {
        "num_samples": fine_mask.sum(),
        "proposal_loss_per_ray": prop_loss,
    }
    return out, aux


def training_loss(
    cfg: PipelineConfig,
    model: HumanRFModel,
    params,
    rays: RayData,
    samples: Optional[SampleSet],
    rgba: jax.Array,
    rng: jax.Array,
    axis_name: str | None = None,
    ray_ids: Optional[jax.Array] = None,
    pool: Optional[PoolArrays] = None,
    grids: Optional[jax.Array] = None,
    buffer_idx: Optional[jax.Array] = None,
):
    """Random-background compositing + Huber + BCE (trainer.py:229-248).

    All noise is keyed by global ray identity (utils/rngs.py) so the sharded
    step reproduces the single-device step bit-for-bit up to fp reassociation.
    """
    if ray_ids is None:
        ray_ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    rng_bg, rng_jitter = jax.random.split(rng)
    gt_rgb = rgba[:, 0:3]
    gt_mask = rgba[:, 3:4]
    background = uniform_per_id(rng_bg, ray_ids, num=3)
    gt_rgb = gt_rgb * gt_mask + background * (1.0 - gt_mask)

    proposal_aux = {}
    if cfg.sampling == "proposal":
        out, proposal_aux = proposal_render(
            cfg, model, params, rays, pool, grids, buffer_idx, rng_jitter,
            is_training=True, background_rgb=background, ray_ids=ray_ids,
        )
        loss_mask = rays.valid
        num_samples = proposal_aux["num_samples"]
    else:
        out, pruned = prune_and_render(
            cfg, model, params, rays, samples, background, rng_jitter, is_training=True, ray_ids=ray_ids
        )
        loss_mask = rays.valid & pruned.ray_included
        num_samples = pruned.num_valid

    photometric = masked_mean(huber_loss(out.color, gt_rgb, cfg.huber_delta), loss_mask, axis_name)
    total = photometric
    aux = {"photometric": photometric}
    if cfg.bce_loss_weight is not None:
        mask_l = masked_mean(bce_loss(out.weights_sum, gt_mask), loss_mask, axis_name) * cfg.bce_loss_weight
        total = total + mask_l
        aux["mask_loss"] = mask_l
    if cfg.sampling == "proposal":
        prop_l = masked_mean(
            proposal_aux["proposal_loss_per_ray"][:, None], loss_mask, axis_name
        )
        total = total + cfg.proposal_loss_weight * prop_l
        aux["proposal_loss"] = prop_l

    mse = masked_mean((out.color - gt_rgb) ** 2, loss_mask, axis_name)
    aux["mse"] = mse
    aux["num_samples"] = num_samples
    aux["num_rays_supervised"] = loss_mask.sum()
    return total, aux


def make_train_step(
    cfg: PipelineConfig, model: HumanRFModel, optimizer, width: int, height: int, jit: bool = True
):
    """Returns train_step(params, opt_state, batch, pool, grids, aabb, rng).

    `batch` leaves carry ``num_rays × candidate_rays_factor`` candidate rays;
    after the occupancy march the valid ones are compacted into the `num_rays`
    render slots (see `compact_rays`).

    ``jit=False`` returns the raw traced function — for embedding the step in
    a larger program (e.g. a `lax.scan` over steps, bench.py)."""

    def step(params, opt_state, batch: HostBatch, pool: PoolArrays, grids, aabb, rng):
        rays = build_rays(cfg, batch, pool, grids, aabb, width, height)
        ray_ids = None
        if cfg.candidate_rays_factor > 1:
            num_candidates = cfg.num_rays * cfg.candidate_rays_factor
            ray_ids = jnp.arange(num_candidates, dtype=jnp.int32)
            rays, batch, ray_ids = compact_rays(rays, batch, ray_ids, cfg.num_rays)
        samples = None
        if cfg.sampling != "proposal":
            samples = build_samples(cfg, rays, pool, grids, batch.buffer_idx)

        def loss_fn(p):
            return training_loss(
                cfg, model, p, rays, samples, batch.rgba, rng, ray_ids=ray_ids,
                pool=pool, grids=grids, buffer_idx=batch.buffer_idx,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, aux

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0, 1))


def make_chunked_train_step(
    cfg: PipelineConfig, model: HumanRFModel, optimizer, width: int, height: int, k: int
):
    """K training steps per device dispatch: `lax.scan` over K stacked host
    batches (leading axis K on every HostBatch leaf).

    Through the remote-TPU tunnel a per-step Python dispatch serializes on
    round-trip latency (bench.py measured the identical program swinging
    37k → 17k rays/s purely with relay health); scanning K steps inside one
    program makes the training loop dispatch-rate-independent. pool/grids
    are chunk-constant — the caller fetches the K batches under a paused
    replacer so all K share one consistent pool snapshot (data/loader.py's
    per-batch snapshot invariant, held for the chunk).

    Returns chunk(params, opt_state, batches, pool, grids, aabb, rng) →
    (params, opt_state, losses[K], auxs[K-stacked scalars]); step i uses
    `fold_in(rng, i)`, identical to running the raw step K times with those
    keys (tests/test_chunked_step.py asserts per-leaf parameter equality).
    """
    raw_step = make_train_step(cfg, model, optimizer, width, height, jit=False)

    def chunk(params, opt_state, batches: HostBatch, pool: PoolArrays, grids, aabb, rng):
        def body(carry, xs):
            p, o = carry
            b, i = xs
            p, o, loss, aux = raw_step(p, o, b, pool, grids, aabb, jax.random.fold_in(rng, i))
            return (p, o), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), (batches, jnp.arange(k, dtype=jnp.uint32))
        )
        return params, opt_state, losses, auxs

    return jax.jit(chunk, donate_argnums=(0, 1))


def make_render_fn(cfg: PipelineConfig, model: HumanRFModel, width: int, height: int):
    """Returns render_rays(params, batch, pool, grids, aabb, background) →
    (RenderOutput, ray_valid) for validation/test image assembly."""

    def fn(params, batch: HostBatch, pool: PoolArrays, grids, aabb, background_rgb):
        rays = build_rays(cfg, batch, pool, grids, aabb, width, height)
        if cfg.sampling == "proposal":
            out, _ = proposal_render(
                cfg, model, params, rays, pool, grids, batch.buffer_idx,
                rng=None, is_training=False, background_rgb=background_rgb,
            )
        else:
            samples = build_samples(cfg, rays, pool, grids, batch.buffer_idx)
            out, _ = prune_and_render(cfg, model, params, rays, samples, background_rgb, None, is_training=False)
        color = jnp.where(rays.valid[:, None], out.color, background_rgb)
        wsum = jnp.where(rays.valid[:, None], out.weights_sum, 0.0)
        return RenderOutput(color=color, weights_sum=wsum), rays.valid

    return jax.jit(fn)
