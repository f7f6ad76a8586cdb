"""Volume rendering over flat compacted samples — the nerfacc replacement.

Re-implements the semantics of nerfacc 0.3.1's `render_visibility`,
`render_weight_from_density` and `accumulate_along_rays` used by the reference
(`/root/reference/humanrf/volume_rendering.py:75-81,123-141`), but over the
static-shape flat sample buffer of ops/sampling.py instead of ragged CSR
tensors.

The ragged per-ray transmittance scan becomes a **segmented scan** over the
flat buffer: samples are stored ray-major, so ray boundaries are where the
owning-ray id changes, and `jax.lax.associative_scan` with the standard
segmented-sum combiner gives every ray its own cumulative sum in O(log S)
vectorized passes — no custom kernel, and (unlike a global cumsum + per-ray
offset subtraction) no fp32 catastrophic cancellation across the ~640k-sample
buffer.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humanrf_tpu.ops.sampling import SampleSet, compact_flat_samples


def segmented_cumsum(values: jax.Array, segment_ids: jax.Array) -> jax.Array:
    """Inclusive cumsum that restarts wherever `segment_ids` changes.

    Standard segmented-scan combiner over (sum, start_flag) pairs; O(log S)
    vectorized passes via associative_scan.
    """
    flags = jnp.concatenate([jnp.ones((1,), dtype=bool), segment_ids[1:] != segment_ids[:-1]])

    def combine(a, b):
        s_a, f_a = a
        s_b, f_b = b
        return jnp.where(f_b, s_b, s_a + s_b), f_a | f_b

    s, _ = jax.lax.associative_scan(combine, (values, flags))
    return s


def _per_ray_exclusive_cumsum(values: jax.Array, sample_ray: jax.Array, num_rays: int) -> jax.Array:
    """Exclusive within-ray cumsum of per-sample `values` (invalid slots must be 0)."""
    del num_rays
    return segmented_cumsum(values, sample_ray) - values


def render_weights_from_density(
    density: jax.Array,
    samples: SampleSet,
    num_rays: int,
    render_step_size: float,
) -> jax.Array:
    """nerfacc.render_weight_from_density semantics with t_end − t_start ==
    render_step_size (volume_rendering.py:123-129):

        alpha_i = 1 − exp(−σ_i·Δt),  T_i = exp(−Σ_{j<i} σ_j·Δt),  w_i = T_i·α_i
    """
    sigma_dt = jnp.where(samples.valid, density * render_step_size, 0.0)
    excl = _per_ray_exclusive_cumsum(sigma_dt, samples.ray, num_rays)
    transmittance = jnp.exp(-excl)
    alpha = 1.0 - jnp.exp(-sigma_dt)
    return jnp.where(samples.valid, transmittance * alpha, 0.0)


def accumulate_along_rays(
    weights: jax.Array,
    sample_ray: jax.Array,
    num_rays: int,
    values: jax.Array | None = None,
) -> jax.Array:
    """nerfacc.accumulate_along_rays: per-ray segment sum of weights·values
    (volume_rendering.py:130-141). Returns (num_rays, D) (or (num_rays, 1))."""
    if values is None:
        src = weights[:, None]
    else:
        src = weights[:, None] * values
    return jax.ops.segment_sum(src, sample_ray, num_segments=num_rays)


def render_visibility(
    alphas: jax.Array,
    samples: SampleSet,
    num_rays: int,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 1e-4,
) -> jax.Array:
    """nerfacc.render_visibility semantics (volume_rendering.py:75-81):
    a sample is visible iff its alpha ≥ alpha_thre AND the transmittance
    accumulated over *previously kept* samples is > early_stop_eps."""
    keep = samples.valid & (alphas >= alpha_thre)
    # log T over kept samples only.
    neg_log = jnp.where(keep, -jnp.log1p(-jnp.clip(alphas, 0.0, 1.0 - 1e-7)), 0.0)
    excl = _per_ray_exclusive_cumsum(neg_log, samples.ray, num_rays)
    transmittance = jnp.exp(-excl)
    return keep & (transmittance > early_stop_eps)


class RenderOutput(NamedTuple):
    """Per-ray composited outputs (`humanrf/volume_rendering.py:14-24`)."""

    color: jax.Array        # (R, 3)
    weights_sum: jax.Array  # (R, 1)


# ---------------------------------------------------------------------------
# Grid-layout rendering: samples in a static (R, K) lattice (proposal mode).
# With a fixed per-ray sample count the "segmented" scan degenerates to a
# plain per-row cumsum and accumulation to a batched contraction — the
# cheapest possible form on TPU.
# ---------------------------------------------------------------------------


def render_weights_grid(
    density: jax.Array, dt: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """(R, K) density + per-sample interval lengths → compositing weights.

        alpha_i = 1 − exp(−σ_i·Δt_i),  T_i = exp(−Σ_{j<i} σ_j·Δt_j),  w = T·α
    """
    sigma_dt = density * dt
    if mask is not None:
        sigma_dt = jnp.where(mask, sigma_dt, 0.0)
    excl = jnp.cumsum(sigma_dt, axis=-1) - sigma_dt
    weights = jnp.exp(-excl) * (1.0 - jnp.exp(-sigma_dt))
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    return weights


def composite_grid(weights: jax.Array, radiance: jax.Array, background_rgb) -> RenderOutput:
    """weights (R, K), radiance (R, K, 3) → per-ray color + accumulated alpha."""
    color = jnp.einsum("rk,rkc->rc", weights, radiance)
    weights_sum = weights.sum(axis=-1, keepdims=True)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)
    return RenderOutput(color=color, weights_sum=weights_sum)


def prune_samples(
    density_fn,
    samples: SampleSet,
    origins: jax.Array,
    dirs: jax.Array,
    frame_numbers: jax.Array,
    num_rays: int,
    budget: int,
    rng: jax.Array | None = None,
    render_step_size: float = 4e-4,
) -> SampleSet:
    """The reference's `prune_samples` (`volume_rendering.py:42-84`): jitter
    sample distances when training (rng given), query density only, cull
    invisible samples, compact.

    `density_fn(positions, frame_numbers) -> density` — called without gradient
    tracking by the caller (wrap in stop_gradient upstream).
    """
    t = samples.t
    if rng is not None:
        t = t + jax.random.uniform(rng, t.shape) * render_step_size
        samples = samples._replace(t=t)

    ray_idx = jnp.clip(samples.ray, 0, num_rays - 1)
    positions = jnp.take(origins, ray_idx, axis=0) + t[:, None] * jnp.take(dirs, ray_idx, axis=0)
    density = density_fn(positions, jnp.take(frame_numbers, ray_idx))
    density = jax.lax.stop_gradient(density)

    alphas = 1.0 - jnp.exp(-density * render_step_size)
    visible = render_visibility(alphas, samples, num_rays)
    return compact_flat_samples(samples, visible, budget)


def render(
    forward_fn,
    samples: SampleSet,
    origins: jax.Array,
    dirs: jax.Array,
    frame_numbers: jax.Array,
    camera_numbers: jax.Array,
    num_rays: int,
    background_rgb,
    render_step_size: float = 4e-4,
) -> RenderOutput:
    """The reference's `render` (`volume_rendering.py:87-150`).

    `forward_fn(positions, directions, frame_numbers, camera_numbers)
    -> (density, radiance)`.
    `background_rgb`: scalar or (R, 3); blended via (1 − weights_sum).
    """
    ray_idx = jnp.clip(samples.ray, 0, num_rays - 1)
    sample_dirs = jnp.take(dirs, ray_idx, axis=0)
    positions = jnp.take(origins, ray_idx, axis=0) + samples.t[:, None] * sample_dirs

    density, radiance = forward_fn(
        positions,
        sample_dirs,
        jnp.take(frame_numbers, ray_idx),
        jnp.take(camera_numbers, ray_idx),
    )

    weights = render_weights_from_density(density, samples, num_rays, render_step_size)
    color = accumulate_along_rays(weights, samples.ray, num_rays, values=radiance)
    weights_sum = accumulate_along_rays(weights, samples.ray, num_rays, values=None)

    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    return RenderOutput(color=color, weights_sum=weights_sum)
