"""Static-shape sample generation + compaction.

This is the TPU recast of the reference's ragged CSR sample pipeline
(`/root/reference/actorshq/dataset/native/ray_sampler.cu:150-194,283-323` and the
per-sample compaction at `:322-323`): XLA needs static shapes, so instead of a
variable-length sample list we

1. expand each ray into a fixed per-ray candidate lattice ``t = tmin + j*step``
   (j < S_PER_RAY, static),
2. occupancy-test every candidate with one batched gather,
3. **compact** the surviving samples into a flat, static-size sample buffer of
   ``budget`` slots via cumsum + scatter, preserving (ray-major, ascending-t)
   order — the flat layout that makes the transmittance scan a plain cumsum
   (see ops/render.py).

Rays whose samples did not fully fit into the budget are flagged so the loss
can exclude them — the analog of the reference's truncation of the merged
batch at a ray boundary (`humanrf/input.py:33-47`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humanrf_tpu.ops.occupancy import sample_occupancy


class SampleSet(NamedTuple):
    """A flat, static-size set of ray-marching samples (the InputBatch sample
    half; `actorshq/dataset/input_batch.py:35-38`)."""

    t: jax.Array          # (S,) float32 — distance along the owning ray
    ray: jax.Array        # (S,) int32   — owning ray index; == num_rays for empty slots
    valid: jax.Array      # (S,) bool
    ray_included: jax.Array  # (R,) bool — ray's samples fully fit in the budget
    num_valid: jax.Array  # () int32


def generate_samples(
    tmin: jax.Array,
    tmax: jax.Array,
    ray_valid: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    step_size: float,
    samples_per_ray: int,
    budget: int,
    grids: jax.Array | None = None,
    grid_ids: jax.Array | None = None,
) -> SampleSet:
    """Generate per-ray samples and compact them into a (budget,)-slot buffer.

    `grids`/`grid_ids`: when given, per-sample occupancy filtering is applied
    (SpacePruningMode.OCCUPANCY_GRID, ray_sampler.cu:183-189); otherwise only
    the [tmin, tmax] range check applies (SpacePruningMode.AABB).
    """
    num_rays = tmin.shape[0]

    j = jnp.arange(samples_per_ray, dtype=jnp.float32)[None, :]       # (1, S_per_ray)
    t = tmin[:, None] + j * step_size                                  # (R, S_per_ray)
    # Same per-ray count as the reference: floor((tmax-tmin)/step) samples
    # (ray_sampler.cu:283-285), i.e. j < count.
    counts = jnp.floor((tmax - tmin) / step_size).astype(jnp.int32)
    counts = jnp.where(ray_valid, jnp.minimum(counts, samples_per_ray), 0)
    in_range = j < counts[:, None].astype(jnp.float32)

    if grids is not None:
        pts = origins[:, None, :] + dirs[:, None, :] * t[..., None] + 0.5
        occ = sample_occupancy(grids, grid_ids[:, None], pts)
        valid = in_range & occ
    else:
        valid = in_range

    return compact_samples(t, valid, budget)


def compact_samples(t: jax.Array, valid: jax.Array, budget: int) -> SampleSet:
    """Compact an (R, S_per_ray) candidate lattice into a flat (budget,) buffer.

    Order is ray-major then ascending t (row-major flatten), so each ray's
    samples stay contiguous and sorted — required by the transmittance scan.
    """
    num_rays, samples_per_ray = t.shape
    flat_t = t.reshape(-1)
    flat_valid = valid.reshape(-1)
    flat_ray = (
        jnp.arange(num_rays, dtype=jnp.int32)[:, None]
        .repeat(samples_per_ray, axis=1)
        .reshape(-1)
    )

    # Exclusive positions of each valid sample in the compacted buffer.
    incl = jnp.cumsum(flat_valid.astype(jnp.int32))
    pos = incl - 1
    keep = flat_valid & (pos < budget)
    target = jnp.where(keep, pos, budget)  # out-of-range → dropped by scatter

    out_t = jnp.zeros((budget,), dtype=flat_t.dtype).at[target].set(flat_t, mode="drop")
    out_ray = jnp.full((budget,), num_rays, dtype=jnp.int32).at[target].set(flat_ray, mode="drop")
    out_valid = jnp.zeros((budget,), dtype=bool).at[target].set(keep, mode="drop")

    # A ray is fully included iff the number of valid samples at (or before)
    # its last candidate slot is within the budget.
    per_ray_end = incl.reshape(num_rays, samples_per_ray)[:, -1]
    ray_included = per_ray_end <= budget

    num_valid = jnp.minimum(incl[-1], budget)
    return SampleSet(t=out_t, ray=out_ray, valid=out_valid, ray_included=ray_included, num_valid=num_valid)


def compact_flat_samples(sample_set: SampleSet, new_valid: jax.Array, budget: int) -> SampleSet:
    """Re-compact an existing flat SampleSet after further pruning (the
    visibility prune of `humanrf/volume_rendering.py:83-84`).

    `new_valid` must be a subset of sample_set.valid. Order is preserved.
    """
    flat_valid = new_valid & sample_set.valid
    incl = jnp.cumsum(flat_valid.astype(jnp.int32))
    pos = incl - 1
    keep = flat_valid & (pos < budget)
    target = jnp.where(keep, pos, budget)

    num_rays = sample_set.ray_included.shape[0]
    out_t = jnp.zeros((budget,), dtype=sample_set.t.dtype).at[target].set(sample_set.t, mode="drop")
    out_ray = (
        jnp.full((budget,), num_rays, dtype=jnp.int32).at[target].set(sample_set.ray, mode="drop")
    )
    out_valid = jnp.zeros((budget,), dtype=bool).at[target].set(keep, mode="drop")

    # Ray inclusion: a previously included ray stays included iff none of its
    # surviving samples fell past the budget. Compute per-ray max position.
    overflowed = flat_valid & (pos >= budget)
    ray_overflow = (
        jnp.zeros_like(sample_set.ray_included)
        .at[sample_set.ray]
        .max(overflowed, mode="drop")
    )
    ray_included = sample_set.ray_included & ~ray_overflow

    num_valid = jnp.minimum(incl[-1], budget)
    return SampleSet(t=out_t, ray=out_ray, valid=out_valid, ray_included=ray_included, num_valid=num_valid)
