"""Occupancy-grid space pruning as XLA ops.

Replaces the reference's CUDA 3D-texture machinery
(`/root/reference/actorshq/dataset/native/occupancy_grid.cu:8-95`) and the
occupancy-guided ray march (`ray_sampler.cu:28-78`).

TPU-first recast:
- The CUDA path does *trilinear* texture fetches and tests ``value > 0``.
  Trilinear(p) > 0 ⟺ any of the 8 voxels surrounding p is occupied (all
  corner weights are > 0 except on measure-zero planes). So we precompute a
  **corner-dilated** grid once per upload (a 2×2×2 forward max), after which
  every march step is a *single nearest-neighbor gather* instead of 8.
- The CUDA sequential while-loop march becomes one *vectorized* march: all K
  candidate positions per ray are occupancy-tested in a single batched gather,
  then tmin/tmax fall out of an argmax — no data-dependent loop, and the 5-step
  bisection refine (`ray_sampler.cu:49-64`) is 5 fully-vectorized rounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def coarsen_grid(grid: jax.Array, factor: int) -> jax.Array:
    """Conservative downsample of (..., res, res, res) bool grids by
    max-pooling: a coarse voxel is occupied iff any covered fine voxel is.
    Used to cheapen the tmin/tmax march (the per-sample filter still uses the
    fine grid); conservative → never skips occupied space."""
    if factor == 1:
        return grid
    res = grid.shape[-1]
    assert res % factor == 0
    lead = grid.shape[:-3]
    r = res // factor
    g = grid.reshape(*lead, r, factor, r, factor, r, factor)
    return g.any(axis=(-5, -3, -1))


def dilate_grid(grid: jax.Array) -> jax.Array:
    """(res, res, res) uint8 {0, 255} → corner-dilated bool grid.

    dilated[i,j,k] = any(grid[i:i+2, j:j+2, k:k+2]) so that a nearest lookup at
    voxel floor(p*res - 0.5) reproduces ``tex3D_trilinear(p) > 0``.
    """
    occ = grid > 0
    for axis in range(3):
        shifted = jnp.concatenate(
            [jax.lax.slice_in_dim(occ, 1, occ.shape[axis], axis=axis),
             jax.lax.slice_in_dim(occ, occ.shape[axis] - 1, occ.shape[axis], axis=axis)],
            axis=axis,
        )
        occ = occ | shifted
    return occ


def sample_occupancy(grids: jax.Array, grid_ids: jax.Array, points: jax.Array) -> jax.Array:
    """Nearest-neighbor lookup of corner-dilated grids.

    grids: (G, res, res, res) bool — pool of dilated occupancy grids, stored
    [z][y][x] like the reference's CUDA-texture upload (the innermost array
    dim is the world x axis; `occupancy_grid_generation.cu:81`,
    `occupancy_grid.cu:64-71`).
    grid_ids: (...,) int32 — grid slot per point.
    points: (..., 3) = (x, y, z) in [0, 1] (the canonical cube shifted by +0.5).
    Returns bool occupancy per point. Clamp addressing like the CUDA texture
    (occupancy_grid.cu:30-32).
    """
    res = grids.shape[-1]
    ijk = jnp.clip(jnp.floor(points * res - 0.5), 0, res - 1).astype(jnp.int32)
    flat_grids = grids.reshape(grids.shape[0], -1)
    # [z][y][x] storage: flat = (z*res + y)*res + x.
    flat_idx = (ijk[..., 2] * res + ijk[..., 1]) * res + ijk[..., 0]
    # Single combined gather over (G * res^3).
    return jnp.take(flat_grids.reshape(-1), grid_ids * (res * res * res) + flat_idx)


def occupancy_ray_minmax(
    origins: jax.Array,
    dirs: jax.Array,
    tmin_aabb: jax.Array,
    tmax_aabb: jax.Array,
    grids: jax.Array,
    grid_ids: jax.Array,
    num_refine_steps: int = 5,
):
    """Occupancy-guided [tmin, tmax] per ray (ray_sampler.cu:28-78 semantics).

    Marches from tmin (forward) and tmax (backward) at step 0.5/res until the
    first occupied voxel, then bisection-refines tmin. All rays march the same
    static number of steps K with masking; K covers the worst-case AABB
    traversal (diagonal of the unit cube).

    Returns (tmin (R,), tmax (R,)); a miss leaves tmin >= tmax.
    """
    res = grids.shape[-1]
    step = 0.5 / res
    # Worst-case steps across the canonical cube diagonal (√3), padded.
    num_steps = int(np.ceil(np.sqrt(3.0) / step)) + 2

    ts_fwd = tmin_aabb[:, None] + step * jnp.arange(num_steps, dtype=jnp.float32)[None, :]  # (R, K)
    in_range_fwd = ts_fwd < tmax_aabb[:, None]

    def occupied_at(ts):
        pts = origins[:, None, :] + dirs[:, None, :] * ts[..., None] + 0.5
        return sample_occupancy(grids, grid_ids[:, None], pts)

    hit_fwd = occupied_at(ts_fwd) & in_range_fwd  # (R, K)
    any_hit = hit_fwd.any(axis=1)
    first = jnp.argmax(hit_fwd, axis=1)
    tmin = jnp.take_along_axis(ts_fwd, first[:, None], axis=1)[:, 0]

    # Bisection refine of tmin (ray_sampler.cu:49-64): 5 rounds, vectorized.
    refine = -0.5 * step * jnp.ones_like(tmin)
    t = tmin
    for _ in range(num_refine_steps):
        t = t + refine
        pts = origins + dirs * t[:, None] + 0.5
        occ = sample_occupancy(grids, grid_ids, pts)
        refine = jnp.where(occ, -jnp.abs(refine) * 0.5, jnp.abs(refine) * 0.5)
    tmin = jnp.where(any_hit, t, tmax_aabb)  # miss → tmin = tmax → masked

    # Backward march for tmax (ray_sampler.cu:66-75).
    ts_bwd = tmax_aabb[:, None] - step * jnp.arange(num_steps, dtype=jnp.float32)[None, :]
    in_range_bwd = ts_bwd > tmin[:, None]
    hit_bwd = occupied_at(ts_bwd) & in_range_bwd
    any_hit_bwd = hit_bwd.any(axis=1)
    first_bwd = jnp.argmax(hit_bwd, axis=1)
    tmax = jnp.take_along_axis(ts_bwd, first_bwd[:, None], axis=1)[:, 0]
    tmax = jnp.where(any_hit & any_hit_bwd, tmax, tmin)

    return tmin, tmax
