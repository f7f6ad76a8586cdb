"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces tiny-cuda-nn's `HashGrid` encoding used by the reference
(`/root/reference/humanrf/scene_representation/decomposition4d.py:79-122`).
Semantics follow the Instant-NGP paper (Müller et al. 2022): per level ``l``
with growth factor ``b = exp(ln(finest/base)/(L-1))``, positions in [0,1] are
scaled into an ``N_l``-resolution virtual grid; the 8 corners are looked up
either densely (small levels) or through the spatial hash
``x*1 ^ y*2654435761 ^ z*805459861 mod T`` and trilinearly blended.

TPU-first design decisions (vs. the CUDA original):
- One fp32 table of shape ``(L, T, F)`` (every level padded to the full
  hashmap size). This costs ~20% extra HBM over tcnn's tightly-packed layout
  but makes the lookup a single batched gather per level with static shapes.
- The per-level loop is unrolled into the XLA graph (L is small, 16); each
  level is one gather of ``(N, 8)`` indices — indices never materialize as a
  giant ``(N, L, 8)`` tensor in HBM.
- Backward is XLA's native scatter-add through the gather (the tcnn custom
  backward kernel has no TPU analog needed; revisit with a Pallas
  sorted-segment-sum if profiling shows scatter dominating).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 32
    finest_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def feature_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(np.exp(np.log(self.finest_resolution / self.base_resolution) / (self.n_levels - 1)))

    def level_scales(self) -> np.ndarray:
        """Grid scale per level (fp32): pos_grid = x * scale + 0.5."""
        ls = np.arange(self.n_levels)
        return (self.base_resolution * self.per_level_scale**ls - 1.0).astype(np.float32)

    def level_resolutions(self) -> np.ndarray:
        return (np.ceil(self.level_scales()) + 1).astype(np.int64)


def init_hash_table(rng: jax.Array, cfg: HashGridConfig, dtype=jnp.float32) -> jax.Array:
    """Uniform [-1e-4, 1e-4] init (tcnn's HashGrid default)."""
    shape = (cfg.n_levels, cfg.table_size, cfg.n_features_per_level)
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# The 8 corner offsets of a voxel, shaped for broadcasting: (8, 3).
_CORNERS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], dtype=np.int32
)


def _level_indices(pos_grid: jax.Array, resolution: int, table_size: int) -> jax.Array:
    """Corner indices for one level. pos_grid: (N, 8, 3) int32 voxel coords.

    Dense indexing when the level's grid fits in the table, spatial hash
    otherwise — decided statically per level.
    """
    if resolution**3 <= table_size:
        stride = np.array([1, resolution, resolution * resolution], dtype=np.int32)
        idx = (pos_grid * stride).sum(-1)
    else:
        h = pos_grid.astype(jnp.uint32)
        idx = (h[..., 0] * _HASH_PRIMES[0]) ^ (h[..., 1] * _HASH_PRIMES[1]) ^ (h[..., 2] * _HASH_PRIMES[2])
        idx = (idx % np.uint32(table_size)).astype(jnp.int32)
    return idx


def hash_encode(table: jax.Array, positions: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """positions: (N, 3) in [0, 1] → features (N, L*F), level-major like tcnn.

    Out-of-range positions are clamped (tcnn clamps via its grid sampling; the
    callers guarantee [0,1] anyway since the scene is normalized).
    """
    n = positions.shape[0]
    positions = jnp.clip(positions, 0.0, 1.0)
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()

    outs = []
    for level in range(cfg.n_levels):
        pos = positions * scales[level] + 0.5  # (N, 3)
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor  # (N, 3)
        base = pos_floor.astype(jnp.int32)  # (N, 3)

        corner_coords = base[:, None, :] + _CORNERS[None, :, :]  # (N, 8, 3)
        idx = _level_indices(corner_coords, int(resolutions[level]), cfg.table_size)  # (N, 8)

        # Trilinear weights: prod over dims of (frac if corner bit else 1-frac).
        w = jnp.where(_CORNERS[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
        weights = w.prod(-1)  # (N, 8)

        feats = jnp.take(table[level], idx, axis=0)  # (N, 8, F)
        outs.append((feats * weights[..., None]).sum(1))  # (N, F)

    return jnp.concatenate(outs, axis=-1).reshape(n, cfg.feature_dim)


def hash_encode_reference(table: np.ndarray, positions: np.ndarray, cfg: HashGridConfig) -> np.ndarray:
    """Pure-numpy oracle used by the unit tests (slow, loopy on purpose)."""
    positions = np.clip(positions, 0.0, 1.0)
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    n = positions.shape[0]
    out = np.zeros((n, cfg.feature_dim), dtype=np.float64)
    for i in range(n):
        for level in range(cfg.n_levels):
            pos = positions[i] * scales[level] + 0.5
            base = np.floor(pos).astype(np.int64)
            frac = pos - np.floor(pos)
            acc = np.zeros(cfg.n_features_per_level)
            for c in range(8):
                offs = np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1])
                coord = base + offs
                res = int(resolutions[level])
                if res**3 <= cfg.table_size:
                    idx = int(coord[0] + coord[1] * res + coord[2] * res * res)
                else:
                    # uint32 wrap-around arithmetic via python ints.
                    m = 0xFFFFFFFF
                    h0 = (int(coord[0]) * 1) & m
                    h1 = (int(coord[1]) * 2654435761) & m
                    h2 = (int(coord[2]) * 805459861) & m
                    idx = (h0 ^ h1 ^ h2) % cfg.table_size
                w = np.prod(np.where(offs > 0, frac, 1.0 - frac))
                acc += w * np.asarray(table[level, idx], dtype=np.float64)
            out[i, level * cfg.n_features_per_level : (level + 1) * cfg.n_features_per_level] = acc
    return out
