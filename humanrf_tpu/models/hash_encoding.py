"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces tiny-cuda-nn's `HashGrid` encoding used by the reference
(`/root/reference/humanrf/scene_representation/decomposition4d.py:79-122`).
Semantics follow the Instant-NGP paper (Müller et al. 2022): per level ``l``
with growth factor ``b = exp(ln(finest/base)/(L-1))``, positions in [0,1] are
scaled into an ``N_l``-resolution virtual grid; the 8 corners are looked up
either densely (small levels) or through the spatial hash
``x*1 ^ y*2654435761 ^ z*805459861 mod T`` and trilinearly blended.

TPU-first design decisions (vs. the CUDA original):

- **Lane-major sample layout.** TPU memory tiles are (8 sublanes × 128 lanes)
  on the two minor dims; an ``(N, 8)`` or ``(N, 2)`` array pads its minor dim
  to 128 (16–64× memory expansion — measured OOM on a 16GB chip). All
  per-sample intermediates here are therefore shaped ``(..., N/128, 128)``:
  samples on the lane axis, corners/features on major axes. Zero padding.
- **Per-channel tables.** The table is stored ``(L, F, T)`` so each feature
  channel is a contiguous ``(T,)`` row; a corner lookup is ONE batched gather
  with an ``(8, N/128, 128)`` index array per (level, channel).
- The per-level loop is unrolled into the XLA graph (L is small, 16).
- Backward is XLA's native scatter-add through the gathers; the feature path
  is rematerialized by the model (see humanrf.py) so gather indices/weights
  are never stored for backward.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))

LANES = 128


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
    """(L, F, T), uniform [-1e-4, 1e-4] init (tcnn's HashGrid default)."""
    shape = (cfg.n_levels, cfg.n_features_per_level, cfg.table_size)
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# Corner bit patterns, shaped (8, 1, 1) for broadcasting against (Nc, 128).
_CORNER_BITS = [
    tuple(((c >> d) & 1) for d in range(3)) for c in range(8)
]


def _level_corner_indices(base, frac_unused, resolution: int, table_size: int):
    """base: tuple of 3 int32 arrays shaped (Nc, 128) — voxel coords.

    Returns idx (8, Nc, 128) int32 — one slab per corner. Dense indexing when
    the level's grid fits in the table, spatial hash otherwise (static
    per-level decision).
    """
    slabs = []
    dense = resolution**3 <= table_size
    for bits in _CORNER_BITS:
        cx = base[0] + bits[0]
        cy = base[1] + bits[1]
        cz = base[2] + bits[2]
        if dense:
            idx = cx + cy * resolution + cz * (resolution * resolution)
        else:
            h = (
                (cx.astype(jnp.uint32) * _HASH_PRIMES[0])
                ^ (cy.astype(jnp.uint32) * _HASH_PRIMES[1])
                ^ (cz.astype(jnp.uint32) * _HASH_PRIMES[2])
            )
            idx = (h % np.uint32(table_size)).astype(jnp.int32)
        slabs.append(idx)
    return jnp.stack(slabs, axis=0)


def _corner_weights(frac):
    """frac: tuple of 3 (Nc, 128) arrays → weights (8, Nc, 128)."""
    slabs = []
    for bits in _CORNER_BITS:
        w = jnp.ones_like(frac[0])
        for d in range(3):
            w = w * (frac[d] if bits[d] else (1.0 - frac[d]))
        slabs.append(w)
    return jnp.stack(slabs, axis=0)


def hash_encode_lanes(table: jax.Array, positions_lanes, cfg: HashGridConfig):
    """Lane-major core. positions_lanes: tuple of 3 arrays (Nc, 128) in [0,1].

    Returns features as a list of (Nc, 128) arrays, level-major then
    channel-major — i.e. out[l * F + f] matches tcnn's output column l*F+f.
    """
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    x, y, z = (jnp.clip(p, 0.0, 1.0) for p in positions_lanes)

    outs = []
    for level in range(cfg.n_levels):
        scaled = tuple(p * scales[level] + 0.5 for p in (x, y, z))
        floor = tuple(jnp.floor(s) for s in scaled)
        frac = tuple(s - f for s, f in zip(scaled, floor))
        base = tuple(f.astype(jnp.int32) for f in floor)

        idx = _level_corner_indices(base, frac, int(resolutions[level]), cfg.table_size)  # (8, Nc, 128)
        w = _corner_weights(frac)  # (8, Nc, 128)

        for f in range(cfg.n_features_per_level):
            g = jnp.take(table[level, f], idx, axis=0)  # (8, Nc, 128)
            outs.append((g * w).sum(axis=0))  # (Nc, 128)
    return outs


def to_lanes(v: jax.Array):
    """(N,) → (N/LANES, LANES). N must be a multiple of LANES."""
    n = v.shape[0]
    assert n % LANES == 0, f"sample count {n} must be a multiple of {LANES}"
    return v.reshape(n // LANES, LANES)


def hash_encode(table: jax.Array, positions: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """positions: (N, 3) in [0, 1] → features (N, L*F), level-major like tcnn.

    Thin wrapper over the lane-major core for API/testing convenience; the
    model's hot path (decomposition4d) stays lane-major end to end.
    """
    n = positions.shape[0]
    pad = (-n) % LANES
    if pad:
        positions = jnp.concatenate([positions, jnp.zeros((pad, 3), positions.dtype)], axis=0)
    lanes = tuple(to_lanes(positions[:, d]) for d in range(3))
    outs = hash_encode_lanes(table, lanes, cfg)
    feats = jnp.stack(outs, axis=-1).reshape(n + pad, cfg.feature_dim)
    return feats[:n]


# --------------------------------------------------------------------------
# One-hot interpolating-matmul backend (gather-free).
#
# Rationale (PERF.md): every random-access mechanism on this TPU stack costs
# ~10ns per gathered element, which caps the tcnn-style encoding at ~0.05
# steps/s. For small tables (T ≲ 4096) the lookup can instead be computed on
# the MXU: build a (N, T) row per sample whose 8 corner entries hold the
# trilinear weights, then `row @ table` performs lookup AND interpolation in
# one matmul. The backward w.r.t. the table is `rowsᵀ @ g` — another matmul;
# sample positions carry no gradient, so no scatter ever happens.
# --------------------------------------------------------------------------


def _level_corner_scalar_indices(base, resolution: int, table_size: int):
    """base: 3 × (N,) int32 voxel coords → list of 8 (N,) corner indices."""
    out = []
    dense = resolution**3 <= table_size
    for bits in _CORNER_BITS:
        cx = base[0] + bits[0]
        cy = base[1] + bits[1]
        cz = base[2] + bits[2]
        if dense:
            idx = cx + cy * resolution + cz * (resolution * resolution)
        else:
            h = (
                (cx.astype(jnp.uint32) * _HASH_PRIMES[0])
                ^ (cy.astype(jnp.uint32) * _HASH_PRIMES[1])
                ^ (cz.astype(jnp.uint32) * _HASH_PRIMES[2])
            )
            idx = (h % np.uint32(table_size)).astype(jnp.int32)
        out.append(idx)
    return out


def interpolating_onehot(corner_indices, corner_weights, table_size: int) -> jax.Array:
    """corner_indices/corner_weights: lists of (N,) arrays → (N, T) bf16 rows.

    row[n, t] = Σ_c  w_c[n] · [idx_c[n] == t]

    Built directly in bf16: the (N, T) buffer is the step's dominant HBM
    traffic (PERF.md), an fp32 intermediate + cast pass doubles it, and the
    row values are interpolation weights in [0, 1] whose bf16 rounding is far
    below the hash-collision noise floor.
    """
    n = corner_indices[0].shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, table_size), 1)
    oh = jnp.zeros((n, table_size), dtype=jnp.bfloat16)
    for idx, w in zip(corner_indices, corner_weights):
        w16 = jnp.asarray(w, dtype=jnp.float32).astype(jnp.bfloat16)
        oh = oh + jnp.where(idx[:, None] == iota, w16[:, None], jnp.bfloat16(0))
    return oh


def hash_encode_onehot(table: jax.Array, positions: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """Gather-free variant of hash_encode. positions (N, 3) → (N, L*F).

    Requires a small table (cfg.table_size ≲ 4096); the (N, T) one-hot rows are
    built per level and contracted on the MXU. Callers should wrap the
    enclosing feature computation in jax.checkpoint so rows are recomputed in
    backward instead of stored.
    """
    positions = jnp.clip(positions, 0.0, 1.0)
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]

    outs = []
    for level in range(cfg.n_levels):
        scaled = tuple(p * scales[level] + 0.5 for p in (x, y, z))
        floor = tuple(jnp.floor(s) for s in scaled)
        frac = tuple(s - f for s, f in zip(scaled, floor))
        base = tuple(f.astype(jnp.int32) for f in floor)

        idxs = _level_corner_scalar_indices(base, int(resolutions[level]), cfg.table_size)
        weights = []
        for bits in _CORNER_BITS:
            w = jnp.ones_like(frac[0])
            for d in range(3):
                w = w * (frac[d] if bits[d] else (1.0 - frac[d]))
            weights.append(w)

        oh = interpolating_onehot(idxs, weights, cfg.table_size)  # (N, T) bf16
        # table[level]: (F, T) → contract over T on the MXU.
        feats = jnp.dot(oh, table[level].T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        outs.append(feats)  # (N, F)
    return jnp.concatenate(outs, axis=-1)


def hash_encode_onehot_factored(table: jax.Array, positions: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """Two-level factorization of hash_encode_onehot: idx = hi·128 + lo.

    Instead of an (N, T) one-hot row, build the corner-batched 128-wide
    lo-one-hot (N·8, 128), contract it with the table reshaped (128, T/128·F)
    on the MXU, then select the hi component with a (N, 8·T/128) weight mask
    and a final tiny selector matmul. Same math as hash_encode_onehot, ~T/(8·128)
    × fewer compare ops and ~2× less HBM traffic. Requires T a multiple of 128.
    """
    T = cfg.table_size
    assert T % LANES == 0, T
    t_hi = T // LANES
    n = positions.shape[0]
    positions = jnp.clip(positions, 0.0, 1.0)
    scales = cfg.level_scales()
    resolutions = cfg.level_resolutions()
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]

    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // t_hi  # unused helper

    # Selector folding (c, h, f) lanes back to F outputs: (8·t_hi·F, F).
    sel = np.zeros((8 * t_hi * cfg.n_features_per_level, cfg.n_features_per_level), np.float32)
    for lane in range(sel.shape[0]):
        sel[lane, lane % cfg.n_features_per_level] = 1.0
    sel = jnp.asarray(sel, dtype=jnp.bfloat16)

    outs = []
    for level in range(cfg.n_levels):
        scaled = tuple(p * scales[level] + 0.5 for p in (x, y, z))
        floor = tuple(jnp.floor(s) for s in scaled)
        frac = tuple(s - f for s, f in zip(scaled, floor))
        base = tuple(f.astype(jnp.int32) for f in floor)

        idxs = _level_corner_scalar_indices(base, int(resolutions[level]), cfg.table_size)
        idx8 = jnp.stack(idxs, axis=1)  # (N, 8)
        w8 = []
        for bits in _CORNER_BITS:
            w = jnp.ones_like(frac[0])
            for d in range(3):
                w = w * (frac[d] if bits[d] else (1.0 - frac[d]))
            w8.append(w)
        w8 = jnp.stack(w8, axis=1)  # (N, 8)

        lo = idx8 % LANES
        hi = idx8 // LANES

        # (N, 8, 128) bf16 lo-one-hot.
        b8 = (lo[:, :, None] == iota_lo).astype(jnp.bfloat16)
        # Table (F, T) → (t_hi, 128, F) → (128, t_hi·F).
        tab2 = (
            table[level]
            .reshape(cfg.n_features_per_level, t_hi, LANES)
            .transpose(2, 1, 0)
            .reshape(LANES, t_hi * cfg.n_features_per_level)
            .astype(jnp.bfloat16)
        )
        c8 = jnp.dot(b8.reshape(n * 8, LANES), tab2, preferred_element_type=jnp.float32)
        c8 = c8.reshape(n, 8 * t_hi * cfg.n_features_per_level)  # lane = c·(t_hi·F) + h·F + f

        # hi-mask with corner weights folded in: (N, 8·t_hi), expanded by F.
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t_hi), 2)
        a8 = jnp.where(hi[:, :, None] == iota_h, w8[:, :, None], 0.0)  # (N, 8, t_hi)
        a8 = jnp.repeat(
            a8.reshape(n, 8 * t_hi), cfg.n_features_per_level, axis=1
        )  # (N, 8·t_hi·F)

        prod = (c8 * a8).astype(jnp.bfloat16)
        outs.append(jnp.dot(prod, sel, preferred_element_type=jnp.float32))  # (N, F)
    return jnp.concatenate(outs, axis=-1)


def hash_encode_reference(table: np.ndarray, positions: np.ndarray, cfg: HashGridConfig) -> np.ndarray:
    """Pure-numpy oracle used by the unit tests (slow, loopy on purpose).
    table: (L, F, T)."""
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
                acc += w * np.asarray(table[level, :, idx], dtype=np.float64)
            out[i, level * cfg.n_features_per_level : (level + 1) * cfg.n_features_per_level] = acc
    return out
