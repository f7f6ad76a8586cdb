"""The 4D decomposition on the fused Pallas interpolating-matmul kernel.

Same math as `decomposition4d._apply_decomposition4d_onehot` (reference
semantics: `/root/reference/humanrf/scene_representation/tensor_composition.cu:49-52`
pairing over 4 projected hash grids + 4 dense 1-D vectors), but every table
lookup — all 4·L grid level-pairs AND the four 1-D vectors — goes through
`ops.fused_interp.fused_interp`, which builds the interpolating one-hot rows
in VMEM and contracts them on the MXU without ever writing an (N, T) buffer
to HBM. Measured on v5e-1 at flagship shapes: 1.6× over the XLA one-hot path
for the encoding's fwd+bwd (PERF.md round 3).

Layout notes: the kernel works sample-on-lanes, so everything here is
(P, C, N) / (P, F, N); the single (D, N) → (N, D) transpose happens once at
the end (a bandwidth-trivial 134MB pass at bench shapes).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from humanrf_tpu.ops.fused_interp import fused_interp

# Grid name → which of (x, y, z, t) it consumes; pairing partner vector axis
# from tensor_composition.cu:49-52: out = f_xyz⊙v_t + f_xyt⊙v_z + f_yzt⊙v_x
# + f_xzt⊙v_y.
_GRID_AXES = (
    ("xyz", (0, 1, 2)),
    ("xyt", (0, 1, 3)),
    ("yzt", (1, 2, 3)),
    ("xzt", (0, 2, 3)),
)
_PARTNER_VECTOR = (3, 2, 0, 1)

# Instant-NGP corner/hash conventions — single source of truth in
# hash_encoding so fused-vs-onehot parity can't silently drift.
from humanrf_tpu.models.hash_encoding import _CORNER_BITS, _HASH_PRIMES  # noqa: E402


def _grid_corner_idx_w(pts, level_scales, level_resolutions, table_size: int):
    """pts (N, 3) in [0,1] → idx (L, 8, N) int32, w (L, 8, N) f32.

    Same per-level scaling / dense-vs-hash decision as
    hash_encoding._level_corner_scalar_indices (Instant-NGP conventions).
    """
    x = jnp.clip(pts, 0.0, 1.0)
    idx_levels, w_levels = [], []
    for level in range(len(level_scales)):
        scaled = x * level_scales[level] + 0.5
        floor = jnp.floor(scaled)
        frac = scaled - floor
        base = floor.astype(jnp.int32)
        res = int(level_resolutions[level])
        dense = res**3 <= table_size

        idx_c, w_c = [], []
        for bits in _CORNER_BITS:
            c = base + jnp.asarray(bits, dtype=jnp.int32)[None, :]
            if dense:
                idx = c[:, 0] + c[:, 1] * res + c[:, 2] * (res * res)
            else:
                cu = c.astype(jnp.uint32)
                h = (
                    (cu[:, 0] * jnp.uint32(_HASH_PRIMES[0]))
                    ^ (cu[:, 1] * jnp.uint32(_HASH_PRIMES[1]))
                    ^ (cu[:, 2] * jnp.uint32(_HASH_PRIMES[2]))
                )
                idx = (h % jnp.uint32(table_size)).astype(jnp.int32)
            w = jnp.ones_like(frac[:, 0])
            for d in range(3):
                w = w * (frac[:, d] if bits[d] else (1.0 - frac[:, d]))
            idx_c.append(idx)
            w_c.append(w)
        idx_levels.append(jnp.stack(idx_c))  # (8, N)
        w_levels.append(jnp.stack(w_c))
    return jnp.stack(idx_levels), jnp.stack(w_levels)  # (L, 8, N)


def _vector_idx_w(coords4, resolution: int):
    """coords4 (N, 4) in [0,1] → idx (4, 2, N) int32, w (4, 2, N) f32.

    align_corners=True linear sampling (tensor_composition.cu:33-46): the two
    corner indices are clamped to [0, R-1]."""
    coord = coords4 * resolution - 0.5  # (N, 4)
    base = jnp.floor(coord)
    frac = coord - base
    i0 = jnp.clip(base, 0, resolution - 1).astype(jnp.int32)
    i1 = jnp.clip(base + 1, 0, resolution - 1).astype(jnp.int32)
    idx = jnp.stack([i0.T, i1.T], axis=1)  # (4, 2, N)
    w = jnp.stack([(1.0 - frac).T, frac.T], axis=1)
    return idx, w


def apply_decomposition4d_fused(params: Dict[str, jax.Array], xyz, times, cfg):
    """Fused-kernel counterpart of apply_decomposition4d (backend="fused").

    xyz (N, 3) in [0,1]; times (N, 1) in [0,1] → (N, L·F) fp32 features.
    """
    grid_cfg = cfg.grid
    T = grid_cfg.table_size
    assert T % 128 == 0, (
        f"fused backend needs table_size % 128 == 0, got {T} "
        "(use the onehot/gather backend for tiny segment tables)"
    )
    n = xyz.shape[0]
    L, F = grid_cfg.n_levels, grid_cfg.n_features_per_level
    scales = grid_cfg.level_scales()
    resolutions = grid_cfg.level_resolutions()
    xyzt = jnp.concatenate([xyz, times], axis=-1)  # (N, 4)

    idx_all, w_all, tabs = [], [], []
    for name, axes in _GRID_AXES:
        pts = xyzt[:, jnp.array(axes)]
        idx_g, w_g = _grid_corner_idx_w(pts, scales, resolutions, T)
        idx_all.append(idx_g)
        w_all.append(w_g)
        tabs.append(params[name])  # (L, F, T)
    idx_all = jnp.concatenate(idx_all, axis=0)  # (4L, 8, N)
    w_all = jnp.concatenate(w_all, axis=0)
    tables = jnp.concatenate(tabs, axis=0)  # (4L, F, T)

    feats = fused_interp(
        tables, idx_all, w_all, cfg.fused_variant, cfg.fused_tile_n, cfg.fused_interpret
    )  # (4L, F, N)
    f = feats.reshape(4, L * F, n)

    vectors = params["vectors"]  # (4, D, R) with D == L*F
    r = vectors.shape[-1]
    assert r % 128 == 0, f"fused backend needs vector resolution % 128 == 0, got {r}"
    idx_v, w_v = _vector_idx_w(jnp.clip(xyzt, 0.0, 1.0), r)
    v = fused_interp(
        vectors, idx_v, w_v, cfg.fused_variant, cfg.fused_tile_n, cfg.fused_interpret
    )  # (4, D, N)

    out = sum(f[g] * v[_PARTNER_VECTOR[g]] for g in range(4))  # (D, N)
    return out.T
