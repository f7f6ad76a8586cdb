"""HumanRF's 4D feature-grid decomposition, TPU-native.

Re-implements the reference's `Decomposition4D`
(`/root/reference/humanrf/scene_representation/decomposition4d.py:42-135`) and its
fused CUDA tensor-composition op
(`/root/reference/humanrf/scene_representation/native/tensor_composition.cu:9-118`)
as pure jnp in the **lane-major** sample layout (see models/hash_encoding.py):
every per-sample intermediate is shaped (Nc, 128) so nothing pads on TPU tiles.
XLA fuses the gathers/lerps/multiplies that the CUDA kernel fused by hand;
backward (including the scatter-add into the 1D vectors) comes from autodiff.

Math (matching tensor_composition.cu:49-52): with four 3D hash grids over the
projections (xyz, xyt, yzt, xzt) of the 4D point and four dense 1D vectors
v_x, v_y, v_z, v_t sampled at the remaining coordinate (align_corners=True
linear interpolation):

    out = f_xyz ⊙ v_t + f_xyt ⊙ v_z + f_yzt ⊙ v_x + f_xzt ⊙ v_y
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from humanrf_tpu.models.hash_encoding import (
    HashGridConfig,
    hash_encode_lanes,
    init_hash_table,
    to_lanes,
)


@dataclass(frozen=True)
class Decomposition4DConfig:
    grid: HashGridConfig = HashGridConfig()
    vectors_finest_resolution: int = 2048
    # "gather": exact tcnn-semantics lookups (XLA gathers; ~10ns/element on
    # TPU — see PERF.md). "onehot": gather-free interpolating-matmul backend
    # (requires small grid.table_size; trades capacity for ~10-20× step time).
    # "fused": same math as onehot through the Pallas kernel that builds the
    # one-hot rows in VMEM only (ops/fused_interp.py; 1.6× over onehot on
    # v5e — PERF.md round 3). Needs table_size and vector resolution % 128
    # == 0; falls back to onehot per-segment otherwise.
    backend: str = "gather"
    # Sample-chunk size for the onehot backend ((chunk, T) one-hot rows are
    # materialized per level; 32768×2048×bf16 = 134MB transient).
    onehot_chunk: int = 32768
    # --- fused-backend knobs (see ops/fused_interp.py) -----------------------
    fused_variant: str = "twolevel"
    fused_tile_n: int = 1024
    # Pallas interpret mode: required on CPU (tests / --device cpu); auto-set
    # by the model from the active JAX backend.
    fused_interpret: bool = False

    @property
    def feature_dim(self) -> int:
        return self.grid.feature_dim


def init_decomposition4d(rng: jax.Array, cfg: Decomposition4DConfig) -> Dict[str, jax.Array]:
    keys = jax.random.split(rng, 5)
    return {
        "xyz": init_hash_table(keys[0], cfg.grid),
        "xyt": init_hash_table(keys[1], cfg.grid),
        "yzt": init_hash_table(keys[2], cfg.grid),
        "xzt": init_hash_table(keys[3], cfg.grid),
        # (4, D, R) fp32 — feature channels contiguous per axis for lane-major
        # gathers; randn * 0.1 init as the reference (decomposition4d.py:76-78).
        "vectors": 0.1
        * jax.random.normal(
            keys[4], (4, cfg.feature_dim, cfg.vectors_finest_resolution), dtype=jnp.float32
        ),
    }


def sample_vectors_lanes(vectors: jax.Array, coords_lanes):
    """Linearly sample the 1D vectors at each of the 4 coordinates.

    vectors: (4, D, R); coords_lanes: tuple of 4 arrays (Nc, 128) in [0, 1].
    Returns v[a][d] as a (4, D, Nc, 128) array.
    align_corners=True semantics matching tensor_composition.cu:33-46:
    coord = c*R - 0.5; corners clamped to [0, R-1].
    """
    resolution = vectors.shape[-1]
    per_axis = []
    for a in range(4):
        coord = coords_lanes[a] * resolution - 0.5
        coord_floor = jnp.floor(coord)
        frac = coord - coord_floor  # (Nc, 128)
        i0 = jnp.clip(coord_floor, 0, resolution - 1).astype(jnp.int32)
        i1 = jnp.clip(coord_floor + 1, 0, resolution - 1).astype(jnp.int32)
        v0 = jnp.take(vectors[a], i0, axis=1)  # (D, Nc, 128)
        v1 = jnp.take(vectors[a], i1, axis=1)
        per_axis.append(v0 + frac[None] * (v1 - v0))
    return jnp.stack(per_axis, axis=0)  # (4, D, Nc, 128)


def sample_vectors_onehot(vectors: jax.Array, coords: jax.Array) -> jax.Array:
    """Gather-free 1-D vector sampling: linear interpolation as a 2-hot matmul.

    vectors: (4, D, R); coords: (N, 4) in [0, 1] → (N, 4, D).
    """
    from humanrf_tpu.models.hash_encoding import interpolating_onehot

    resolution = vectors.shape[-1]
    out = []
    for a in range(4):
        coord = coords[:, a] * resolution - 0.5
        coord_floor = jnp.floor(coord)
        frac = coord - coord_floor
        i0 = jnp.clip(coord_floor, 0, resolution - 1).astype(jnp.int32)
        i1 = jnp.clip(coord_floor + 1, 0, resolution - 1).astype(jnp.int32)
        oh = interpolating_onehot([i0, i1], [1.0 - frac, frac], resolution)  # (N, R)
        out.append(
            jnp.dot(oh, vectors[a].T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        )  # (N, D)
    return jnp.stack(out, axis=1)


def _apply_decomposition4d_onehot(
    params: Dict[str, jax.Array], xyz: jax.Array, times: jax.Array, cfg: Decomposition4DConfig
) -> jax.Array:
    """Gather-free decomposition: per-chunk one-hot matmul encodings.

    Chunked with lax.map + jax.checkpoint so the (chunk, T) one-hot rows are
    transient in forward AND recomputed (not stored) for backward.
    """
    from humanrf_tpu.models.hash_encoding import hash_encode_onehot

    n = xyz.shape[0]
    # Largest divisor of n not exceeding the configured chunk size.
    chunk = min(cfg.onehot_chunk, n)
    while n % chunk != 0:
        chunk -= 128 if chunk % 128 == 0 else chunk % 128
    xyzt = jnp.concatenate([xyz, times], axis=-1)  # (N, 4)

    # NOTE: hash_encode_onehot_factored was benchmarked here and is SLOWER in
    # the full training step (3190 vs 4912 rays/s) despite fewer compare ops —
    # XLA schedules the plain single-matmul form better. Kept available for
    # future kernel work; see PERF.md.
    encode = hash_encode_onehot

    @jax.checkpoint
    def one_chunk(pts):
        f_xyz = encode(params["xyz"], pts[:, :3], cfg.grid)
        f_xyt = encode(params["xyt"], pts[:, jnp.array([0, 1, 3])], cfg.grid)
        f_yzt = encode(params["yzt"], pts[:, jnp.array([1, 2, 3])], cfg.grid)
        f_xzt = encode(params["xzt"], pts[:, jnp.array([0, 2, 3])], cfg.grid)
        v = sample_vectors_onehot(params["vectors"], pts)  # (chunk, 4, D)
        # Pairing from tensor_composition.cu:49-52.
        return f_xyz * v[:, 3] + f_xyt * v[:, 2] + f_yzt * v[:, 0] + f_xzt * v[:, 1]

    if n == chunk:
        return one_chunk(xyzt)
    out = jax.lax.map(one_chunk, xyzt.reshape(n // chunk, chunk, 4))
    return out.reshape(n, cfg.feature_dim)


def apply_decomposition4d(
    params: Dict[str, jax.Array], xyz: jax.Array, times: jax.Array, cfg: Decomposition4DConfig
) -> jax.Array:
    """xyz: (N, 3) in [0, 1]; times: (N, 1) in [0, 1] → features (N, L*F).

    N must be a multiple of 128 (the pipeline's static budgets are).
    """
    if cfg.backend == "fused":
        if cfg.grid.table_size % 128 == 0 and params["vectors"].shape[-1] % 128 == 0:
            from humanrf_tpu.models.fused_field import apply_decomposition4d_fused

            return apply_decomposition4d_fused(params, xyz, times, cfg)
        # Tiny segment tables (per-segment hashmap scaling can go below 128)
        # don't fit the kernel's lane tiling — use the XLA one-hot path there;
        # such segments are cheap anyway.
        return _apply_decomposition4d_onehot(params, xyz, times, cfg)
    if cfg.backend == "onehot":
        return _apply_decomposition4d_onehot(params, xyz, times, cfg)
    assert cfg.backend == "gather", cfg.backend
    n = xyz.shape[0]
    x = to_lanes(xyz[:, 0])
    y = to_lanes(xyz[:, 1])
    z = to_lanes(xyz[:, 2])
    t = to_lanes(times[:, 0])

    f_xyz = hash_encode_lanes(params["xyz"], (x, y, z), cfg.grid)  # list of D × (Nc, 128)
    f_xyt = hash_encode_lanes(params["xyt"], (x, y, t), cfg.grid)
    f_yzt = hash_encode_lanes(params["yzt"], (y, z, t), cfg.grid)
    f_xzt = hash_encode_lanes(params["xzt"], (x, z, t), cfg.grid)

    v = sample_vectors_lanes(params["vectors"], (x, y, z, t))  # (4, D, Nc, 128)

    # Pairing from tensor_composition.cu:49-52.
    out = []
    for d in range(cfg.feature_dim):
        out.append(f_xyz[d] * v[3, d] + f_xyt[d] * v[2, d] + f_yzt[d] * v[0, d] + f_xzt[d] * v[1, d])
    # (Nc, 128, D) → (N, D): row-major reshape keeps the sample order and,
    # unlike a (D, N) transpose, leaves the downstream MLP dot with a
    # standard-layout lhs (XLA CPU's bf16 dot thunk rejects transposed lhs).
    return jnp.stack(out, axis=-1).reshape(n, cfg.feature_dim)
