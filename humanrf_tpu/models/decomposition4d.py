"""HumanRF's 4D feature-grid decomposition, TPU-native.

Re-implements the reference's `Decomposition4D`
(`/root/reference/humanrf/scene_representation/decomposition4d.py:42-135`) and its
fused CUDA tensor-composition op
(`/root/reference/humanrf/scene_representation/native/tensor_composition.cu:9-118`)
as pure jnp. The composition is a handful of gathers, lerps and multiplies
that XLA fuses on its own — the CUDA kernel existed only to fuse what the
torch eager executor would not (SURVEY.md §2.4 item 4). Backward (including
the scatter-add into the 1D vectors) comes from XLA autodiff.

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

from humanrf_tpu.models.hash_encoding import HashGridConfig, hash_encode, init_hash_table


@dataclass(frozen=True)
class Decomposition4DConfig:
    grid: HashGridConfig = HashGridConfig()
    vectors_finest_resolution: int = 2048

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
        # (4, R, L*F) fp32, randn * 0.1 as the reference (decomposition4d.py:76-78).
        "vectors": 0.1
        * jax.random.normal(
            keys[4], (4, cfg.vectors_finest_resolution, cfg.feature_dim), dtype=jnp.float32
        ),
    }


def sample_vectors(vectors: jax.Array, xyzt: jax.Array) -> jax.Array:
    """Linearly sample the four 1D vectors at the 4 coordinates.

    vectors: (4, R, D); xyzt: (N, 4) in [0, 1] → (N, 4, D).
    align_corners=True semantics matching tensor_composition.cu:33-46:
    coord = c*R - 0.5; corners clamped to [0, R-1].
    """
    resolution = vectors.shape[1]
    coord = xyzt * resolution - 0.5  # (N, 4)
    coord_floor = jnp.floor(coord)
    frac = coord - coord_floor
    i0 = jnp.clip(coord_floor, 0, resolution - 1).astype(jnp.int32)
    i1 = jnp.clip(coord_floor + 1, 0, resolution - 1).astype(jnp.int32)

    # Per-axis gather: vectors[a, i{0,1}[:, a]] → (N, D).
    v0 = jnp.stack([jnp.take(vectors[a], i0[:, a], axis=0) for a in range(4)], axis=1)
    v1 = jnp.stack([jnp.take(vectors[a], i1[:, a], axis=0) for a in range(4)], axis=1)
    return v0 + frac[..., None] * (v1 - v0)  # (N, 4, D)


def apply_decomposition4d(
    params: Dict[str, jax.Array], xyz: jax.Array, times: jax.Array, cfg: Decomposition4DConfig
) -> jax.Array:
    """xyz: (N, 3) in [0, 1]; times: (N, 1) in [0, 1] → features (N, L*F)."""
    xyzt = jnp.concatenate([xyz, times], axis=-1)  # (N, 4)

    f_xyz = hash_encode(params["xyz"], xyz, cfg.grid)
    f_xyt = hash_encode(params["xyt"], xyzt[:, jnp.array([0, 1, 3])], cfg.grid)
    f_yzt = hash_encode(params["yzt"], xyzt[:, jnp.array([1, 2, 3])], cfg.grid)
    f_xzt = hash_encode(params["xzt"], xyzt[:, jnp.array([0, 2, 3])], cfg.grid)

    v = sample_vectors(params["vectors"], xyzt)  # (N, 4, D)
    # Pairing from tensor_composition.cu:49-52.
    return f_xyz * v[:, 3] + f_xyt * v[:, 2] + f_yzt * v[:, 0] + f_xzt * v[:, 1]
