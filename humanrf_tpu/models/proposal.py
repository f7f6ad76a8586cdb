"""CP-factorized 4D proposal density field — the cheap coarse field that
drives importance sampling (ops/resample.py).

The reference has no proposal network; its analog is the visibility-prune
density pass over the FULL candidate lattice
(`/root/reference/humanrf/volume_rendering.py:42-84`), which re-evaluates the
expensive hash field at every candidate. On TPU that pass dominates the step,
so the coarse density gets its own representation chosen for MXU-friendliness:
a rank-R CANDECOMP/PARAFAC factorization

    sigma(x, y, z, t) = truncated_exp( Σ_r  u_r(x) · v_r(y) · w_r(z) · s_r(t) ) · scale

with each 1-D factor a dense learned vector sampled by linear interpolation.
A 1-D lerp is a 2-hot row × factor-matrix matmul, so one sample costs four
(N, res)×(res, rank) matmuls + a rank-sized product — ~25× cheaper than one
hash-field query, with zero gathers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from humanrf_tpu.models.activation import truncated_exp
from humanrf_tpu.models.hash_encoding import interpolating_onehot


@dataclass(frozen=True)
class ProposalFieldConfig:
    resolution: int = 128
    rank: int = 16
    # Unlike the main field's ×100 (humanrf.py:184), the proposal starts
    # near-transparent: an opaque init saturates alpha in the first bins and
    # kills both the sampler (everything lands at tmin) and the gradient
    # (∂alpha/∂σ → 0). truncated_exp covers the needed range on its own.
    density_scale: float = 1.0


def init_proposal_field(rng: jax.Array, cfg: ProposalFieldConfig) -> Dict[str, jax.Array]:
    """One segment's factors: (4 axes, resolution, rank).

    Init keeps Σ_r Π_a factors ≈ 0 with unit-order per-rank magnitude, so the
    initial density ≈ `density_scale` everywhere — i.e. the first resampling
    passes are near-uniform until distillation shapes the field.
    """
    factors = jax.random.normal(rng, (4, cfg.resolution, cfg.rank), dtype=jnp.float32)
    return {"factors": factors * 0.3}


def apply_proposal_field(
    params: Dict[str, jax.Array], coords: jax.Array, cfg: ProposalFieldConfig
) -> jax.Array:
    """coords: (N, 4) [x, y, z, t] in [0, 1] → density (N,) fp32.

    align_corners=True linear sampling of each axis factor (same convention as
    the decomposition's 1-D vectors, tensor_composition.cu:33-46).
    """
    res = cfg.resolution
    factors = params["factors"]

    rank_prod = None
    for axis in range(4):
        coord = coords[:, axis] * res - 0.5
        base = jnp.floor(coord)
        frac = coord - base
        i0 = jnp.clip(base, 0, res - 1).astype(jnp.int32)
        i1 = jnp.clip(base + 1, 0, res - 1).astype(jnp.int32)
        rows = interpolating_onehot([i0, i1], [1.0 - frac, frac], res)  # (N, res) bf16
        vals = jnp.dot(rows, factors[axis].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        rank_prod = vals if rank_prod is None else rank_prod * vals  # (N, rank)

    raw = rank_prod.sum(axis=-1)
    return truncated_exp(raw) * cfg.density_scale
