"""Shard-invariant random draws.

Training noise (background compositing, sample jitter — the reference draws
these with `torch.rand_like`, `humanrf/trainer.py:234-238` and
`humanrf/volume_rendering.py:63-64`) must not depend on how rays are laid out
across devices: the data-parallel step is required to produce the *same*
gradients as the single-device step on the same batch. That rules out
shape-keyed `jax.random.uniform(rng, local_shape)` draws — a shard sees a
different shape/slot order than the global program.

Instead every draw is keyed by a stable integer identity (global ray index,
or global ray index × lattice-slot): fold the id into the step rng and draw
from the per-id key. Pure counter-based threefry, vectorized — two threefry
passes per element, bandwidth-trivial on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_per_id(rng: jax.Array, ids: jax.Array, num: int = 1) -> jax.Array:
    """Uniform [0,1) draws keyed by integer identity.

    ids: (N,) int32 — any stable global identifier.
    Returns (N,) when num == 1, else (N, num). The result for a given
    (rng, id) pair is independent of the shape/order of `ids`.
    """
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(rng, ids)
    if num == 1:
        return jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    return jax.vmap(lambda k: jax.random.uniform(k, (num,)))(keys)
