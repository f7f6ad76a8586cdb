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


def _key_words(keys: jax.Array) -> jax.Array:
    """(N,)-vector of typed keys or (N, 2) legacy uint32 keys → (N, 2) uint32."""
    if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(keys)
    return keys


def _bits_to_unit(bits: jax.Array) -> jax.Array:
    """uint32 → float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)


def uniform_per_id(rng: jax.Array, ids: jax.Array, num: int = 1) -> jax.Array:
    """Uniform [0,1) draws keyed by integer identity.

    ids: (N,) int32 — any stable global identifier.
    Returns (N,) when num == 1, else (N, num). The result for a given
    (rng, id) pair is independent of the shape/order of `ids`.

    num ≤ 2 (the hot path: ~1M per-sample jitter draws per step) reads the
    fold_in output words directly — threefry's output IS the random bits, so
    a second per-element threefry round for `uniform` would only double the
    cost.
    """
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(rng, ids)
    if num <= 2:
        words = _key_words(keys)
        u = _bits_to_unit(words[..., :num])
        return u[..., 0] if num == 1 else u
    return jax.vmap(lambda k: jax.random.uniform(k, (num,)))(keys)
