"""The gather-free one-hot matmul field backend must agree with the gather
backend (same parameters, same math — different lowering)."""
import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.models.decomposition4d import (
    Decomposition4DConfig,
    apply_decomposition4d,
    init_decomposition4d,
)
from humanrf_tpu.models.hash_encoding import HashGridConfig, hash_encode, hash_encode_onehot


def test_onehot_encode_matches_gather(rng):
    cfg = HashGridConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=9, base_resolution=4, finest_resolution=64
    )
    table = jnp.asarray(rng.standard_normal((4, 2, cfg.table_size)).astype(np.float32))
    positions = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))

    got = np.asarray(hash_encode_onehot(table, positions, cfg))
    want = np.asarray(hash_encode(table, positions, cfg))
    # bf16 one-hot matmul vs fp32 gathers: tolerances are bf16-level.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_onehot_decomposition_matches_gather(rng):
    cfg_g = Decomposition4DConfig(
        grid=HashGridConfig(n_levels=3, n_features_per_level=2, log2_hashmap_size=9,
                            base_resolution=4, finest_resolution=32),
        vectors_finest_resolution=64,
        backend="gather",
    )
    cfg_o = Decomposition4DConfig(
        grid=cfg_g.grid, vectors_finest_resolution=64, backend="onehot", onehot_chunk=128
    )
    params = init_decomposition4d(jax.random.PRNGKey(0), cfg_g)
    # Scale params up so bf16 relative tolerances are meaningful.
    params = jax.tree_util.tree_map(lambda p: p * 100.0 if p.ndim == 3 and p.shape[1] == 2 else p, params)

    xyz = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    times = jnp.asarray(rng.uniform(0, 1, (256, 1)).astype(np.float32))

    got = np.asarray(apply_decomposition4d(params, xyz, times, cfg_o))
    want = np.asarray(apply_decomposition4d(params, xyz, times, cfg_g))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_onehot_gradients_are_matmuls_and_correct(rng):
    """Table gradients through the one-hot path must match the gather path."""
    cfg_g = Decomposition4DConfig(
        grid=HashGridConfig(n_levels=2, n_features_per_level=2, log2_hashmap_size=8,
                            base_resolution=4, finest_resolution=16),
        vectors_finest_resolution=32,
        backend="gather",
    )
    cfg_o = Decomposition4DConfig(
        grid=cfg_g.grid, vectors_finest_resolution=32, backend="onehot", onehot_chunk=128
    )
    params = init_decomposition4d(jax.random.PRNGKey(1), cfg_g)
    xyz = jnp.asarray(rng.uniform(0, 1, (128, 3)).astype(np.float32))
    times = jnp.asarray(rng.uniform(0, 1, (128, 1)).astype(np.float32))

    def loss(p, cfg):
        return (apply_decomposition4d(p, xyz, times, cfg) ** 2).sum()

    g_gather = jax.grad(lambda p: loss(p, cfg_g))(params)
    g_onehot = jax.grad(lambda p: loss(p, cfg_o))(params)
    for k in ("xyz", "vectors"):
        a, b = np.asarray(g_gather[k]), np.asarray(g_onehot[k])
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=3e-2)


def test_factored_onehot_matches(rng):
    """The two-level factorized variant computes the same encoding."""
    from humanrf_tpu.models.hash_encoding import hash_encode_onehot_factored

    cfg = HashGridConfig(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=9, base_resolution=4, finest_resolution=32
    )
    table = jnp.asarray(rng.standard_normal((3, 2, cfg.table_size)).astype(np.float32))
    positions = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    got = np.asarray(hash_encode_onehot_factored(table, positions, cfg))
    want = np.asarray(hash_encode(table, positions, cfg))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
