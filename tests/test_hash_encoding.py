import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.models.hash_encoding import (
    HashGridConfig,
    hash_encode,
    hash_encode_reference,
    init_hash_table,
)


def test_matches_numpy_oracle(rng):
    cfg = HashGridConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=10, base_resolution=4, finest_resolution=64
    )
    table = rng.standard_normal((cfg.n_levels, cfg.n_features_per_level, cfg.table_size)).astype(np.float32)
    positions = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)

    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(positions), cfg))
    want = hash_encode_reference(table, positions, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_output_shape_and_level_order(rng):
    cfg = HashGridConfig(n_levels=3, n_features_per_level=2, log2_hashmap_size=8, base_resolution=2, finest_resolution=8)
    table = np.zeros((3, 2, cfg.table_size), dtype=np.float32)
    table[1] = 7.0  # constant level-1 features
    positions = rng.uniform(0, 1, size=(5, 3)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(positions), cfg))
    assert out.shape == (5, 6)
    # Level-major ordering: features of level 1 occupy columns 2:4.
    np.testing.assert_allclose(out[:, 2:4], 7.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 0:2], 0.0, atol=1e-6)


def test_gradients_flow_to_table():
    cfg = HashGridConfig(n_levels=2, n_features_per_level=2, log2_hashmap_size=8, base_resolution=2, finest_resolution=4)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    positions = jnp.array([[0.3, 0.5, 0.7], [0.1, 0.9, 0.2]])

    def loss(tbl):
        return hash_encode(tbl, positions, cfg).sum()

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    # Trilinear weights per level sum to 1 per sample; two samples, two levels.
    np.testing.assert_allclose(float(g.sum()), 2 * 2 * 2, rtol=1e-4)


def test_dense_vs_hash_level_selection():
    # base resolution 4 → res 5 → 125 entries fits in 2^8=256 (dense);
    # finest 64 → res 65 → 274625 does not (hashed). Both paths must index in range.
    cfg = HashGridConfig(n_levels=2, n_features_per_level=1, log2_hashmap_size=8, base_resolution=4, finest_resolution=64)
    table = jnp.ones((2, 1, cfg.table_size))
    positions = jnp.array([[0.999, 0.999, 0.999], [0.0, 0.0, 0.0]])
    out = hash_encode(table, positions, cfg)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
