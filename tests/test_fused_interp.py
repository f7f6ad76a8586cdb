"""The fused Pallas interpolating-matmul kernel (ops/fused_interp.py).

Runs in Pallas interpreter mode on the CPU test platform; the same code path
compiles through Mosaic on TPU (microbenchmarked in scripts/bench_fused.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanrf_tpu.models.decomposition4d import (
    Decomposition4DConfig,
    apply_decomposition4d,
    init_decomposition4d,
)
from humanrf_tpu.models.hash_encoding import HashGridConfig
from humanrf_tpu.ops.fused_interp import fused_interp, fused_interp_reference


@pytest.mark.parametrize("variant", ["direct", "twolevel"])
def test_fused_interp_matches_oracle(variant):
    rng = np.random.default_rng(0)
    P, F, T, C, N = 3, 4, 256, 8, 700  # N deliberately not a tile multiple
    tables = jnp.asarray(rng.normal(size=(P, F, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (P, C, N)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (P, C, N)).astype(np.float32))

    ref = np.asarray(fused_interp_reference(tables, idx, w))
    out = np.asarray(fused_interp(tables, idx, w, variant, 128, True))
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(out - ref)) / scale < 2e-2  # bf16 row quantization

    # Table gradients against the oracle's autodiff.
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    dt = jax.grad(lambda t: (fused_interp(t, idx, w, variant, 128, True) * g).sum())(tables)
    dt_ref = jax.grad(lambda t: (fused_interp_reference(t, idx, w) * g).sum())(tables)
    gscale = np.max(np.abs(np.asarray(dt_ref))) + 1e-9
    assert np.max(np.abs(np.asarray(dt) - np.asarray(dt_ref))) / gscale < 2e-2


def test_fused_backend_matches_onehot_model_path():
    """apply_decomposition4d(backend='fused') ≡ backend='onehot' — values AND
    table/vector gradients — on a small but hash-colliding config."""
    grid = HashGridConfig(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=7,  # T=128
        base_resolution=4, finest_resolution=16,
    )
    cfg_onehot = Decomposition4DConfig(grid=grid, vectors_finest_resolution=128, backend="onehot")
    cfg_fused = Decomposition4DConfig(
        grid=grid, vectors_finest_resolution=128, backend="fused",
        fused_tile_n=128, fused_interpret=True,
    )
    params = init_decomposition4d(jax.random.PRNGKey(0), cfg_onehot)
    n = 384
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    times = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))

    out_a = np.asarray(apply_decomposition4d(params, xyz, times, cfg_onehot))
    out_b = np.asarray(apply_decomposition4d(params, xyz, times, cfg_fused))
    scale = np.max(np.abs(out_a)) + 1e-9
    assert np.max(np.abs(out_a - out_b)) / scale < 3e-2

    def loss(cfg):
        def f(p):
            return (apply_decomposition4d(p, xyz, times, cfg) ** 2).sum()
        return f

    ga = jax.grad(loss(cfg_onehot))(params)
    gb = jax.grad(loss(cfg_fused))(params)
    for key in ("xyz", "xyt", "yzt", "xzt", "vectors"):
        a, b = np.asarray(ga[key]), np.asarray(gb[key])
        s = np.max(np.abs(a)) + 1e-9
        assert np.max(np.abs(a - b)) / s < 5e-2, key


def test_fused_backend_small_table_fallback():
    """Segments whose table size isn't 128-aligned silently use the onehot
    path under backend='fused' (per-segment hashmap scaling can go tiny)."""
    grid = HashGridConfig(
        n_levels=2, n_features_per_level=2, log2_hashmap_size=5,  # T=32
        base_resolution=4, finest_resolution=8,
    )
    cfg = Decomposition4DConfig(grid=grid, vectors_finest_resolution=64, backend="fused",
                                fused_interpret=True)
    params = init_decomposition4d(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3)).astype(np.float32))
    out = apply_decomposition4d(params, xyz, jnp.zeros((64, 1)), cfg)
    assert np.isfinite(np.asarray(out)).all()
