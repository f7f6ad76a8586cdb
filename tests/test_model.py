"""HumanRF model-level unit tests (shapes, routing, activations, SH)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanrf_tpu.models.activation import truncated_exp
from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
from humanrf_tpu.models.mlp import apply_mlp, init_mlp
from humanrf_tpu.models.sh import sh_encode


def _model(segment_sizes=(2,), frames=(0, 1), cam_emb=0):
    return HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=frames,
            segment_sizes=segment_sizes,
            log2_hashmap_size=8,
            n_levels=2,
            finest_resolution=32,
            camera_embedding_dim=cam_emb,
        )
    )


def test_density_and_forward_shapes():
    model = _model(cam_emb=2)
    params = model.init_params(jax.random.PRNGKey(0))
    n = 128
    pos = jnp.zeros((n, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    frames = jnp.zeros((n,), jnp.int32)
    cams = jnp.zeros((n,), jnp.int32)

    density, geo = model.density(params, pos, frames)
    assert density.shape == (n,) and geo.shape == (n, 15)
    assert bool((density >= 0).all())  # truncated_exp * density_scale ≥ 0

    d2, radiance = model.forward(params, pos, dirs, frames, cams, is_training=True)
    assert radiance.shape == (n, 3)
    assert bool((radiance >= 0).all() and (radiance <= 1).all())  # sigmoid

    # Eval mode zeroes camera embeddings (humanrf.py:196-204): changing camera
    # numbers must not change eval radiance.
    _, r_eval_a = model.forward(params, pos, dirs, frames, cams, is_training=False)
    _, r_eval_b = model.forward(params, pos, dirs, frames, cams + 5, is_training=False)
    np.testing.assert_allclose(np.asarray(r_eval_a), np.asarray(r_eval_b))
    # Training mode with different cameras DOES differ.
    _, r_tr_b = model.forward(params, pos, dirs, frames, cams + 5, is_training=True)
    assert not np.allclose(np.asarray(radiance), np.asarray(r_tr_b))


def test_segment_routing():
    """Frames must route to their own segment's grids (humanrf.py:158-186)."""
    model = _model(segment_sizes=(2, 2), frames=(0, 1, 2, 3))
    params = model.init_params(jax.random.PRNGKey(0))
    # Make segment 1's tables wildly different.
    params["segments"][1] = jax.tree_util.tree_map(lambda p: p + 10.0, params["segments"][1])

    pos = jnp.zeros((128, 3))
    f_seg0 = model.features(params, pos, jnp.full((128,), 0, jnp.int32))
    f_seg1 = model.features(params, pos, jnp.full((128,), 2, jnp.int32))
    assert not np.allclose(np.asarray(f_seg0), np.asarray(f_seg1))

    # Mixed batch: each half must match its pure-segment value.
    frames = jnp.concatenate([jnp.zeros(64, jnp.int32), jnp.full((64,), 2, jnp.int32)])
    f_mixed = model.features(params, pos, frames)
    np.testing.assert_allclose(np.asarray(f_mixed[:64]), np.asarray(f_seg0[:64]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_mixed[64:]), np.asarray(f_seg1[64:]), rtol=1e-5)


def test_segment_skip_gradients():
    """The lax.cond segment skip (humanrf.py features/proposal_density) must be
    gradient-identical to the masked sum: segments with no samples in the batch
    get exact-zero grads, and active segments get the same grads they would in
    a mixed batch (their samples' contributions are independent of the rest)."""
    model = _model(segment_sizes=(2, 2), frames=(0, 1, 2, 3))
    params = model.init_params(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-0.5, maxval=0.5)

    @jax.jit
    def grads_single(p):
        return jax.grad(lambda q: model.features(q, pos, jnp.zeros(128, jnp.int32)).sum())(p)

    g_single = grads_single(params)
    # Inactive segment: the skipped cond branch yields exact zeros.
    assert all(
        not np.asarray(x).any() for x in jax.tree_util.tree_leaves(g_single["segments"][1])
    )

    # Active segment: same grads as the segment-0 half of a mixed batch.
    pos_mixed = jnp.concatenate([pos, pos])
    frames_mixed = jnp.concatenate([jnp.zeros(128, jnp.int32), jnp.full((128,), 2, jnp.int32)])

    @jax.jit
    def grads_mixed(p):
        return jax.grad(lambda q: model.features(q, pos_mixed, frames_mixed).sum())(p)

    g_mixed = grads_mixed(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_single["segments"][0]),
        jax.tree_util.tree_leaves(g_mixed["segments"][0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_segment_hashmap_scaling():
    """Per-segment hashmap size scales with segment length (humanrf.py:106-120)."""
    model = _model(segment_sizes=(50,), frames=tuple(range(50)))
    # 50/100 · 2^8 → 2^7.
    assert model.segment_grid_configs[0].grid.log2_hashmap_size == 7


def test_truncated_exp_gradient_clamp():
    # Backward clamps the input to ±15 (reference activation.py:6-36).
    g = jax.grad(lambda x: truncated_exp(x))(20.0)
    assert np.isfinite(g) and g == pytest.approx(np.exp(15.0))
    # Forward matches exp() throughout the responsive range...
    v = truncated_exp(jnp.asarray(14.0))
    assert v == pytest.approx(np.exp(14.0), rel=1e-5)
    # ...and clamps at +16 (5 decades past alpha saturation) so a saturated
    # logit stays fp32-finite and a few gradient steps from recovery
    # (models/activation.py — the round-2b ratchet analysis).
    v = truncated_exp(jnp.asarray(20.0))
    assert v == pytest.approx(np.exp(16.0), rel=1e-5)
    assert np.isfinite(float(truncated_exp(jnp.asarray(1e6))))


def test_sh_encode_properties():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = sh_encode((d + 1) * 0.5, degree=4)
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.28209479, rtol=1e-5)  # l=0 constant
    # l=1 terms are ∝ (−y, z, −x).
    np.testing.assert_allclose(np.asarray(out[0, 1:4]), [0.0, 0.48860252, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, 1:4]), [0.0, 0.0, -0.48860252], atol=1e-6)


def test_mlp_bias_free_and_widths():
    params = init_mlp(jax.random.PRNGKey(0), 32, 16, 64, 1)
    assert set(params) == {"w0", "w1"}  # no biases, 1 hidden
    assert params["w0"].shape == (32, 64) and params["w1"].shape == (64, 16)
    out = apply_mlp(params, jnp.zeros((8, 32)))
    np.testing.assert_allclose(np.asarray(out), 0.0)  # bias-free ⇒ f(0) = 0
    out_sig = apply_mlp(params, jnp.zeros((8, 32)), output_activation="sigmoid")
    np.testing.assert_allclose(np.asarray(out_sig), 0.5)


def test_query_io_entry_point():
    """The reference-shaped QueryInput/QueryOutput API (query_io.py:6-20) must
    dispatch to density (no directions) and forward (with directions)."""
    from humanrf_tpu.models.humanrf import QueryInput

    model = _model(cam_emb=2)
    params = model.init_params(jax.random.PRNGKey(0))
    n = 128
    pos = jnp.zeros((n, 3))
    frames = jnp.zeros((n,), dtype=jnp.int32)

    out_d = model.query(params, QueryInput(positions=pos, frame_numbers=frames))
    assert out_d.density.shape == (n,) and out_d.radiance is None
    assert out_d.geometry_features.shape == (n, model.config.geometry_feature_dim)

    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    cams = jnp.zeros((n,), dtype=jnp.int32)
    out_f = model.query(
        params, QueryInput(positions=pos, frame_numbers=frames, directions=dirs, camera_numbers=cams, is_training=True)
    )
    assert out_f.radiance.shape == (n, 3)
    np.testing.assert_allclose(np.asarray(out_f.density), np.asarray(out_d.density), rtol=1e-6)


def test_proposal_density_shapes_and_routing():
    import dataclasses

    base = _model(segment_sizes=(1, 1), frames=(0, 1))
    model = HumanRFModel(dataclasses.replace(base.config, proposal_rank=4, proposal_resolution=16))
    params = model.init_params(jax.random.PRNGKey(0))
    assert len(params["proposal"]) == 2
    pos = jnp.zeros((64, 3))
    sigma0 = model.proposal_density(params, pos, jnp.zeros(64, dtype=jnp.int32))
    sigma1 = model.proposal_density(params, pos, jnp.ones(64, dtype=jnp.int32))
    assert sigma0.shape == (64,) and bool(jnp.isfinite(sigma0).all())
    # Different segments own independent factors → different densities.
    assert not np.allclose(np.asarray(sigma0), np.asarray(sigma1))
