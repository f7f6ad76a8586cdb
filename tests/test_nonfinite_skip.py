"""GradScaler-parity: a batch whose gradients contain inf/NaN must be SKIPPED
(params unchanged) rather than poisoning the parameters — the reference's
`scaler.step()` does exactly this (trainer.py:250-252), and the quality sweep
reproduced the failure it prevents: one overflowing density batch turned every
parameter NaN between checkpoints."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.train.pipeline import make_train_step
from humanrf_tpu.train.trainer import make_optimizer

from test_parallel import _tiny_setup


def test_nonfinite_grads_skip_the_update():
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup()
    opt = make_optimizer(1e-2, 0.5, 100)
    step = make_train_step(cfg, model, opt, 16, 16)
    opt_state = opt.init(params)

    # Sabotage one feature-table entry with NaN: every sample touching it
    # yields NaN features -> NaN loss -> NaN gradients for ALL params (what an
    # fp32 exp overflow does mid-training, just deterministic).
    bad = jax.tree_util.tree_map(jnp.copy, params)
    bad["segments"][0]["vectors"] = bad["segments"][0]["vectors"].at[:].set(jnp.nan)

    p2, opt_state2, loss, aux = step(
        jax.tree_util.tree_map(jnp.copy, bad), opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(0)
    )
    assert not np.isfinite(float(loss))  # the batch itself is bad...
    flat_bad = dict(jax.tree_util.tree_leaves_with_path(bad))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p2):
        # ...but the update is skipped bitwise: every param (including the
        # sabotaged leaf) is exactly its input value, never NaN-poisoned.
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_bad[path]))

    # A saturated density head (logit >> 88, which would overflow fp32 exp
    # without truncated_exp's forward clamp) must yield a FINITE loss and
    # finite gradients — a persistently-saturated field should keep training,
    # not stall in a NaN regime (the observed 2k-step divergence mode).
    hot = jax.tree_util.tree_map(jnp.copy, params)
    hot["sigma_net"]["w0"] = hot["sigma_net"]["w0"] + 1e4
    p_hot, _, loss_hot, _ = step(
        jax.tree_util.tree_map(jnp.copy, hot), opt.init(hot), batch, pool, grids, aabb, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss_hot))
    for leaf in jax.tree_util.tree_leaves(p_hot):
        assert np.isfinite(np.asarray(leaf)).all()

    # Healthy batches still step normally through the same optimizer.
    p3, _, loss3, _ = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss3))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p3), jax.tree_util.tree_leaves(params))
    )
    assert changed, "finite-grad step must update params"
