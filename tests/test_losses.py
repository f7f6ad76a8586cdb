"""Loss semantics vs the reference (`humanrf/utils/loss.py`, `trainer.py:89`).

The BCE gradient at saturation is load-bearing: torch autograd of
`-t·log(p+1e-10) - (1-t)·log(1-p+1e-10)` gives ~1e10 at a fully-opaque ray
with a background target — the restoring force that keeps density from
ratcheting into irreversible opaque saturation. A clip-style guard that
zeroes the gradient there collapses training (measured: every hull point at
the density clamp by step 1k of a 2k-step run).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanrf_tpu.train.losses import bce_loss, huber_loss


def _torch_bce(p, t):
    pc = min(max(p, 0.0), 1.0)
    val = -(t * math.log(pc + 1e-10) + (1 - t) * math.log(1 - pc + 1e-10))
    grad = (-t / (pc + 1e-10) + (1 - t) / (1 - pc + 1e-10)) if 0.0 <= p <= 1.0 else 0.0
    return val, grad


@pytest.mark.parametrize(
    "p,t",
    [(1.0, 0.0), (0.0, 1.0), (0.5, 1.0), (0.999, 0.0), (1.0, 1.0), (0.0, 0.0), (1.5, 0.0), (-0.5, 1.0), (0.3, 0.7)],
)
def test_bce_matches_torch_value_and_gradient(p, t):
    val = float(bce_loss(jnp.float32(p), jnp.float32(t)))
    grad = float(jax.grad(lambda x: bce_loss(x, jnp.float32(t)))(jnp.float32(p)))
    tv, tg = _torch_bce(p, t)
    np.testing.assert_allclose(val, tv, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(grad, tg, rtol=1e-3, atol=1e-6)


def test_bce_saturated_ray_keeps_restoring_gradient():
    """p == 1.0 (fp32-saturated weights_sum), background target: the gradient
    must be the reference's ~1e10 push toward transparent, not 0."""
    g = float(jax.grad(lambda x: bce_loss(x, jnp.float32(0.0)))(jnp.float32(1.0)))
    assert g > 1e9


def test_huber_matches_torch_semantics():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.1, 0.1, 64).astype(np.float32)
    y = rng.uniform(-0.1, 0.1, 64).astype(np.float32)
    got = np.asarray(huber_loss(jnp.asarray(x), jnp.asarray(y), 0.01))
    err = x - y
    expect = np.where(np.abs(err) <= 0.01, 0.5 * err**2, 0.01 * (np.abs(err) - 0.005))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-8)
