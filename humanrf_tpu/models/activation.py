"""Numerically-safe activations.

`truncated_exp` matches the reference's semantics
(`/root/reference/humanrf/utils/activation.py:6-36`): forward is exp(x); the
backward clamps the *input* to [-15, 15] before computing the gradient, which
prevents density-gradient explosions early in training. Computed in fp32
(the reference wraps it in an fp32 autocast island; here we cast explicitly).
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def truncated_exp(x):
    return jnp.exp(x)


def _truncated_exp_fwd(x):
    return jnp.exp(x), x


def _truncated_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


truncated_exp.defvjp(_truncated_exp_fwd, _truncated_exp_bwd)
