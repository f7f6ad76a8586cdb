"""Numerically-safe activations.

`truncated_exp` matches the reference's semantics
(`/root/reference/humanrf/utils/activation.py:6-36`): forward is exp(x); the
backward clamps the *input* to [-15, 15] before computing the gradient, which
prevents density-gradient explosions early in training. Computed in fp32
(the reference wraps it in an fp32 autocast island; here we cast explicitly).

One intentional divergence: the forward input is clamped at +16. An
*unclamped* forward overflows fp32 once the density logit crosses ~88.7, and
the resulting inf turns into NaN at the first zero-width render interval
(inf·0); that NaN regime is persistent — every batch hits the saturated
surface — so skip-on-nonfinite protection alone only stalls training
(observed: logits drift past 88 at 2k steps on the high-detail synthetic
scene and every parameter NaN'd). The clamp value matters too: alpha
saturates (== 1.0 in fp32) at sigma·dt ≳ 17, after which ∂alpha/∂σ
underflows and gradient descent can no longer pull a wrongly-opaque region
back — a ratchet whose depth is however far past saturation the logit is
allowed to drift. +16 keeps exp ≥ e16 ≈ 8.9e6 (×100 density_scale ≈ 9e8:
~5 orders of magnitude past alpha saturation at the 4e-4 render step, so the
clamp is invisible to rendering) while leaving a saturated logit only a few
reference-scale gradient steps (backward clamps input to ±15) from the
responsive regime.
"""
import jax
import jax.numpy as jnp

# exp(16) ≈ 8.9e6: far past alpha saturation, close enough to recover from.
_FWD_CLAMP = 16.0


@jax.custom_vjp
def truncated_exp(x):
    return jnp.exp(jnp.minimum(x, _FWD_CLAMP))


def _truncated_exp_fwd(x):
    return truncated_exp(x), x


def _truncated_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


truncated_exp.defvjp(_truncated_exp_fwd, _truncated_exp_bwd)
