"""Training losses, matching the reference exactly.

- Huber (δ=0.01, mean) photometric loss  — `humanrf/trainer.py:89`
- Manual autocast-safe BCE mask loss     — `humanrf/utils/loss.py:4-10`
"""
import jax
import jax.numpy as jnp


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.01) -> jnp.ndarray:
    """Elementwise Huber with torch.nn.HuberLoss semantics."""
    err = pred - target
    abs_err = jnp.abs(err)
    quadratic = 0.5 * err * err
    linear = delta * (abs_err - 0.5 * delta)
    return jnp.where(abs_err <= delta, quadratic, linear)


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with the reference's clamp + 1e-10 guard.

    Guarded via clip rather than the reference's `log(x + 1e-10)`: XLA on TPU
    reassociates `1 - p + 1e-10` into `(1 + 1e-10) - p` == `1 - p` in fp32,
    which yields log(0) = -inf for fully-saturated rays. clip cannot be folded.
    """
    p = jnp.clip(pred, 0.0, 1.0)
    return -(
        target * jnp.log(jnp.clip(p, 1e-10, 1.0))
        + (1.0 - target) * jnp.log(jnp.clip(1.0 - p, 1e-10, 1.0))
    )


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis_name: str | None = None) -> jnp.ndarray:
    """Elementwise mean over rows where mask is True — the static-shape analog
    of the reference's mean over a dynamically-compacted ray batch.

    With `axis_name` (inside shard_map), numerator and denominator are psum'd
    over the mesh so the mean is global while gradients stay per-shard.
    """
    elems_per_row = values.size // values.shape[0]
    m = mask.reshape(mask.shape[0], *([1] * (values.ndim - 1))).astype(values.dtype)
    num = (values * m).sum()
    den = mask.astype(values.dtype).sum() * elems_per_row
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)
