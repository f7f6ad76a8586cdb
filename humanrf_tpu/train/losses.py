"""Training losses, matching the reference exactly.

- Huber (δ=0.01, mean) photometric loss  — `humanrf/trainer.py:89`
- Manual autocast-safe BCE mask loss     — `humanrf/utils/loss.py:4-10`
"""
import jax.numpy as jnp


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.01) -> jnp.ndarray:
    """Elementwise Huber with torch.nn.HuberLoss semantics."""
    err = pred - target
    abs_err = jnp.abs(err)
    quadratic = 0.5 * err * err
    linear = delta * (abs_err - 0.5 * delta)
    return jnp.where(abs_err <= delta, quadratic, linear)


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with the reference's clamp + 1e-10 guard."""
    p = jnp.clip(pred, 0.0, 1.0)
    return -(target * jnp.log(p + 1e-10) + (1.0 - target) * jnp.log(1.0 - p + 1e-10))


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Elementwise mean over rows where mask is True — the static-shape analog
    of the reference's mean over a dynamically-compacted ray batch."""
    elems_per_row = values.size // values.shape[0]
    m = mask.reshape(mask.shape[0], *([1] * (values.ndim - 1))).astype(values.dtype)
    num = (values * m).sum()
    den = jnp.maximum(mask.astype(values.dtype).sum() * elems_per_row, 1.0)
    return num / den
