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


@jax.custom_vjp
def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy matching the reference's
    `clamp(p, 0, 1)` + `log(x + 1e-10)` semantics — value AND gradient
    (`/root/reference/humanrf/utils/loss.py:4-10`).

    The forward value guards the logs via clip because XLA on TPU
    reassociates `1 - p + 1e-10` into `(1 + 1e-10) - p` == `1 - p` in fp32
    (log(0) = -inf at p=1); the backward supplies torch's exact gradient via
    custom_vjp (see `_bce_bwd` for why that gradient's magnitude at
    saturation is load-bearing).
    """
    p = jnp.clip(pred, 0.0, 1.0)
    return -(
        target * jnp.log(jnp.clip(p, 1e-10, 1.0))
        + (1.0 - target) * jnp.log(jnp.clip(1.0 - p, 1e-10, 1.0))
    )


def _bce_fwd(pred, target):
    return bce_loss(pred, target), (pred, target)


def _bce_bwd(res, g):
    pred, target = res
    # The torch-autograd gradient of `-t·log(p+1e-10) - (1-t)·log(1-p+1e-10)`
    # after clamp(p, 0, 1), with the +1e-10 guard folded into the denominators
    # so XLA cannot reassociate it away:
    #     dL/dp = -t/(p+1e-10) + (1-t)/(1-p+1e-10),  0 outside [0, 1]
    # At a fully-saturated ray (p == 1.0 in fp32, target 0) this is ~1e10 —
    # the restoring force that stops density from ratcheting into opaque
    # saturation. A clip-guard in the backward (gradient 0 once 1-p
    # underflows) removes exactly that force; measured field collapse: every
    # hull point at the density clamp by step 1k of a 2k-step run.
    p = jnp.clip(pred, 0.0, 1.0)
    grad_p = -target / jnp.maximum(p, 1e-10) + (1.0 - target) / jnp.maximum(1.0 - p, 1e-10)
    grad_p = jnp.where((pred >= 0.0) & (pred <= 1.0), grad_p, 0.0)
    return g * grad_p, None


bce_loss.defvjp(_bce_fwd, _bce_bwd)


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
