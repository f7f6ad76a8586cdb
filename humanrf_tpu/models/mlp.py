"""Small bias-free MLPs on the MXU.

Replaces tcnn's `FullyFusedMLP` (sigma and color networks of the reference,
`/root/reference/humanrf/scene_representation/humanrf.py:123-156`). On TPU
there is no need for a hand-fused kernel: these are plain batched matmuls that
XLA fuses with the surrounding elementwise ops. Architecture parity is kept
exactly (bias-free layers, ReLU hidden activations, configurable output
activation, n_neurons wide). Parameters are stored fp32; compute runs in
bfloat16 with fp32 accumulation (`preferred_element_type`), the TPU analog of
the reference's fp16-autocast (SURVEY.md §5, mixed precision).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def init_mlp(
    rng: jax.Array,
    n_input_dims: int,
    n_output_dims: int,
    n_neurons: int,
    n_hidden_layers: int,
) -> Dict[str, jax.Array]:
    """He-normal init over [in → hidden*n → out], all bias-free."""
    dims = [n_input_dims] + [n_neurons] * n_hidden_layers + [n_output_dims]
    params = {}
    keys = jax.random.split(rng, len(dims) - 1)
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        std = (2.0 / din) ** 0.5
        params[f"w{i}"] = std * jax.random.normal(keys[i], (din, dout), dtype=jnp.float32)
    return params


def apply_mlp(
    params: Dict[str, jax.Array],
    x: jax.Array,
    output_activation: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x: (N, n_input_dims) → (N, n_output_dims), returned in fp32."""
    h = x.astype(compute_dtype)
    n_layers = len(params)
    for i in range(n_layers):
        w = params[f"w{i}"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
        h = h.astype(compute_dtype)
    h = h.astype(jnp.float32)
    if output_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif output_activation is not None:
        raise ValueError(f"Unknown output activation: {output_activation}")
    return h
