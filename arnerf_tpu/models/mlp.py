"""Small bias-free MLPs (the tinycudann "FullyFusedMLP" replacement).

The reference's networks are tcnn FullyFusedMLPs (reference:
models/networks.py:50-56, 68-78): bias-free 64-wide ReLU stacks. On TPU
these are tiny matmuls that XLA maps straight onto the MXU and fuses with
the surrounding elementwise work — a hand-fused kernel buys nothing at
64-wide, so this is deliberately plain jnp.

Compute dtype note: params are fp32; matmuls request fp32 accumulation via
preferred_element_type when inputs are ever cast to bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np


def mlp_init(key, in_dim: int, hidden: int, out_dim: int, n_hidden: int):
    """He-uniform init of a bias-free MLP: in -> [hidden]*n_hidden -> out."""
    dims = [in_dim] + [hidden] * n_hidden + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, din, dout in zip(keys, dims[:-1], dims[1:]):
        bound = float(np.sqrt(6.0 / din))
        layers.append(jax.random.uniform(k, (din, dout), jnp.float32,
                                         minval=-bound, maxval=bound))
    return layers


def mlp_apply(layers, x, out_activation=None, dtype=jnp.float32):
    """ReLU between layers; optional output activation ('sigmoid' or None).
    `dtype` is the matmul compute type (bf16 for MXU speed); accumulation is
    always fp32 via preferred_element_type and the result is cast back."""
    h = x.astype(dtype)
    for i, w in enumerate(layers):
        h = jnp.dot(h, w.astype(dtype), preferred_element_type=jnp.float32)
        if i < len(layers) - 1:
            h = jax.nn.relu(h).astype(dtype)
    if out_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h.astype(jnp.float32)
