"""Truncated-gradient exponential.

Forward is exp(x); the backward clamps x to [-15, 15] before exponentiating,
preventing gradient explosion from large densities. Matches the reference's
`TruncExp` autograd Function (reference: models/custom_functions.py:162-173).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
