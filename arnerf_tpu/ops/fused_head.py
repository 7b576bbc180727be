"""Fused NGP field head as a Pallas TPU kernel.

TPU-native equivalent of tinycudann's FullyFusedMLP pair (reference:
models/networks.py:50-56 sigma net, :68-78 rgb net): one kernel evaluates
  h    = (feats @ W0).relu @ W1                    (sigma features, 32->64->16)
  rgb~ = ((sh @ V0a + h @ V0b).relu @ V1).relu @ V2  (rgb head, 32->64->64->3)
per sample block with every weight matrix and every intermediate activation
resident in VMEM. Output activations (TruncExp / sigmoid / HDR variants)
stay outside (elementwise, XLA fuses them into the consumer).

Why fuse: the MLPs' FLOPs are negligible (64-wide), but XLA materializes
each layer's activations to HBM ((N,64)+(N,64)+(N,16)+concat per forward —
~0.25 GB/step round-trip at the training batch). In a memory-bound step
that traffic is the cost; this kernel's HBM footprint is exactly its inputs
(N,32)+(N,16) and outputs (N,16)+(N,3).

The rgb net's input concat([sh, h]) is computed as a split matmul
(sh @ V0[:16] + h @ V0[16:]) — same math, no lane-concat inside the kernel.

Note on the hash-grid gather itself: Mosaic's gather lowering in this
toolchain (jax 0.9.0, lowering.py _gather_lowering_rule) supports ONLY
column-batched take_along_axis — an arbitrary-index gather from a shared
VMEM table is not expressible, so the encoder's table gathers stay on XLA's
HBM gather engine (measured stream-bound, i.e. already at the memory-system
limit). The fused head is where kernel work actually buys bytes.

Training uses a custom_vjp whose backward recomputes the tiny intermediates
in plain XLA (correctness first; a Pallas backward can slot in later).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 2048


def _head_kernel(feats_ref, sh_ref, w0_ref, w1_ref, v0a_ref, v0b_ref,
                 v1_ref, v2_ref, h_ref, rgb_ref, *, dtype):
    f32 = jnp.float32
    feats = feats_ref[:].astype(dtype)
    h1 = jax.nn.relu(
        jnp.dot(feats, w0_ref[:].astype(dtype),
                preferred_element_type=f32)).astype(dtype)
    h = jnp.dot(h1, w1_ref[:].astype(dtype), preferred_element_type=f32)
    h_ref[:] = h.astype(f32)

    sh = sh_ref[:].astype(dtype)
    rin = (jnp.dot(sh, v0a_ref[:].astype(dtype), preferred_element_type=f32)
           + jnp.dot(h.astype(dtype), v0b_ref[:].astype(dtype),
                     preferred_element_type=f32))
    r1 = jax.nn.relu(rin).astype(dtype)
    r2 = jax.nn.relu(
        jnp.dot(r1, v1_ref[:].astype(dtype),
                preferred_element_type=f32)).astype(dtype)
    rgb_ref[:] = jnp.dot(r2, v2_ref[:].astype(dtype),
                         preferred_element_type=f32).astype(f32)


def _head_pallas(feats, sh, weights, *, dtype, interpret):
    n = feats.shape[0]
    w0, w1, v0, v1, v2 = weights
    n_sh = sh.shape[1]
    v0a, v0b = v0[:n_sh], v0[n_sh:]
    n_pad = (-n) % BLOCK_N
    if n_pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n_pad, feats.shape[1]), feats.dtype)])
        sh = jnp.concatenate([sh, jnp.zeros((n_pad, sh.shape[1]), sh.dtype)])
    grid = (feats.shape[0] // BLOCK_N,)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)  # weights: whole-array, VMEM-resident
    h, rgb = pl.pallas_call(
        partial(_head_kernel, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, feats.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, sh.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_N, w1.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, v2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((feats.shape[0], w1.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((feats.shape[0], v2.shape[1]), jnp.float32),
        ),
        interpret=interpret,
    )(feats, sh, w0, w1, v0a, v0b, v1, v2)
    return h[:n], rgb[:n]


def _head_xla(feats, sh, weights, *, dtype):
    """Reference XLA evaluation (same math; used for backward + fallback)."""
    f32 = jnp.float32
    w0, w1, v0, v1, v2 = [w.astype(dtype) for w in weights]
    h1 = jax.nn.relu(jnp.dot(feats.astype(dtype), w0,
                             preferred_element_type=f32)).astype(dtype)
    h = jnp.dot(h1, w1, preferred_element_type=f32)
    rin = jnp.concatenate([sh.astype(dtype), h.astype(dtype)], axis=-1)
    r1 = jax.nn.relu(jnp.dot(rin, v0, preferred_element_type=f32)).astype(dtype)
    r2 = jax.nn.relu(jnp.dot(r1, v1, preferred_element_type=f32)).astype(dtype)
    rgb = jnp.dot(r2, v2, preferred_element_type=f32)
    return h, rgb


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_field_head(feats, sh, weights, dtype=jnp.bfloat16,
                     interpret: bool = False):
    """feats (N,32), sh (N,16), weights (W0,W1,V0,V1,V2) ->
    (h (N,16) raw sigma-net output, rgb (N,3) raw rgb-net output)."""
    return _head_pallas(feats, sh, weights, dtype=dtype, interpret=interpret)


def _fwd(feats, sh, weights, dtype, interpret):
    out = _head_pallas(feats, sh, weights, dtype=dtype, interpret=interpret)
    return out, (feats, sh, weights)


def _bwd(dtype, interpret, res, g):
    feats, sh, weights = res
    # recompute-in-backward via the XLA formulation; autodiff through it
    _, vjp = jax.vjp(lambda f, s, w: _head_xla(f, s, w, dtype=dtype),
                     feats, sh, weights)
    return vjp(g)


fused_field_head.defvjp(_fwd, _bwd)


def head_weights_from_params(params):
    """(sigma_mlp [W0,W1], rgb_mlp [V0,V1,V2]) -> kernel weight tuple."""
    return (params["sigma_mlp"][0], params["sigma_mlp"][1],
            params["rgb_mlp"][0], params["rgb_mlp"][1],
            params["rgb_mlp"][2])
