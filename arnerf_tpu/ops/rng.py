"""Stateless counter-based RNG for per-sample stochastic estimators.

The hot paths that need randomness per (sample, level) — stochastic-corner
hash encoding (ops/hashgrid.py) and stochastic trilerp in the baked renderer
(rendering_baked.py) — draw tens of millions of uniforms per step/frame.
jax.random's threefry costs real device time at that volume and forces key
plumbing through scan/while_loop carries; a counter-based integer hash is a
handful of VPU int ops per element, needs only a scalar seed, and is
deterministic given (seed, element index) — which also keeps recompile-free
step functions (the seed is a traced scalar, not a static).

`hash_u32` is the public-domain "lowbias32" finalizer (Chris Wellons,
nullprogram.com/blog/2018/07/31 — exhaustively searched low-bias avalanche
constants); `uniform_from_u32` maps the top 24 bits to [0, 1) exactly.

This replaces no single reference component: the reference's stochastic
needs are a single per-ray noise draw (reference models/custom_functions.py:83)
at 8192/step, where torch's global RNG is free. The TPU design multiplies
RNG demand by samples x levels, so the generator itself becomes a hot op.
"""

import numpy as np
import jax.numpy as jnp

_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)
_GOLDEN = np.uint32(0x9E3779B9)


def hash_u32(x):
    """lowbias32: uint32 -> well-mixed uint32 (vectorized)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def uniform_from_u32(h):
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits."""
    return (h >> np.uint32(8)).astype(jnp.float32) * np.float32(2.0 ** -24)


def hash_uniform(idx, seed, stream: int = 0):
    """Uniform [0,1) per element of `idx` (any int array), decorrelated
    across `seed` (traced uint32 scalar) and the static `stream` id."""
    # stream offset computed in Python ints (numpy scalar * warns on wrap)
    off = np.uint32((stream * 0x9E3779B9) & 0xFFFFFFFF)
    s = jnp.asarray(seed, jnp.uint32) + off
    return uniform_from_u32(hash_u32(jnp.asarray(idx, jnp.uint32) ^ hash_u32(s)))


def hash_uniform3(idx, seed, stream: int = 0):
    """THREE uniforms per element from ONE hash evaluation, by slicing the
    32 well-mixed output bits into 11/11/10-bit fields. Resolution is
    2^-11 / 2^-10 instead of 2^-24 — fine for rendering-time jitter
    (stochastic trilerp: probability quantization <= 2^-10, far below the
    bake's own int8 color noise) but NOT for training estimators, where
    hash_uniform's 24-bit draws keep corner-probability bias at 3e-8.
    3x fewer hash rows on the baked renderer's per-sample jitter, the
    fine loop's only non-gather elementwise cost."""
    off = np.uint32((stream * 0x9E3779B9) & 0xFFFFFFFF)
    s = jnp.asarray(seed, jnp.uint32) + off
    h = hash_u32(jnp.asarray(idx, jnp.uint32) ^ hash_u32(s))
    u0 = (h & np.uint32(0x7FF)).astype(jnp.float32) * np.float32(2.0 ** -11)
    u1 = ((h >> np.uint32(11)) & np.uint32(0x7FF)).astype(jnp.float32) \
        * np.float32(2.0 ** -11)
    u2 = (h >> np.uint32(22)).astype(jnp.float32) * np.float32(2.0 ** -10)
    return u0, u1, u2
