"""Counter-based RNG (ops/rng.py): range, uniformity, stream decorrelation.

The stochastic-corner estimator (ops/hashgrid.py) and baked-renderer
jitter (rendering_baked.py) assume per-element uniforms in [0, 1) with
means ~0.5 and negligible cross-stream correlation.
"""

import numpy as np
import jax.numpy as jnp

from arnerf_tpu.ops.rng import hash_uniform, hash_uniform3

N = 1 << 16


def test_hash_uniform_range_and_mean():
    idx = jnp.arange(N, dtype=jnp.uint32)
    for stream in (0, 1, 2):
        u = np.asarray(hash_uniform(idx, jnp.uint32(7), stream=stream))
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.var() - 1 / 12) < 2e-3


def test_hash_uniform3_fields():
    """The 11/11/10-bit sliced triple must be uniform per field and
    mutually decorrelated (they share one hash output, not one value)."""
    idx = jnp.arange(N, dtype=jnp.uint32)
    us = [np.asarray(u) for u in hash_uniform3(idx, jnp.uint32(7))]
    for u in us:
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.var() - 1 / 12) < 2e-3
    for a in range(3):
        for b in range(a + 1, 3):
            r = np.corrcoef(us[a], us[b])[0, 1]
            assert abs(r) < 0.02, f"fields {a},{b} correlated: {r}"


def test_hash_uniform3_seed_decorrelation():
    idx = jnp.arange(N, dtype=jnp.uint32)
    a = np.asarray(hash_uniform3(idx, jnp.uint32(1))[0])
    b = np.asarray(hash_uniform3(idx, jnp.uint32(2))[0])
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02
