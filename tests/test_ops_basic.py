"""Unit tests for morton / packbits / intersection / trunc_exp / sh ops
against independent NumPy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.ops import (
    morton3d, morton3d_invert, packbits, unpackbits,
    ray_aabb_intersect, ray_sphere_intersect, trunc_exp, sh_encode,
)
from arnerf_tpu.ops.intersection import ray_aabb_intersect_single


def np_morton3d(coords):
    out = np.zeros(len(coords), dtype=np.int64)
    for n, (x, y, z) in enumerate(coords):
        code = 0
        for b in range(10):
            code |= ((int(x) >> b) & 1) << (3 * b)
            code |= ((int(y) >> b) & 1) << (3 * b + 1)
            code |= ((int(z) >> b) & 1) << (3 * b + 2)
        out[n] = code
    return out


def test_morton_roundtrip_and_reference():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, size=(500, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    assert np.array_equal(codes, np_morton3d(coords))
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    assert np.array_equal(back, coords)


def test_packbits_matches_numpy():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(2, 128 * 8)).astype(np.float32)
    thr = 0.1
    packed = np.asarray(packbits(jnp.asarray(grid), thr))
    expected = np.packbits((grid > thr).astype(np.uint8),
                           axis=-1, bitorder="little")
    assert np.array_equal(packed, expected)
    bits = np.asarray(unpackbits(jnp.asarray(packed)))
    assert np.array_equal(bits, (grid > thr).astype(np.uint8))


def test_ray_aabb_single():
    rays_o = jnp.asarray([[0.0, 0.0, -2.0],   # outside, hits
                          [0.0, 0.0, 0.0],    # inside
                          [0.0, 2.0, -2.0]])  # misses
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    hits = np.asarray(ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5)))
    assert np.allclose(hits[0], [1.5, 2.5], atol=1e-6)
    assert np.allclose(hits[1], [0.0, 0.5], atol=1e-6)  # t1 clamped to 0
    assert np.allclose(hits[2], [-1.0, -1.0])


def test_ray_aabb_multi_sorted():
    # two boxes along +z; ray should list the nearer one first
    centers = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.0]])
    half = jnp.full((2, 3), 0.4)
    rays_o = jnp.asarray([[0.0, 0.0, -1.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    cnt, hits_t, idx = ray_aabb_intersect(rays_o, rays_d, centers, half, 2)
    assert int(cnt[0]) == 2
    assert int(idx[0, 0]) == 1 and int(idx[0, 1]) == 0
    assert hits_t[0, 0, 0] < hits_t[0, 1, 0]


def test_ray_sphere():
    centers = jnp.asarray([[0.0, 0.0, 2.0]])
    radii = jnp.asarray([1.0])
    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    cnt, hits_t, idx = ray_sphere_intersect(rays_o, rays_d, centers, radii, 1)
    assert int(cnt[0]) == 1
    assert np.allclose(np.asarray(hits_t[0, 0]), [1.0, 3.0], atol=1e-5)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.asarray([-20.0, -1.0, 0.0, 3.0, 20.0])
    assert np.allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    assert np.allclose(np.asarray(g), expected, rtol=1e-5)


def test_sh_orthonormality():
    """Real SH basis: E_sphere[Y_i Y_j] = delta_ij / (4 pi)."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=(50000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(v, dtype=jnp.float32)))
    G = (Y.T @ Y) / len(v) * 4 * np.pi
    assert np.allclose(G, np.eye(16), atol=0.08)


def test_sh_matches_tcnn_constants():
    # spot-check a direction against hand-evaluated basis values
    d = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    Y = np.asarray(sh_encode(jnp.asarray(d[None])))[0]
    assert np.isclose(Y[0], 0.28209479177387814)
    assert np.isclose(Y[2], 0.48860251190291987)          # z term
    assert np.isclose(Y[6], 0.94617469575755997 - 0.31539156525251999)
    assert np.isclose(Y[12], 0.3731763325901154 * 2.0)    # z*(5z^2-3) at z=1


def test_small_table_lookup_exact():
    """Lane-packed tiny-table lookup == plain gather, all sizes/edges."""
    import numpy as np
    from arnerf_tpu.ops.marching import small_table_lookup
    rng = np.random.default_rng(0)
    for T in (1, 31, 32, 33, 4096, 4097, 16384):
        table = (rng.random(T) < 0.3).astype(np.uint8)
        idx = rng.integers(0, T, size=(1000,)).astype(np.int32)
        got = np.asarray(small_table_lookup(jnp.asarray(table),
                                            jnp.asarray(idx)))
        want = table[idx] > 0
        assert (got == want).all(), T
    # 2-D index shapes survive the round trip
    table = (rng.random(4096) < 0.5).astype(np.uint8)
    idx = rng.integers(0, 4096, size=(64, 129)).astype(np.int32)
    got = np.asarray(small_table_lookup(jnp.asarray(table),
                                        jnp.asarray(idx)))
    assert got.shape == (64, 129) and (got == (table[idx] > 0)).all()
