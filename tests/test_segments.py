"""Scatter-free dense segment reductions vs exact scatter references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.ops.segments import dense_segment_sum, dense_segment_max


@pytest.mark.parametrize("M,T,F", [(1000, 97, 2), (50_000, 4096, 2),
                                   (10_000, 33, 1), (257, 300, 3)])
def test_segment_sum_matches_scatter(M, T, F):
    k = jax.random.PRNGKey(M + T)
    idx = jax.random.randint(k, (M,), 0, T, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (M, F), jnp.float32)
    ref = np.zeros((T, F), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(vals, np.float64))
    out = dense_segment_sum(idx, vals, T, method="sort")
    assert out.shape == (T, F)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_segment_sum_empty_rows_and_all_one_row():
    # every update on one row; all other rows exactly zero
    M, T = 10_000, 256
    idx = jnp.full((M,), 17, jnp.int32)
    vals = jnp.ones((M, 2), jnp.float32)
    out = dense_segment_sum(idx, vals, T, method="sort")
    assert float(out[17, 0]) == pytest.approx(M, rel=1e-6)
    out0 = out.at[17].set(0.0)
    assert float(jnp.max(jnp.abs(out0))) == 0.0


def test_segment_sum_ngp_magnitudes():
    """Training-like magnitudes: tiny grads, heavy collisions — the fp32
    cumsum's cancellation error must stay far below gradient scale."""
    M, T = 2_000_000, 100_000
    k = jax.random.PRNGKey(0)
    idx = jax.random.randint(k, (M,), 0, T, jnp.int32)
    vals = 1e-2 * jax.random.normal(jax.random.PRNGKey(1), (M, 2), jnp.float32)
    ref = np.zeros((T, 2), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(vals, np.float64))
    out = dense_segment_sum(idx, vals, T, method="sort")
    err = np.max(np.abs(np.asarray(out, np.float64) - ref))
    scale = np.max(np.abs(ref))
    assert err < 1e-3 * max(scale, 1.0), (err, scale)


@pytest.mark.parametrize("M,T", [(1000, 97), (50_000, 4096), (33, 1000)])
def test_segment_max_matches_scatter(M, T):
    k = jax.random.PRNGKey(M)
    idx = jax.random.randint(k, (M,), 0, T, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(2), (M,), jnp.float32)
    ref = np.full((T,), -5.0, np.float32)
    np.maximum.at(ref, np.asarray(idx), np.asarray(vals))
    out = dense_segment_max(idx, vals, T, fill=-5.0, method="sort")
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)


def test_segment_max_empty_rows_get_fill():
    idx = jnp.asarray([3, 3, 7], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, -1.0], jnp.float32)
    out = dense_segment_max(idx, vals, 10, fill=0.25, method="sort")
    expect = np.full(10, 0.25, np.float32)
    expect[3], expect[7] = 2.0, -1.0
    np.testing.assert_allclose(np.asarray(out), expect)


def test_segment_ops_jit_and_grad_free():
    # jit-compatible with static num_rows
    f = jax.jit(lambda i, v: dense_segment_sum(i, v, 64, method="sort"))
    i = jnp.arange(128, dtype=jnp.int32) % 64
    v = jnp.ones((128, 2))
    np.testing.assert_allclose(np.asarray(f(i, v)), np.full((64, 2), 2.0))


def test_batched_segment_sum_matches_scatter():
    from arnerf_tpu.ops.segments import dense_segment_sum_batched
    L, M, F = 4, 20_000, 2
    sizes = (64, 512, 4096, 4096)
    k = jax.random.PRNGKey(0)
    idx = jnp.stack([jax.random.randint(jax.random.PRNGKey(l), (M,), 0,
                                        sizes[l], jnp.int32)
                     for l in range(L)])
    vals = jax.random.normal(k, (L, M, F), jnp.float32)
    cols = tuple(vals[:, :, j] for j in range(F))
    a = dense_segment_sum_batched(idx, cols, sizes, method="sort",
                                  pack=False)
    b = dense_segment_sum_batched(idx, cols, sizes, method="scatter")
    assert a.shape == (sum(sizes), F)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-3, rtol=1e-4)
    # unstable sorts only permute the fp32 accumulation order
    u = dense_segment_sum_batched(idx, cols, sizes, method="sort",
                                  pack=False, stable=False)
    np.testing.assert_allclose(np.asarray(u), np.asarray(b),
                               atol=2e-3, rtol=1e-4)


def test_batched_segment_sum_packed_lane():
    """pack=True (production stoch-backward default): bf16 value packing
    into the sort's int32 lane. Exactly-representable values -> exact row
    sums; normal values -> bf16-update-rounding error envelope
    (~0.4% relative per update, sqrt-accumulating per row)."""
    from arnerf_tpu.ops.segments import dense_segment_sum_batched
    L, M = 3, 50_000
    sizes = (64, 2048, 65_536)
    idx = jnp.stack([jax.random.randint(jax.random.PRNGKey(l), (M,), 0,
                                        sizes[l], jnp.int32)
                     for l in range(L)])
    # bf16-exact values: small integers scaled by a power of two
    vals_e = (jax.random.randint(jax.random.PRNGKey(9), (L, M, 2), -8, 9,
                                 jnp.int32).astype(jnp.float32) * 0.25)
    cols_e = tuple(vals_e[:, :, j] for j in range(2))
    a = dense_segment_sum_batched(idx, cols_e, sizes, method="sort",
                                  pack=True)
    b = dense_segment_sum_batched(idx, cols_e, sizes, method="scatter")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-3, rtol=1e-4)
    # generic values: row sums good to the bf16 update-rounding envelope
    vals = jax.random.normal(jax.random.PRNGKey(10), (L, M, 2), jnp.float32)
    cols = tuple(vals[:, :, j] for j in range(2))
    p = np.asarray(dense_segment_sum_batched(idx, cols, sizes,
                                             method="sort", pack=True))
    s = np.asarray(dense_segment_sum_batched(idx, cols, sizes,
                                             method="scatter"))
    counts = np.zeros(sum(sizes))
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for l in range(L):
        np.add.at(counts, off[l] + np.asarray(idx[l]), 1.0)
    envelope = 0.01 * np.sqrt(np.maximum(counts, 1.0)) + 1e-3
    assert (np.abs(p - s).max(axis=1) < envelope).all()


def test_batched_segment_sum_uniform_sizes_and_jit():
    from arnerf_tpu.ops.segments import dense_segment_sum_batched
    L, M, F = 3, 999, 1
    sizes = (128, 128, 128)
    idx = jnp.stack([jnp.arange(M, dtype=jnp.int32) % 128] * L)
    vals = (jnp.ones((L, M)),)
    f = jax.jit(lambda i, v: dense_segment_sum_batched(i, v, sizes,
                                                       method="sort"))
    out = f(idx, vals)
    ref = np.zeros((128,), np.float64)
    np.add.at(ref, np.arange(M) % 128, 1.0)
    for l in range(L):
        np.testing.assert_allclose(np.asarray(out[l * 128:(l + 1) * 128, 0]),
                                   ref, atol=1e-4)


def test_segment_sum_heavy_collision_coarse_level():
    """Coarse dense levels route ~2M updates into a few thousand rows
    (each row accumulates ~500 updates); cancellation in the running
    cumsum must not corrupt per-row sums."""
    M, T = 2_000_000, 4096
    k = jax.random.PRNGKey(7)
    idx = jax.random.randint(k, (M,), 0, T, jnp.int32)
    # alternating-sign, late-training-scale gradients
    vals = (2e-3 * jax.random.normal(jax.random.PRNGKey(8), (M, 2))
            ).astype(jnp.float32)
    ref = np.zeros((T, 2), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(vals, np.float64))
    out = np.asarray(dense_segment_sum(idx, vals, T, method="sort"),
                     np.float64)
    # per-row relative error vs the row's own magnitude + abs floor
    err = np.abs(out - ref)
    assert err.max() < 5e-4, err.max()
    rel = err / (np.abs(ref) + 1e-2)
    assert rel.max() < 0.05, rel.max()


def test_mxu_segment_sum_interpret_matches_scatter():
    """Round-5 MXU one-hot histogram (interpret mode on CPU): matches the
    exact scatter reference to bf16-update quantization tolerance, across
    table sizes including non-multiples of the tile and idx padding."""
    from arnerf_tpu.ops.segments import mxu_segment_sum
    rng = np.random.default_rng(3)
    for M, T in ((5000, 4096), (2048, 100), (100, 9261)):
        idx = rng.integers(0, T, M).astype(np.int32)
        vals = [rng.normal(size=M).astype(np.float32) * 1e-2
                for _ in range(2)]
        out = np.asarray(mxu_segment_sum(
            jnp.asarray(idx), tuple(jnp.asarray(v) for v in vals), T,
            interpret=True))
        ref = np.zeros((T, 2), np.float64)
        for f in range(2):
            np.add.at(ref[:, f], idx, vals[f].astype(np.float64))
        assert out.shape == (T, 2)
        err = np.abs(out - ref)
        rel = err.max() / (np.abs(ref).max() + 1e-12)
        assert rel < 0.01, (M, T, rel)
