"""Round-5 brick-marching baked renderer (rendering_baked.render_baked_bricks).

Pins: (1) the brick sigma table is an exact log-quantized repack of the
baked sigma grid; (2) the brick renderer matches the dense-sampling
analytic oracle about as well as the v2 split path it replaces (the two
differ only in quadrature bookkeeping: per-brick ladder consumption +
opacity-quantile color buckets vs per-round ladders + t-stride buckets);
(3) opacity/depth agree closely with the split path (same per-sample
weight math, same jitter family); (4) the routing flag falls back cleanly
when no brick table exists.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arnerf_tpu.rendering_baked import (
    bake_field, render_baked, render_baked_bricks, brick_render_args,
    build_sigma_bricks, sigma_encode, sigma_decode, BRICK)
from arnerf_tpu.datasets.synthetic import (analytic_sigma, analytic_rgb,
                                           render_analytic)
from arnerf_tpu.datasets.ray_utils import get_ray_directions, get_rays
from tests.test_baked import look_at_pose  # shared camera helper

SCALE = 0.5


def analytic_field(x, d):
    return analytic_sigma(x, SCALE), analytic_rgb(x, SCALE)


def _camera(W=96, H=96):
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_sigma_brick_roundtrip():
    """Brick repack + log codes reproduce the sigma grid to quantization
    tolerance, at every (in-brick) position."""
    B = 24                       # not a multiple of 8: exercises padding
    rng = np.random.RandomState(0)
    sig = np.exp(rng.uniform(-3, 6, size=(B ** 3,))).astype(np.float32)
    sig[rng.rand(B ** 3) < 0.3] = 0.0
    bricks = np.asarray(build_sigma_bricks(jnp.asarray(sig), B))
    Bb = -(-B // BRICK)
    assert bricks.shape == (Bb ** 3, BRICK ** 3)
    # decode every voxel back
    dec = np.asarray(sigma_decode(jnp.asarray(bricks.astype(np.int32))))
    dec3 = dec.reshape(Bb, Bb, Bb, BRICK, BRICK, BRICK)
    full = np.zeros((Bb * BRICK,) * 3, np.float32)
    for bx in range(Bb):
        for by in range(Bb):
            for bz in range(Bb):
                full[bx * 8:bx * 8 + 8, by * 8:by * 8 + 8,
                     bz * 8:bz * 8 + 8] = dec3[bx, by, bz]
    got = full[:B, :B, :B].reshape(-1)
    # log-quantization: ~1.5% relative step, clip at sigma ~1570
    want = np.minimum(sig, float(sigma_decode(jnp.asarray(255))))
    np.testing.assert_allclose(got, want, rtol=0.04, atol=0.03)
    # zero maps exactly to zero
    assert (got[sig == 0] == 0).all()


def test_brick_render_matches_oracle():
    """Brick-marching frame vs the dense-sampling analytic oracle: at
    least the v2 stochastic split path's fidelity floor."""
    B = 64
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       occ_mask=None, dtype=jnp.float32)
    assert baked.sigma_bricks is not None
    ro, rd = _camera()
    gt, _, _ = render_analytic(ro, rd, SCALE, n_samples=512)
    out = render_baked(baked, None, ro, rd, None, interp="stochastic",
                       T_threshold=1e-4, chunk=1 << 13, bricks=True)
    pred = np.asarray(out["rgb"]) + (1 - np.asarray(out["opacity"]))[:, None]
    mse = float(np.mean((pred - np.asarray(gt)) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 21.0, f"brick render vs oracle PSNR {psnr:.2f}"


def test_brick_render_agrees_with_split_path():
    """Opacity/depth use the same per-sample weight math as the v2 split
    path; whole-frame stats must agree closely (different jitter draws and
    quadrature bookkeeping -> not bit-equal)."""
    B = 64
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       occ_mask=None, dtype=jnp.float32)
    ro, rd = _camera(64, 64)
    key = jax.random.PRNGKey(3)
    old = render_baked(baked, None, ro, rd, None, interp="stochastic",
                       T_threshold=1e-4, chunk=1 << 12, key=key,
                       bricks=False)
    new = render_baked(baked, None, ro, rd, None, interp="stochastic",
                       T_threshold=1e-4, chunk=1 << 12, key=key,
                       bricks=True)
    o_old = np.asarray(old["opacity"])
    o_new = np.asarray(new["opacity"])
    assert abs(float(o_old.mean() - o_new.mean())) < 0.02
    hit = o_old > 0.5
    d_old = np.asarray(old["depth"])[hit]
    d_new = np.asarray(new["depth"])[hit]
    assert np.median(np.abs(d_old - d_new)) < 0.05
    rgb_mse = float(np.mean((np.asarray(old["rgb"])
                             - np.asarray(new["rgb"])) ** 2))
    assert rgb_mse < 3e-3, rgb_mse


def test_brick_args_and_fallback():
    """brick_render_args yields sane statics; fields without sigma_bricks
    (old checkpoints) keep working through the split path."""
    B = 32
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8)
    dt, K = brick_render_args(baked, n_steps=128)
    assert dt > 0 and 2 <= K <= 24
    legacy = baked._replace(sigma_bricks=None)
    ro, rd = _camera(32, 32)
    out = render_baked(legacy, None, ro, rd, None, interp="stochastic",
                       T_threshold=1e-3, bricks=True)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_brick_t_far_clamp():
    """Mesh-depth far clamp: a clamp in front of all geometry zeroes
    opacity; a clamp far behind changes nothing (AR dirty-rect parity)."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8)
    ro, rd = _camera(32, 32)
    key = jax.random.PRNGKey(0)
    dt, K = brick_render_args(baked, n_steps=128)
    kw = dict(B=baked.resolution, scale=baked.scale, dt=dt, K=K,
              T_threshold=1e-3, color_window=8)
    N = ro.shape[0]
    base = render_baked_bricks(
        baked.sigma_bricks, baked.rows, baked.row_index, baked.rows_q,
        baked.mip, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
        t_far=jnp.full((N,), 1e9), **kw)
    near = render_baked_bricks(
        baked.sigma_bricks, baked.rows, baked.row_index, baked.rows_q,
        baked.mip, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
        t_far=jnp.full((N,), 1e-4), **kw)
    assert float(jnp.max(near["opacity"])) < 1e-6
    free = render_baked_bricks(
        baked.sigma_bricks, baked.rows, baked.row_index, baked.rows_q,
        baked.mip, baked.aabb_lo, baked.aabb_hi, ro, rd, key, **kw)
    np.testing.assert_allclose(np.asarray(base["opacity"]),
                               np.asarray(free["opacity"]), atol=1e-5)


def test_brick_diagonal_crossing_integral():
    """Regression (round 5): K is sized to the brick EDGE, so a
    diagonal-ish crossing needs ceil(chord/dt) > K samples and the march
    must RE-ENTER the brick next round for the rest. A bug that advanced
    t_cur past the evaluated window silently dropped up to ~44% of the
    samples of diagonal crossings (probe SH 19% dark in
    test_generate_probe_baked_matches_network). Pin the brick path's
    per-ray opacity against an exact serial quadrature of the SAME
    decoded brick field on pure-diagonal rays through a MODERATE-density
    region (opacity far from saturation, where dropped samples are
    visible, unlike the dense-camera tests above)."""
    B = 32
    # uniform moderate sigma everywhere: every brick occupied, every
    # crossing a worst-case diagonal needs > K samples
    def mild_field(x, d):
        sig = jnp.full(x.shape[:-1], 1.2)
        rgb = jnp.broadcast_to(jnp.asarray([0.6, 0.5, 0.4]), x.shape)
        return sig, rgb
    baked = bake_field(mild_field, SCALE, resolution=B, n_dirs=8)
    n = 64
    rng = np.random.RandomState(0)
    # diagonal directions with jittered origins outside the cube
    d0 = np.ones(3) / np.sqrt(3.0)
    rd = d0[None] + 0.05 * rng.normal(size=(n, 3))
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro = -1.2 * rd + 0.03 * rng.normal(size=(n, 3))
    ro_j, rd_j = jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)
    dt, K = brick_render_args(baked, n_steps=128)
    # confirm the regression regime is actually exercised
    brick_diag = np.sqrt(3.0) * 8 * (2 * SCALE / B)
    assert K * dt < brick_diag, "test must cover chord > K*dt crossings"
    out = render_baked_bricks(
        baked.sigma_bricks, baked.rows, baked.row_index, baked.rows_q,
        baked.mip, baked.aabb_lo, baked.aabb_hi, ro_j, rd_j,
        jax.random.PRNGKey(1), B=baked.resolution, scale=baked.scale,
        dt=dt, K=K, T_threshold=1e-4, color_window=8)
    # serial oracle: same lattice (t_start + (k+0.5)*dt), same decoded
    # sigma grid, midpoint lookup (stochastic jitter <= 1 voxel -> loose
    # tolerance on a smooth field)
    from arnerf_tpu.rendering_baked import sigma_decode, sigma_encode
    sig_grid = np.asarray(
        sigma_decode(sigma_encode(jnp.full((B ** 3,), 1.2))))[0]
    lo, hi = np.asarray(baked.aabb_lo), np.asarray(baked.aabb_hi)
    op_ref = np.zeros(n)
    for i in range(n):
        t0s = np.where(rd[i] > 0, (lo - ro[i]) / rd[i],
                       (hi - ro[i]) / rd[i]).max()
        t1s = np.where(rd[i] > 0, (hi - ro[i]) / rd[i],
                       (lo - ro[i]) / rd[i]).min()
        if t1s <= t0s:
            continue
        m = int(np.ceil((t1s - t0s) / dt)) + 2
        ts = t0s + (np.arange(m) + 0.5) * dt
        inside = ts < t1s
        op_ref[i] = 1.0 - np.exp(-np.sum(sig_grid * dt * inside))
    got = np.asarray(out["opacity"])
    # the dropped-sample bug underestimates these opacities by ~0.1-0.3;
    # jitter/edge effects stay well under 0.04 on this smooth field
    np.testing.assert_allclose(got, op_ref, atol=0.04)
