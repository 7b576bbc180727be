"""Ray marching + compositing + distortion tests against serial NumPy
references that mirror the reference CUDA kernels' semantics
(models/csrc/raymarching.cu, volumerendering.cu, losses.cu)."""

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.ops.stepping import (
    SQRT3, calc_dt, lattice_t, num_lattice_steps, mip_from_pos, mip_from_dt)
from arnerf_tpu.ops.marching import march_rays_train, march_rays_test
from arnerf_tpu.ops.composite import composite_train, composite_test_step
from arnerf_tpu.ops.distortion import distortion_loss
from arnerf_tpu.ops.intersection import ray_aabb_intersect_single

GRID = 32
SCALE = 0.5
MAXS = 256


def np_calc_dt(t, f, max_samples, grid_size, scale):
    return np.clip(t * f, SQRT3 / max_samples, SQRT3 * 2 * scale / grid_size)


def np_march_ray(o, d, t1, t2, occ, f, max_samples, grid_size, scale, cascades,
                 s_cap):
    """Serial reference marcher on the closed-form lattice (mirrors
    raymarching_train_kernel but without resampling drift)."""
    samples = []
    t = t1
    k = 0
    while 0 <= t < t2 and len(samples) < s_cap and k < 100000:
        x = o + t * d
        dt = np_calc_dt(t, f, max_samples, grid_size, scale)
        mx = np.max(np.abs(x))
        mip_p = min(cascades - 1, max(0, int(np.floor(np.log2(max(mx, 1e-12)))) + 2))
        mip_d = min(cascades - 1, max(0, int(np.floor(np.log2(dt * grid_size))) + 1))
        mip = max(mip_p, mip_d)
        mb = min(2.0 ** (mip - 1), scale)
        n = np.clip(0.5 * (x / mb + 1) * grid_size, 0, grid_size - 1).astype(int)
        if occ[mip, n[0], n[1], n[2]]:
            samples.append((t, dt))
        # advance on the lattice (uniform for f=0)
        if f == 0:
            t = t1 + (k + 1) * np_calc_dt(0, f, max_samples, grid_size, scale)
        else:
            t = t + dt
        k += 1
    return samples


def make_sphere_grid(radius=0.3):
    """Single-cascade occupancy: occupied where cell center is inside a sphere."""
    g = np.arange(GRID)
    centers = (g + 0.5) / GRID * 2 - 1  # [-1, 1] in grid coords
    X, Y, Z = np.meshgrid(centers, centers, centers, indexing="ij")
    occ = (np.sqrt(X**2 + Y**2 + Z**2) * SCALE < radius)
    return occ[None].astype(np.uint8)  # (1, G, G, G)


def march_kwargs(**over):
    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=GRID,
              max_samples=MAXS,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, MAXS, GRID, SCALE),
              m_cap=2048, s_cap=128)
    kw.update(over)
    return kw


def test_lattice_matches_serial_recurrence():
    """The closed form must reproduce t += calc_dt(t) for exp stepping."""
    f, ms, gs, sc = 1 / 256, 1024, 128, 4.0
    t1 = 0.05
    ts = [t1]
    t = t1
    for _ in range(300):
        t = t + np_calc_dt(t, f, ms, gs, sc)
        ts.append(t)
    k = jnp.arange(301)
    got = np.asarray(lattice_t(jnp.float32(t1), k, exp_step_factor=f,
                               max_samples=ms, grid_size=gs, scale=sc))
    # < 1-step tolerance at the clamp boundaries, exact in pure phases
    dts = np_calc_dt(np.asarray(ts), f, ms, gs, sc)
    assert np.all(np.abs(got - np.asarray(ts)) < 1.5 * dts)


def test_march_train_matches_serial_reference():
    occ = make_sphere_grid()
    rng = np.random.default_rng(0)
    N = 16
    # rays from z=-1.2 aimed at jittered points near the center
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    targets = rng.uniform(-0.3, 0.3, size=(N, 3)).astype(np.float32)
    d = targets - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.zeros(3), jnp.full(3, SCALE)))
    noise = np.zeros(N, np.float32)  # deterministic for comparison

    res = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           jnp.asarray(hits), jnp.asarray(occ).reshape(-1),
                           jnp.asarray(noise), **march_kwargs())

    counts = np.asarray(res.counts)
    starts = np.asarray(res.ray_start)
    ts = np.asarray(res.ts)
    deltas = np.asarray(res.deltas)
    valid = np.asarray(res.valid)
    ray_idx = np.asarray(res.ray_idx)

    total = 0
    for r in range(N):
        ref = np_march_ray(rays_o[r], rays_d[r], hits[r, 0], hits[r, 1],
                           occ, 0.0, MAXS, GRID, SCALE, 1, 128)
        got_ts = ts[starts[r]:starts[r] + counts[r]]
        assert counts[r] == len(ref), f"ray {r}: {counts[r]} vs {len(ref)}"
        if len(ref):
            ref_ts = np.array([t for t, _ in ref])
            assert np.allclose(got_ts, ref_ts, atol=1e-5), f"ray {r}"
            assert np.allclose(deltas[starts[r]:starts[r] + counts[r]],
                               [dt for _, dt in ref], atol=1e-6)
            assert np.all(ray_idx[starts[r]:starts[r] + counts[r]] == r)
            assert np.all(valid[starts[r]:starts[r] + counts[r]])
        total += len(ref)
    # samples beyond the used range must be flagged invalid
    assert not valid[total:].any()
    assert int(res.rm_samples) == total


def test_march_train_budget_striding():
    """When demand exceeds m_cap, allocations shrink and deltas scale."""
    occ = np.ones((1, GRID, GRID, GRID), np.uint8)  # fully occupied
    N = 8
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    rays_d = np.tile([0.0, 0.0, 1.0], (N, 1)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    res = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           jnp.asarray(hits), jnp.asarray(occ).reshape(-1),
                           jnp.zeros(N), **march_kwargs(m_cap=256, s_cap=256))
    counts = np.asarray(res.counts)
    assert counts.sum() <= 256
    assert (counts > 0).all()          # every ray keeps coverage
    # per-sample deltas inflate by the stride to preserve optical depth
    dt_min = SQRT3 / MAXS
    used = np.asarray(res.valid)
    assert np.all(np.asarray(res.deltas)[used] > dt_min * 1.5)
    # ts still strictly increasing within each ray
    starts = np.asarray(res.ray_start)
    ts = np.asarray(res.ts)
    for r in range(N):
        seg = ts[starts[r]:starts[r] + counts[r]]
        assert np.all(np.diff(seg) > 0)


def test_march_empty_grid_gives_no_samples():
    occ = np.zeros((1, GRID, GRID, GRID), np.uint8)
    rays_o = np.asarray([[0.0, 0.0, -1.2]], np.float32)
    rays_d = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    res = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           jnp.asarray(hits), jnp.asarray(occ).reshape(-1),
                           jnp.zeros(1), **march_kwargs())
    assert int(res.rm_samples) == 0
    assert not np.asarray(res.valid).any()


def np_composite(sigmas, rgbs, deltas, ts, segs, T_thr):
    """Serial reference of composite_train_fw_kernel (volumerendering.cu:5-44)."""
    N = len(segs)
    opacity = np.zeros(N)
    depth = np.zeros(N)
    rgb = np.zeros((N, 3))
    ws = np.zeros(len(sigmas))
    vr = 0
    for r, (start, cnt) in enumerate(segs):
        T = 1.0
        for s in range(start, start + cnt):
            a = 1 - np.exp(-sigmas[s] * deltas[s])
            w = a * T
            rgb[r] += w * rgbs[s]
            depth[r] += w * ts[s]
            opacity[r] += w
            ws[s] = w
            T *= 1 - a
            vr += 1
            if T <= T_thr:
                break
    return opacity, depth, rgb, ws, vr


def random_segments(rng, N, M):
    counts = rng.integers(0, 12, size=N)
    while counts.sum() > M:
        counts = rng.integers(0, 12, size=N)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    total = counts.sum()
    ray_idx = np.zeros(M, np.int32)
    valid = np.zeros(M, bool)
    for r in range(N):
        ray_idx[starts[r]:starts[r] + counts[r]] = r
        valid[starts[r]:starts[r] + counts[r]] = True
    ray_idx[total:] = N - 1
    return counts.astype(np.int32), starts, ray_idx, valid


def test_composite_train_matches_serial():
    rng = np.random.default_rng(4)
    N, M = 24, 256
    counts, starts, ray_idx, valid = random_segments(rng, N, M)
    sigmas = rng.uniform(0, 80, M).astype(np.float32)
    rgbs = rng.uniform(0, 1, (M, 3)).astype(np.float32)
    deltas = np.full(M, 0.01, np.float32)
    ts = rng.uniform(0.1, 2.0, M).astype(np.float32)
    T_thr = 1e-4

    out = composite_train(jnp.asarray(sigmas), jnp.asarray(rgbs),
                          jnp.asarray(deltas), jnp.asarray(ts),
                          jnp.asarray(ray_idx), jnp.asarray(valid),
                          jnp.asarray(starts), jnp.asarray(counts), T_thr)
    ref_o, ref_d, ref_rgb, ref_ws, ref_vr = np_composite(
        sigmas, rgbs, deltas, ts, list(zip(starts, counts)), T_thr)
    assert np.allclose(np.asarray(out.opacity), ref_o, atol=1e-5)
    assert np.allclose(np.asarray(out.depth), ref_d, atol=1e-5)
    assert np.allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
    assert np.allclose(np.asarray(out.ws), ref_ws, atol=1e-5)
    assert int(out.vr_samples) == ref_vr


def test_composite_gradients_match_finite_differences():
    rng = np.random.default_rng(5)
    N, M = 6, 48
    counts, starts, ray_idx, valid = random_segments(rng, N, M)
    sigmas = jnp.asarray(rng.uniform(0.5, 20, M).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (M, 3)).astype(np.float32))
    deltas = jnp.full((M,), 0.02)
    ts = jnp.asarray(np.sort(rng.uniform(0.1, 2.0, M)).astype(np.float32))
    args = (jnp.asarray(ray_idx), jnp.asarray(valid), jnp.asarray(starts),
            jnp.asarray(counts))

    def loss(sig, rgb):
        out = composite_train(sig, rgb, deltas, ts, *args, 1e-4)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.opacity) + jnp.sum(out.depth * 0.1)

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    v = jax.random.normal(jax.random.PRNGKey(0), sigmas.shape)
    eps = 3e-3
    fd = (loss(sigmas + eps * v, rgbs) - loss(sigmas - eps * v, rgbs)) / (2 * eps)
    assert np.isclose(float(fd), float(jnp.vdot(gs, v)), rtol=3e-2, atol=1e-4)
    vr = jax.random.normal(jax.random.PRNGKey(1), rgbs.shape)
    fdr = (loss(sigmas, rgbs + eps * vr) - loss(sigmas, rgbs - eps * vr)) / (2 * eps)
    assert np.isclose(float(fdr), float(jnp.vdot(gr, vr)), rtol=3e-2, atol=1e-4)


def test_distortion_loss_matches_quadratic_form():
    """Prefix-sum formulation == O(n^2) double sum
    sum_ij w_i w_j |t_i - t_j| + 1/3 sum w^2 delta."""
    rng = np.random.default_rng(6)
    N, M = 8, 64
    counts, starts, ray_idx, valid = random_segments(rng, N, M)
    ws = rng.uniform(0, 0.2, M).astype(np.float32) * valid
    deltas = np.full(M, 0.01, np.float32)
    ts = np.sort(rng.uniform(0.1, 2.0, M)).astype(np.float32)

    got = np.asarray(distortion_loss(
        jnp.asarray(ws), jnp.asarray(deltas), jnp.asarray(ts),
        jnp.asarray(ray_idx), jnp.asarray(valid), jnp.asarray(starts),
        jnp.asarray(counts)))
    for r in range(N):
        sl = slice(starts[r], starts[r] + counts[r])
        w, t, d = ws[sl], ts[sl], deltas[sl]
        ref = np.sum(w[:, None] * w[None, :] * np.abs(t[:, None] - t[None, :]))
        ref += np.sum(w ** 2 * d) / 3
        assert np.isclose(got[r], ref, rtol=1e-4, atol=1e-7), r


def test_march_test_incremental_covers_ray():
    """Repeated test-marching rounds + incremental compositing must match a
    single-shot train-march + composite on the same scene."""
    occ = make_sphere_grid()
    N = 4
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    dirs = np.asarray([[0, 0, 1], [0.08, 0, 1], [0, 0.12, 1], [0.3, 0.3, 1]],
                      np.float32)
    rays_d = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))

    # constant field: sigma=25, rgb=(.2,.5,.8)
    sig_val, rgb_val = 25.0, np.array([0.2, 0.5, 0.8], np.float32)

    # single shot (train path)
    res = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                           jnp.asarray(hits), jnp.asarray(occ).reshape(-1),
                           jnp.zeros(N), **march_kwargs(s_cap=256, m_cap=1024))
    out = composite_train(jnp.full(res.ts.shape, sig_val),
                          jnp.tile(rgb_val, (res.ts.shape[0], 1)),
                          res.deltas, res.ts, res.ray_idx, res.valid,
                          res.ray_start, res.counts, 1e-4)

    # incremental (test path)
    t_cur = jnp.asarray(hits[:, 0])
    t2 = jnp.asarray(hits[:, 1])
    opacity = jnp.zeros(N)
    depth = jnp.zeros(N)
    rgb = jnp.zeros((N, 3))
    for _ in range(40):
        xyzs, deltas, ts, n_eff, t_cur = march_rays_test(
            jnp.asarray(rays_o), jnp.asarray(rays_d), t_cur, t2,
            jnp.asarray(occ).reshape(-1), scale=SCALE, cascades=1,
            exp_step_factor=0.0, grid_size=GRID, max_samples=MAXS,
            n_candidates=64, n_samples=16)
        S = ts.shape[1]
        opacity, depth, rgb, alive = composite_test_step(
            jnp.full((N, S), sig_val),
            jnp.tile(rgb_val, (N, S, 1)), deltas, ts, n_eff,
            opacity, depth, rgb, 1e-4)
        if not bool(jnp.any(alive & (t_cur < t2))):
            break

    assert np.allclose(np.asarray(opacity), np.asarray(out.opacity), atol=2e-3)
    assert np.allclose(np.asarray(rgb), np.asarray(out.rgb), atol=2e-3)
    assert np.allclose(np.asarray(depth), np.asarray(out.depth), atol=5e-3)


def test_two_level_marching_matches_single_level():
    """Coarse-prepass marching must select EXACTLY the same samples as the
    brute-force single-level path (the dilation guarantees a superset)."""
    from arnerf_tpu.ops.marching import build_coarse_occupancy
    rng = np.random.default_rng(11)
    # sparse random occupancy (~3%) in a 64^3 grid, single cascade
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.03).astype(np.uint8)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)

    N = 32
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, 512, G, SCALE),
              m_cap=4096, s_cap=256)
    a = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                         jnp.asarray(hits), occ_flat, noise, **kw)
    b = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                         jnp.asarray(hits), occ_flat, noise,
                         occ_coarse=coarse, seg_cap=64, **kw)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_allclose(np.asarray(a.ts), np.asarray(b.ts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    assert int(a.rm_samples) == int(b.rm_samples)


def test_march_test_two_level_matches_single_level():
    """Two-level test marching may take more rounds under segment
    truncation but must integrate EXACTLY the same samples overall."""
    from arnerf_tpu.ops.marching import build_coarse_occupancy
    rng = np.random.default_rng(13)
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.04).astype(np.uint8)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)
    N = 24
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    t_cur = jnp.asarray(hits[:, 0])
    t2 = jnp.asarray(hits[:, 1])
    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512, n_candidates=256, n_samples=16)

    def run(two_level):
        extra = dict(occ_coarse=coarse, seg_cap=16) if two_level else {}
        tc = t_cur
        n_total = np.zeros(N, np.int64)
        t_sum = np.zeros(N, np.float64)   # order-insensitive checksums
        t_min = np.full(N, np.inf)
        t_max = np.zeros(N)
        for _ in range(40):
            _, _, ts_r, n_eff, tc = march_rays_test(
                jnp.asarray(rays_o), jnp.asarray(rays_d), tc, t2,
                occ_flat, **kw, **extra)
            n = np.asarray(n_eff)
            tsn = np.asarray(ts_r)
            for r in range(N):
                seg = tsn[r, :n[r]]
                n_total[r] += n[r]
                t_sum[r] += seg.sum()
                if n[r]:
                    t_min[r] = min(t_min[r], seg.min())
                    t_max[r] = max(t_max[r], seg.max())
            if bool(jnp.all(tc >= t2)):
                break
        return n_total, t_sum, t_min, t_max

    na, sa, mina, maxa = run(False)
    nb, sb, minb, maxb = run(True)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)
    np.testing.assert_allclose(mina, minb, atol=1e-6)
    np.testing.assert_allclose(maxa, maxb, atol=1e-6)


def test_march_train_multi_cascade_exp_stepping():
    """Cascaded grids + exponential stepping vs the serial reference."""
    rng = np.random.default_rng(21)
    G, scale, cascades, f, maxs = 32, 2.0, 3, 1 / 256, 512
    occ = (rng.random((cascades, G, G, G)) < 0.08).astype(np.uint8)
    N = 12
    rays_o = np.tile([0.0, 0.0, -3.0], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, scale)))
    K = num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * scale, f, maxs, G, scale)
    res = march_rays_train(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(hits),
        jnp.asarray(occ).reshape(-1), jnp.zeros(N), scale=scale,
        cascades=cascades, exp_step_factor=f, grid_size=G, max_samples=maxs,
        n_candidates=K, m_cap=4096, s_cap=256)
    counts = np.asarray(res.counts)
    starts = np.asarray(res.ray_start)
    ts = np.asarray(res.ts)
    assert counts.sum() > 0
    for r in range(N):
        # the serial reference walks the true recurrence; the closed-form
        # lattice may shift by <1 step at clamp boundaries, so compare
        # counts loosely and verify every selected sample IS occupied
        ref = np_march_ray(rays_o[r], rays_d[r], hits[r, 0], hits[r, 1],
                           occ, f, maxs, G, scale, cascades, 256)
        assert abs(counts[r] - len(ref)) <= max(2, 0.1 * len(ref) + 1), r
        for t in ts[starts[r]:starts[r] + counts[r]]:
            x = rays_o[r] + t * rays_d[r]
            dt = np_calc_dt(t, f, maxs, G, scale)
            mx = np.max(np.abs(x))
            mip_p = min(cascades - 1,
                        max(0, int(np.floor(np.log2(max(mx, 1e-12)))) + 2))
            mip_d = min(cascades - 1,
                        max(0, int(np.floor(np.log2(dt * G))) + 1))
            mip = max(mip_p, mip_d)
            mb = min(2.0 ** (mip - 1), scale)
            n = np.clip(0.5 * (x / mb + 1) * G, 0, G - 1).astype(int)
            assert occ[mip, n[0], n[1], n[2]], (r, t)


def test_grid_update_erode_path():
    """erode=True decays invisible-ish cells harder (colmap datasets)."""
    from arnerf_tpu.models import (NGPConfig, ngp_init, grid_state_init,
                                   mark_invisible_cells, update_density_grid)
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    state = grid_state_init(cfg)
    pose = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -1.0]]])
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    state = mark_invisible_cells(state, K, pose, cfg, 64, 64)
    state = update_density_grid(params, state, jax.random.PRNGKey(1), cfg,
                                density_threshold=0.01, warmup=True,
                                erode=True)
    assert np.isfinite(np.asarray(state.density_grid)).all()
    assert int(jnp.sum(state.occ_flat)) > 0


def test_march_test_dt_scale_quirk():
    """dt_scale mirrors the reference test kernel passing `cascades` where
    calc_dt expects `scale` (raymarching.cu:370,399): step sizes are capped
    at SQRT3*2*dt_scale/G, while occupancy mip bounds still use `scale`."""
    from arnerf_tpu.ops.marching import march_rays_test
    G, C, S = 128, 6, 16.0  # ref cap 0.1624 binds for t > 41.6
    occ = jnp.ones((C * G ** 3,), jnp.uint8)
    ro = jnp.zeros((4, 3))
    rd = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (4, 1))
    t0 = jnp.full((4,), 45.0)
    t2 = jnp.full((4,), 55.0)
    kw = dict(scale=S, cascades=C, exp_step_factor=1 / 256, grid_size=G,
              max_samples=1024, n_candidates=64, n_samples=16)
    a = march_rays_test(ro, rd, t0, t2, occ, **kw)
    b = march_rays_test(ro, rd, t0, t2, occ, dt_scale=float(C), **kw)
    sq32 = float(np.sqrt(3) * 2 / G)
    assert float(jnp.max(a[1])) > sq32 * C + 1e-4      # train cap not binding
    assert float(jnp.max(b[1])) <= sq32 * C + 1e-6     # ref cap binding
    # exp_step_factor=0 (synthetic scenes): dt==dt_min always, quirk is a
    # no-op there
    kw0 = dict(kw, exp_step_factor=0.0)
    a0 = march_rays_test(ro, rd, t0, t2, occ, **kw0)
    b0 = march_rays_test(ro, rd, t0, t2, occ, dt_scale=float(C), **kw0)
    assert jnp.array_equal(a0[1], b0[1]) and jnp.array_equal(a0[2], b0[2])


def test_coarse_dilation_radius_values():
    from arnerf_tpu.ops.marching import coarse_dilation_radius
    # deep integration, scale 0.5: dt = sqrt(3)/1024 -> tiny span -> r=1
    assert coarse_dilation_radius(scale=0.5, exp_step_factor=0.0,
                                  grid_size=128, max_samples=1024) == 1
    # GUI settings with the reference dt quirk (dt_scale=cascades=1):
    # dt = sqrt(3)/96 -> span 2.02 supercells -> r=3 (a fixed r=2 would
    # have allowed rare misses)
    assert coarse_dilation_radius(scale=0.5, exp_step_factor=0.0,
                                  grid_size=128, max_samples=96,
                                  dt_scale=1.0) == 3
    # exponential stepping: worst dt is the dt_max cap
    assert coarse_dilation_radius(scale=0.5, exp_step_factor=1 / 256,
                                  grid_size=128, max_samples=1024) >= 2


def test_march_test_two_level_exact_at_gui_settings():
    """Two-level marching must equal single-level at the GUI integration
    settings (max_samples=96 + dt quirk), where the segment span slightly
    exceeds 2 supercells and the dilation radius must grow to 3."""
    from arnerf_tpu.ops.marching import (march_rays_test,
                                         build_coarse_occupancy,
                                         coarse_dilation_radius)
    G = 128
    rng = np.random.default_rng(3)
    occ3 = (rng.random((G, G, G)) < 0.003).astype(np.uint8)
    occ = jnp.asarray(occ3.reshape(-1))
    r = coarse_dilation_radius(scale=0.5, exp_step_factor=0.0, grid_size=G,
                               max_samples=96, dt_scale=1.0)
    oc = build_coarse_occupancy(occ, 1, G, dilate=r)
    n = 128
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(-0.49 * d, jnp.float32)
    rd = jnp.asarray(d, jnp.float32)
    t_cur = jnp.full((n,), 0.01)
    t2 = jnp.full((n,), 1.0)
    kw = dict(scale=0.5, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=96, n_candidates=256, n_samples=16,
              dt_scale=1.0)
    ta, tb = t_cur, t_cur
    for _ in range(6):
        a = march_rays_test(ro, rd, ta, t2, occ, **kw)
        b = march_rays_test(ro, rd, tb, t2, occ, occ_coarse=oc, **kw)
        sa = [np.asarray(a[2])[i, :int(a[3][i])] for i in range(n)]
        sb = [np.asarray(b[2])[i, :int(b[3][i])] for i in range(n)]
        flat_a = np.concatenate(sa) if sa else np.zeros(0)
        # order-insensitive over the loop: accumulate and compare at end
        ta, tb = a[4], b[4]
    # after the full loop both cursors and consumed totals must agree on
    # coverage: re-march from scratch accumulating everything
    def consume_all(use_coarse):
        tc = t_cur
        out = [[] for _ in range(n)]
        for _ in range(10):
            res = march_rays_test(ro, rd, tc, t2, occ,
                                  occ_coarse=oc if use_coarse else None,
                                  **kw)
            ts, ne = np.asarray(res[2]), np.asarray(res[3])
            for i in range(n):
                out[i].extend(ts[i, :ne[i]].tolist())
            tc = res[4]
        return out
    A, B = consume_all(False), consume_all(True)
    for i in range(n):
        assert len(A[i]) == len(B[i]) and np.allclose(A[i], B[i]), \
            (i, len(A[i]), len(B[i]))


def test_march_test_two_level_truncation_exact():
    """seg_cap truncation (more occupied segments per window than seg_cap)
    must still yield exactly the single-level sample stream over the full
    loop — the cursor may skip trailing coarse-empty segments but never an
    occupied one."""
    from arnerf_tpu.ops.marching import (march_rays_test,
                                         build_coarse_occupancy,
                                         coarse_dilation_radius)
    G = 128
    rng = np.random.default_rng(11)
    occ3 = (rng.random((G, G, G)) < 0.15).astype(np.uint8)  # dense
    occ = jnp.asarray(occ3.reshape(-1))
    r = coarse_dilation_radius(scale=0.5, exp_step_factor=0.0, grid_size=G,
                               max_samples=512)
    oc = build_coarse_occupancy(occ, 1, G, dilate=r)
    n = 64
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(-0.49 * d, jnp.float32)
    rd = jnp.asarray(d, jnp.float32)
    t_cur = jnp.full((n,), 0.01)
    t2 = jnp.full((n,), 1.0)
    kw = dict(scale=0.5, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512, n_candidates=256, n_samples=8, seg_cap=4)

    def consume_all(use_coarse):
        tc = t_cur
        out = [[] for _ in range(n)]
        for _ in range(64):
            res = march_rays_test(ro, rd, tc, t2, occ,
                                  occ_coarse=oc if use_coarse else None,
                                  **kw)
            ts, ne = np.asarray(res[2]), np.asarray(res[3])
            for i in range(n):
                out[i].extend(ts[i, :ne[i]].tolist())
            tc = res[4]
        return out

    A, B = consume_all(False), consume_all(True)
    for i in range(n):
        m = min(len(A[i]), len(B[i]))
        assert np.allclose(A[i][:m], B[i][:m]), i
        # two-level may lag in rounds (smaller per-round advance) but the
        # consumed prefix must be identical and nothing may be skipped
        assert len(B[i]) <= len(A[i])


def test_mark_invisible_preserves_trained_density():
    """Re-running visibility marking (e.g. on checkpoint resume) must not
    wipe the trained EMA density of visible cells."""
    from arnerf_tpu.models import (NGPConfig, grid_state_init,
                                   mark_invisible_cells)
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=2,
                    log2_hashmap_size=8, base_resolution=4)
    state = grid_state_init(cfg)
    pose = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -1.0]]])
    K = jnp.asarray([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]])
    s1 = mark_invisible_cells(state, K, pose, cfg, 64, 64)
    visible = np.asarray(s1.density_grid[0]) >= 0
    assert visible.any() and (~visible).any()
    # pretend training filled the grid
    trained = s1._replace(density_grid=jnp.where(
        s1.density_grid >= 0, 7.5, s1.density_grid))
    s2 = mark_invisible_cells(trained, K, pose, cfg, 64, 64)
    d2 = np.asarray(s2.density_grid[0])
    assert np.all(d2[visible] == 7.5)
    assert np.all(d2[~visible] == -1.0)


def test_pooled_marching_matches_single_level_when_pool_fits():
    """Shared-segment-pool marching (march_rays_train_pooled) must select
    EXACTLY the single-level path's samples whenever the pool holds the
    total segment demand — same exactness contract as the per-ray
    two-level path, but capacity sized by the batch MEAN."""
    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         march_rays_train_pooled)
    rng = np.random.default_rng(11)
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.03).astype(np.uint8)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)

    N = 32
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, 512, G, SCALE),
              m_cap=4096, s_cap=256)
    a = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                         jnp.asarray(hits), occ_flat, noise, **kw)
    b = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                jnp.asarray(hits), occ_flat, noise,
                                occ_coarse=coarse, seg_pool_cap=4096, **kw)
    assert int(b.total_nseg) <= 4096          # pool actually fits
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_allclose(np.asarray(a.ts), np.asarray(b.ts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    assert int(a.rm_samples) == int(b.rm_samples)
    assert int(a.max_nseg) == 0 and int(b.max_nseg) > 0


def test_pooled_marching_strides_under_pool_pressure():
    """With a pool smaller than total segment demand, each ray's occupied
    segments are uniformly thinned (never truncated from one end): samples
    remain a per-ray SUBSET of the exact set, per-ray allocation stays
    roughly proportional to demand, and deltas carry the stride scale so
    the quadrature still covers the ray."""
    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         march_rays_train_pooled)
    rng = np.random.default_rng(5)
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.15).astype(np.uint8)  # dense-ish
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)

    N = 16
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, 512, G, SCALE),
              m_cap=8192, s_cap=512)
    exact = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                             jnp.asarray(hits), occ_flat, noise, **kw)
    Sp = 64                                    # ~4 slots/ray: heavy pressure
    b = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                jnp.asarray(hits), occ_flat, noise,
                                occ_coarse=coarse, seg_pool_cap=Sp, **kw)
    assert int(b.total_nseg) > Sp              # pressure is real
    # every pooled sample is one of the exact path's samples for its ray
    # (striding selects a subset; it never invents positions)
    ets = np.asarray(exact.ts)
    eri = np.asarray(exact.ray_idx)
    evalid = np.asarray(exact.valid)
    bts = np.asarray(b.ts)
    bri = np.asarray(b.ray_idx)
    bvalid = np.asarray(b.valid)
    for r in range(N):
        exact_set = ets[(eri == r) & evalid]
        got = bts[(bri == r) & bvalid]
        if got.size == 0:
            continue
        dmin = np.min(np.abs(got[:, None] - exact_set[None, :]), axis=1)
        assert np.max(dmin) < 1e-5
        # strided t's are strictly increasing along the ray
        assert np.all(np.diff(got) > 0)
    # deltas are scaled UP by the combined stride so quadrature coverage is
    # preserved in aggregate (per-ray it is noisy at this extreme ~10x
    # pressure: a ray's few strided coarse segments may hold no
    # fine-occupied cell at all — the dilated superset property)
    le = float(np.sum(np.asarray(exact.deltas)[evalid]))
    lb = float(np.sum(np.asarray(b.deltas)[bvalid]))
    assert 0.3 * le < lb < 3.0 * le
    # most rays with demand still receive samples
    assert (np.asarray(b.counts) > 0).sum() >= N // 2

def test_pooled_sort_selection_matches_search_when_budgets_fit():
    """selection="sort" (one order-preserving sort compaction) must produce
    EXACTLY the selection="search" results — same samples, same slots, same
    segment layout — whenever neither the pool nor m_cap is under pressure
    (the normal carved-grid regime). The two modes only diverge under
    m_cap pressure (stride vs reference-style truncation)."""
    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         march_rays_train_pooled)
    rng = np.random.default_rng(17)
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.03).astype(np.uint8)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)

    N = 32
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = jnp.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, 512, G, SCALE),
              m_cap=4096, s_cap=4096, occ_coarse=coarse, seg_pool_cap=4096)
    a = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                hits, occ_flat, noise, selection="search",
                                **kw)
    b = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                hits, occ_flat, noise, selection="sort",
                                **kw)
    assert int(a.rm_samples) <= 4096           # m_cap actually fits
    assert int(a.total_nseg) <= 4096           # pool actually fits
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.counts),
                                  np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.ray_start),
                                  np.asarray(b.ray_start))
    v = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.ray_idx)[v],
                                  np.asarray(b.ray_idx)[v])
    np.testing.assert_allclose(np.asarray(a.ts), np.asarray(b.ts),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.xyzs), np.asarray(b.xyzs),
                               atol=1e-6)
    assert int(a.rm_samples) == int(b.rm_samples)


def test_pooled_sort_selection_matches_search_under_pressure():
    """selection="sort" shares the allocation + uniform-striding policy
    with "search", so the two must be bit-identical even under heavy
    m_cap AND pool pressure (the early-training regime). (An earlier
    round-4 sort variant truncated overflow rays instead — the reference
    kernel's policy — and cost ~2.7 dB on the 1000-step verify run; this
    test pins that striding semantics survive in both modes.)"""
    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         march_rays_train_pooled)
    rng = np.random.default_rng(23)
    G = 64
    occ = (rng.random((1, G, G, G)) < 0.15).astype(np.uint8)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, G)

    N = 16
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = jnp.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    # pool 256 slots (vs demand >> that) AND m_cap 512: both pressured
    kw = dict(scale=SCALE, cascades=1, exp_step_factor=0.0, grid_size=G,
              max_samples=512,
              n_candidates=num_lattice_steps(0.01, 0.01 + 2 * SQRT3 * SCALE,
                                             0.0, 512, G, SCALE),
              s_cap=4096, occ_coarse=coarse, seg_pool_cap=256, m_cap=256)
    a = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                hits, occ_flat, noise, selection="search",
                                **kw)
    b = march_rays_train_pooled(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                hits, occ_flat, noise, selection="sort",
                                **kw)
    assert int(a.total_nseg) > 256             # pool pressure is real
    assert int(a.rm_samples) > 256             # m_cap pressure is real
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.counts),
                                  np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.ray_start),
                                  np.asarray(b.ray_start))
    v = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.ray_idx)[v],
                                  np.asarray(b.ray_idx)[v])
    np.testing.assert_allclose(np.asarray(a.ts), np.asarray(b.ts),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               atol=1e-6)

def test_flat_sort_selection_matches_search():
    """march_rays_train's row-local sort selection must be bit-identical
    to the search path, single-level and two-level, with and without
    m_cap pressure (the warmup/multi-cascade marcher runs this path)."""
    from arnerf_tpu.ops.marching import build_coarse_occupancy
    rng = np.random.default_rng(31)
    occ = make_sphere_grid(radius=0.42)
    occ_flat = jnp.asarray(occ.reshape(-1))
    coarse = build_coarse_occupancy(occ_flat, 1, GRID)

    N = 24
    rays_o = np.tile([0.0, 0.0, -1.2], (N, 1)).astype(np.float32)
    tgt = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
    d = tgt - rays_o
    rays_d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    hits = jnp.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.zeros(3),
        jnp.full(3, SCALE)))
    noise = jnp.asarray(rng.random(N), jnp.float32)

    for m_cap in (4096, 256):                  # fits / pressured
        for oc in (None, coarse):              # single-level / two-level
            kw = march_kwargs(m_cap=m_cap, s_cap=512, occ_coarse=oc)
            a = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                 hits, occ_flat, noise,
                                 selection="search", **kw)
            b = march_rays_train(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                 hits, occ_flat, noise,
                                 selection="sort", **kw)
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid))
            np.testing.assert_array_equal(np.asarray(a.counts),
                                          np.asarray(b.counts))
            v = np.asarray(a.valid)
            np.testing.assert_array_equal(np.asarray(a.ray_idx)[v],
                                          np.asarray(b.ray_idx)[v])
            np.testing.assert_allclose(np.asarray(a.ts), np.asarray(b.ts),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(a.deltas),
                                       np.asarray(b.deltas), atol=1e-6)
            np.testing.assert_allclose(np.asarray(a.xyzs),
                                       np.asarray(b.xyzs), atol=1e-6)
