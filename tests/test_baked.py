"""Baked-field fast renderer: SH projection, sampling, oracle parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.models.ngp import GridState
from arnerf_tpu.ops.packbits import packbits
from arnerf_tpu.datasets.synthetic import (analytic_sigma, analytic_rgb,
                                           render_analytic)
from arnerf_tpu.datasets.ray_utils import (get_ray_directions, get_rays,
                                           look_at_pose)
from arnerf_tpu.insert.sh_math import sh9_basis
from arnerf_tpu.rendering_baked import (BakedField, bake_field, sample_baked,
                                        render_baked, fibonacci_sphere,
                                        N_CH)

SCALE = 0.5


def analytic_field(x, d):
    return analytic_sigma(x, SCALE), analytic_rgb(x, SCALE)


def make_grid_state(cfg):
    """Occupancy from the analytic density directly."""
    G = cfg.grid_size
    ax = (np.arange(G) + 0.5) / G * 2 * SCALE - SCALE
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.asarray(np.stack([X, Y, Z], -1).reshape(-1, 3), jnp.float32)
    sig = np.asarray(analytic_sigma(pts, SCALE))
    occ = (sig > 0.05).astype(np.uint8)
    dg = jnp.asarray(sig, jnp.float32).reshape(1, -1)
    return GridState(density_grid=dg, count_grid=jnp.ones_like(dg),
                     occ_flat=jnp.asarray(occ),
                     bitfield=packbits(dg.reshape(-1), 0.05))


def test_sh_projection_roundtrip():
    """bake_field's least-squares SH9 projection must reproduce a radiance
    that IS an SH9 function (deg<=2) almost exactly."""
    dirs = jnp.asarray(fibonacci_sphere(32))
    basis = sh9_basis(dirs)                                   # (32, 9)
    true_c = jnp.asarray(np.random.default_rng(0).normal(size=(9,)),
                         jnp.float32)
    vals = basis @ true_c                                     # (32,)
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(basis)))
    rec = pinv @ vals
    np.testing.assert_allclose(np.asarray(rec), np.asarray(true_c),
                               atol=1e-4)


def test_bake_and_sample_constant_color():
    """A direction-independent field bakes to SH with all the energy in the
    DC term; sampling returns the original color for any view direction."""
    B = 32
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    assert baked.rows.shape == (B ** 3, N_CH)
    # pick an interior point of the sphere (center (0, 0.05, 0), r=0.18)
    x = jnp.asarray([[0.0, 0.05, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    sh_d = sh9_basis(d)
    sig, rgb = sample_baked(baked.rows, x, sh_d, B, SCALE, "trilinear")
    sig_t, rgb_t = analytic_field(x, d)
    np.testing.assert_allclose(float(sig[0]), float(sig_t[0]), rtol=0.2)
    np.testing.assert_allclose(np.asarray(rgb[0]), np.asarray(rgb_t[0]),
                               atol=0.08)


def test_stochastic_sampling_is_trilinear_in_expectation():
    B = 16
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.normal(size=(B ** 3, N_CH)).astype(np.float32))
    rows = rows.at[:, 0].set(jnp.abs(rows[:, 0]))
    x = jnp.asarray(rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32))
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 5)
    sh_d = sh9_basis(d)
    sig_t, rgb_t = sample_baked(rows, x, sh_d, B, SCALE, "trilinear")
    K = 4000
    k = jax.random.PRNGKey(0)
    xs = jnp.tile(x, (K, 1))
    shs = jnp.tile(sh_d, (K, 1))
    # jitter is a per-axis tuple (a trailing (N, 3) dim tile-pads on TPU)
    jit_j = tuple(jax.random.uniform(jax.random.fold_in(k, d), (5 * K,))
                  for d in range(3))
    sig_s, rgb_s = sample_baked(rows, xs, shs, B, SCALE, "stochastic",
                                jitter=jit_j)
    sig_mean = np.asarray(sig_s).reshape(K, 5).mean(axis=0)
    np.testing.assert_allclose(sig_mean, np.asarray(sig_t), rtol=0.08,
                               atol=0.05)


@pytest.mark.parametrize("interp", ["trilinear", "stochastic"])
def test_baked_render_matches_oracle(interp):
    """Full-frame baked render of the analytic scene vs the dense-sampling
    oracle renderer."""
    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    B = 64
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       occ_mask=None, dtype=jnp.float32)

    W = H = 96
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    pose = look_at_pose(np.array([0.9, 0.25, 0.75]))
    ro, rd = get_rays(dirs, jnp.asarray(pose))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    gt, _, _ = render_analytic(ro, rd, SCALE, n_samples=512)
    out = render_baked(baked, gs, ro, rd, cfg, interp=interp,
                       T_threshold=1e-4, chunk=1 << 13)
    pred = np.asarray(out["rgb"]) + (1 - np.asarray(out["opacity"]))[:, None]
    gt_np = np.asarray(gt)
    mse = float(np.mean((pred - gt_np) ** 2))
    psnr = -10 * np.log10(mse)
    floor = 24.0 if interp == "trilinear" else 21.0
    assert psnr > floor, f"baked({interp}) vs oracle PSNR {psnr:.2f}"


def test_frame_device_fn_matches_render_baked():
    """baked_frame_device_fn (zero-readback FPS path) must dispatch the
    same computation as render_baked: with deterministic trilinear interp
    the scalar reduce equals the composed frame's rgb sum."""
    import jax
    from arnerf_tpu.rendering_baked import (render_baked,
                                            baked_frame_device_fn)
    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    B = 32
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8)
    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    out = render_baked(baked, gs, ro, rd, cfg, interp="trilinear",
                       T_threshold=1e-3)
    frame = baked_frame_device_fn(baked, ro, rd, interp="trilinear",
                                  T_threshold=1e-3)
    s = float(frame(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(s, float(jnp.sum(out["rgb"])), rtol=1e-5)


def test_bake_field_mean_sigma_and_seeded():
    """mean_sigma averages sigma over the quadrature directions (the noise
    reducer for stochastic bakes); seeded passes a per-chunk uint32 into
    field_fn; last-chunk padding must not corrupt rows."""
    B = 16
    seeds_seen = []

    def field_fn(x, d, seed):
        seeds_seen.append(seed)
        # sigma varies with direction: mean over fibonacci dirs ~= 2.0,
        # dir-0 value is distinct
        sig = 2.0 + d[:, 2]
        rgb = jnp.full((x.shape[0], 3), 0.25)
        return sig, rgb

    baked = bake_field(field_fn, SCALE, resolution=B, n_dirs=16,
                       mean_sigma=True, seeded=True, chunk=1000)
    # 4096 voxels / chunk 1000 -> 5 padded chunks, distinct seeds
    assert len(seeds_seen) >= 1
    sig = np.asarray(baked.rows[:, 0])
    np.testing.assert_allclose(sig, 2.0, atol=0.05)   # mean of z over sphere

    def field_fn0(x, d):
        return 2.0 + d[:, 2], jnp.full((x.shape[0], 3), 0.25)

    baked0 = bake_field(field_fn0, SCALE, resolution=B, n_dirs=16,
                        mean_sigma=False)
    d0z = fibonacci_sphere(16)[0, 2]
    np.testing.assert_allclose(np.asarray(baked0.rows[:, 0]), 2.0 + d0z,
                               atol=1e-4)


def test_bake_chunk_padding_matches_single_chunk():
    """Padding the voxel list to a chunk multiple (one compiled program for
    all chunks) must give bit-identical rows to a single-chunk bake."""
    B = 16
    occ = np.zeros(B ** 3, bool)
    occ[np.random.default_rng(7).choice(B ** 3, 999, replace=False)] = True
    a = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8,
                   occ_mask=occ, chunk=1 << 20)
    b = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8,
                   occ_mask=occ, chunk=100)          # 999 -> 10 padded chunks
    np.testing.assert_array_equal(np.asarray(a.rows), np.asarray(b.rows))


def test_bake_ngp_stoch_close_to_exact():
    """The stochastic-corner bake (8x fewer gather rows) must agree with the
    exact bake up to the documented ~1/sqrt(n_dirs) estimator noise."""
    from arnerf_tpu.rendering_baked import bake_ngp
    from arnerf_tpu.models.ngp import ngp_init
    cfg = NGPConfig(scale=SCALE)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    # inflate the hash table so sigma/rgb carry real signal at random init
    params = dict(params, hash_table=params["hash_table"] * 3000.0)
    gs = make_grid_state(cfg)
    exact = bake_ngp(params, gs, cfg, resolution=24, n_dirs=16,
                     stoch=False)
    st = bake_ngp(params, gs, cfg, resolution=24, n_dirs=64, stoch=True)
    occ = np.asarray(exact.rows[:, 0]) > 0
    assert occ.any()
    # sigma: mean over 64 draws; relative error bounded in aggregate
    se, ss = np.asarray(exact.rows[occ, 0]), np.asarray(st.rows[occ, 0])
    rel = np.abs(ss - se) / (np.abs(se) + 1e-2)
    assert np.median(rel) < 0.25, float(np.median(rel))
    # DC SH terms agree in aggregate too
    ce = np.asarray(exact.rows[occ, 1:28:9])
    cs = np.asarray(st.rows[occ, 1:28:9])
    assert np.median(np.abs(cs - ce) / (np.abs(ce) + 1e-2)) < 0.25


def test_bake_ngp_smoke():
    """bake_ngp runs on an untrained model and produces the right shapes."""
    from arnerf_tpu.rendering_baked import bake_ngp
    from arnerf_tpu.models.ngp import ngp_init
    cfg = NGPConfig(scale=SCALE)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = make_grid_state(cfg)
    baked = bake_ngp(params, gs, cfg, resolution=32, n_dirs=8,
                     dtype=jnp.float32)
    assert baked.rows.shape == (32 ** 3, N_CH)
    assert np.isfinite(np.asarray(baked.rows)).all()


def test_bake_ngp_non_multiple_resolution():
    """--bake_res values that aren't multiples of the occupancy grid size
    must resample correctly (192 vs G=128 silently produced a wrong-size
    mask via np.repeat)."""
    from arnerf_tpu.rendering_baked import bake_ngp
    from arnerf_tpu.models.ngp import ngp_init
    cfg = NGPConfig(scale=SCALE)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = make_grid_state(cfg)
    for B in (48, 96):   # one below G=128 non-divisor, one non-multiple-ish
        baked = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8,
                         dtype=np.float32)
        assert baked.rows.shape == (B ** 3, N_CH)
        # occupied region must survive resampling (the sphere is solid)
        assert float(jnp.max(baked.rows[:, 0])) > 0


def test_bake_ngp_multi_cascade_smoke():
    """bake_ngp on a scale-2 (3-cascade) NGP: per-cascade occupancy slices
    drive per-cascade grids; the render runs end to end (random-init
    field — shapes/finiteness, occupancy plumbing, and that outer-cascade
    occupancy actually produces baked content)."""
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.rendering_baked import bake_ngp, render_baked
    cfg = NGPConfig(scale=2.0, grid_size=16, n_levels=2,
                    log2_hashmap_size=8, base_resolution=4)
    assert cfg.cascades == 3
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    G = cfg.grid_size
    occ = np.zeros((cfg.cascades, G, G, G), np.uint8)
    occ[0, 6:10, 6:10, 6:10] = 1          # inner blob (|x| < 0.5)
    occ[2, 1:3, 7:9, 7:9] = 1             # outer blob (x near -1.7)
    gs = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))
    baked = bake_ngp(params, gs, cfg, resolution=16, n_dirs=8)
    assert baked.cascades == 3
    assert baked.rows.shape == (3 * 16 ** 3, N_CH)
    # outer-cascade occupancy must reach the union AABB
    assert float(baked.aabb_lo[0]) < -1.0
    rows = np.asarray(baked.rows)
    assert np.isfinite(rows).all()
    assert (rows[2 * 16 ** 3:, 0] > 0).any(), "outer cascade baked empty"
    ro = jnp.asarray(np.tile([0.0, 0.0, -4.5], (64, 1)), jnp.float32)
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-1.5, 1.5, (64, 3)).astype(np.float32)
    rd = jnp.asarray(tgt - np.asarray(ro))
    out = render_baked(baked, gs, ro, rd, cfg, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(jnp.max(out["opacity"])) <= 1.0 + 1e-5


def test_mc_bake_and_render_matches_oracle():
    """Multi-cascade bake + exponential-stepping render vs the analytic
    oracle on a scale-2 (3-cascade) scene. This is the path that round 2
    refused (ADVICE r2) — the test pins that outer-cascade content (the
    ground slab at |x| up to 2) and inner content (sphere/box spanning
    the 0.5 cascade boundary) both render."""
    from arnerf_tpu.rendering_baked import (bake_field_mc,
                                            cascade_half_extents,
                                            render_baked)
    SC = 2.0
    C = 3
    B = 96
    assert cascade_half_extents(C, SC) == [0.5, 1.0, 2.0]

    def field(x, d):
        return analytic_sigma(x, SC), analytic_rgb(x, SC)

    # per-cascade occupancy from the analytic density at voxel centers
    masks = []
    for h in cascade_half_extents(C, SC):
        ax = (np.arange(B, dtype=np.float32) + 0.5) / B * 2 * h - h
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
        masks.append(np.asarray(analytic_sigma(pts, SC)) > 1e-2)
    baked = bake_field_mc(field, SC, C, resolution=B, occ_masks=masks,
                          n_dirs=16)
    assert baked.cascades == C
    assert baked.rows.shape[0] == C * B ** 3
    # the slab reaches |x|,|z| = 2: the union AABB must extend past the
    # inner cascades
    assert float(baked.aabb_hi[0]) > 1.5 and float(baked.aabb_lo[2]) < -1.5

    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]) * SC * 2.2)))
    res = render_baked(baked, None, ro, rd, None, key=jax.random.PRNGKey(2),
                       T_threshold=1e-3)
    rdn = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt_rgb, gt_opa, _ = render_analytic(ro, rdn, SC, n_samples=1024,
                                        white_bg=False)
    pred = np.asarray(res["rgb"])
    mse = float(np.mean((pred - np.asarray(gt_rgb)) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 24.0, f"MC baked vs oracle PSNR {psnr:.1f}"
    # opacity agreement proves both slab (outer) and object (inner) march
    assert np.mean(np.abs(np.asarray(res["opacity"])
                          - np.asarray(gt_opa))) < 0.05


def test_mc_split_color_path():
    """The MC renderer's sigma-first split path must reproduce the unsplit
    MC render: opacity/depth to float tolerance (same weight math, same
    jitter, per-sample dts), rgb up to the documented w<=1e-4 color drop
    when the window covers the whole round; window 8 must stay visually
    identical (the single-cascade guarantee, test_split_color_path)."""
    from arnerf_tpu.rendering_baked import (bake_field_mc,
                                            cascade_half_extents,
                                            render_baked_mc_uniform)
    SC = 2.0
    C = 3
    B = 64

    def field(x, d):
        return analytic_sigma(x, SC), analytic_rgb(x, SC)

    masks = []
    for h in cascade_half_extents(C, SC):
        ax = (np.arange(B, dtype=np.float32) + 0.5) / B * 2 * h - h
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
        masks.append(np.asarray(analytic_sigma(pts, SC)) > 1e-2)
    baked = bake_field_mc(field, SC, C, resolution=B, occ_masks=masks,
                          n_dirs=16)
    assert baked.sigma is not None and baked.sigma.shape == (C * B ** 3,)

    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]) * SC * 2.2)))
    key = jax.random.PRNGKey(7)
    S = 16
    kw = dict(B=B, scale=SC, cascades=C, T_threshold=1e-3,
              samples_per_round=S)
    exact = render_baked_mc_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                    ro, rd, key, color_window=0, **kw)
    split = render_baked_mc_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                    ro, rd, key, sigma=baked.sigma,
                                    color_window=S, **kw)
    np.testing.assert_allclose(np.asarray(split["opacity"]),
                               np.asarray(exact["opacity"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(split["depth"]),
                               np.asarray(exact["depth"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(split["rgb"]),
                               np.asarray(exact["rgb"]), atol=4e-3)

    w8 = render_baked_mc_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, sigma=baked.sigma,
                                 color_window=8, **kw)
    np.testing.assert_allclose(np.asarray(w8["opacity"]),
                               np.asarray(exact["opacity"]), atol=1e-5)
    mse = float(np.mean((np.asarray(w8["rgb"])
                         - np.asarray(exact["rgb"])) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 38.0, f"MC window-8 vs exact PSNR {psnr:.1f}"

    # quantized occupied-only color table over the concatenated MC layout:
    # same weights bit-for-bit (sigma path untouched), color within int8
    # noise of the dense split render
    assert baked.rows_q is not None and baked.row_index.shape == \
        (C * B ** 3,)
    q8 = render_baked_mc_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, sigma=baked.sigma,
                                 color_window=8, row_index=baked.row_index,
                                 rows_q=baked.rows_q, **kw)
    np.testing.assert_allclose(np.asarray(q8["opacity"]),
                               np.asarray(w8["opacity"]), atol=1e-6)
    mse = float(np.mean((np.asarray(q8["rgb"]) - np.asarray(w8["rgb"])) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 38.0, f"MC quantized vs dense split PSNR {psnr:.1f}"


def test_sigma_mip_covers_density_and_only_near_density():
    """build_sigma_mip marks exactly the dilated supercells of nonzero-sigma
    voxels, including for B not divisible by 8."""
    from arnerf_tpu.rendering_baked import build_sigma_mip, MIP_FACTOR
    B = 20                                       # Bc = ceil(20/8) = 3
    sig = np.zeros((B, B, B), np.float32)
    sig[2, 3, 4] = 1.0                           # supercell (0, 0, 0)
    sig[17, 17, 17] = 1.0                        # supercell (2, 2, 2)
    mip = np.asarray(build_sigma_mip(sig.reshape(-1), B)).reshape(3, 3, 3)
    assert mip[0, 0, 0] and mip[2, 2, 2]
    # dilation by 1: neighbors marked
    assert mip[1, 1, 1]
    assert mip[0, 1, 1] and mip[1, 0, 0]
    # (0,0,2) is 2 supercells from both sources in some axis -> unmarked
    assert not mip[0, 0, 2] and not mip[2, 0, 0] and not mip[0, 2, 0]


def test_mip_prelude_matches_miplless_render():
    """The coarse-mip prelude (skip-to-surface + in-box background kill)
    must not change the rendered image vs the mip-less path."""
    import jax
    from arnerf_tpu.rendering_baked import render_baked_uniform
    B = 32
    rng = np.random.default_rng(3)
    rows = np.zeros((B ** 3, N_CH), np.float32)
    # a dense ball of radius 0.15 at center
    ax = (np.arange(B) + 0.5) / B * 2 * SCALE - SCALE
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    ball = (X ** 2 + Y ** 2 + Z ** 2) < 0.15 ** 2
    rows[ball.reshape(-1), 0] = 20.0
    rows[ball.reshape(-1), 1] = 1.5   # r DC
    from arnerf_tpu.rendering_baked import build_sigma_mip
    mip = jnp.asarray(build_sigma_mip(rows[:, 0], B))
    rows_j = jnp.asarray(rows)
    lo = jnp.full(3, -SCALE)
    hi = jnp.full(3, SCALE)
    n = 64
    ro = np.tile([[0.0, 0.0, -1.2]], (n, 1)).astype(np.float32)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tgt = np.stack([0.35 * np.cos(th), 0.35 * np.sin(th),
                    np.zeros(n)], -1).astype(np.float32)
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    kw = dict(B=B, scale=SCALE, interp="trilinear", n_steps=128,
              samples_per_round=16)
    a = render_baked_uniform(rows_j, lo, hi, jnp.asarray(ro),
                             jnp.asarray(rd), jax.random.PRNGKey(0), **kw)
    b = render_baked_uniform(rows_j, lo, hi, jnp.asarray(ro),
                             jnp.asarray(rd), jax.random.PRNGKey(0),
                             mip=mip, **kw)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(b["opacity"]),
                               np.asarray(a["opacity"]), atol=2e-3)


def test_split_color_path_matches_exact():
    """The sigma-first split path (color_window > 0) must reproduce the
    unsplit stochastic render: opacity/depth exactly (same weight math,
    same jitter), rgb up to the documented w<=1e-4 color drop when the
    window covers the whole round (color_window == S)."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    assert baked.sigma is not None
    W = H = 64
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    from arnerf_tpu.rendering_baked import render_baked_uniform
    kw = dict(B=B, scale=SCALE, interp="stochastic", T_threshold=1e-3,
              n_steps=96, samples_per_round=16, mip=baked.mip)
    key = jax.random.PRNGKey(5)
    exact = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, color_window=0, **kw)
    split = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, sigma=baked.sigma,
                                 color_window=16, **kw)
    np.testing.assert_allclose(np.asarray(split["opacity"]),
                               np.asarray(exact["opacity"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(split["depth"]),
                               np.asarray(exact["depth"]), atol=1e-4)
    # full-round window: only w <= 1e-4 color drops (bounded by S * eps)
    np.testing.assert_allclose(np.asarray(split["rgb"]),
                               np.asarray(exact["rgb"]), atol=4e-3)

    # production window 8: tail color of >8-sample semi-transparent spans
    # may drop; must stay visually identical (PSNR vs exact)
    w8 = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                              ro, rd, key, sigma=baked.sigma,
                              color_window=8, **kw)
    mse = float(np.mean((np.asarray(w8["rgb"])
                         - np.asarray(exact["rgb"])) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 38.0, f"window-8 vs exact PSNR {psnr:.1f}"


def test_t_far_clamp_semantics():
    """Per-ray far clamp (the AR dirty-rect mesh-depth bound): a huge
    t_far must be a no-op (bit-exact vs unclamped), a mid-scene clamp can
    only reduce opacity, and depth mass must stay in front of the clamp.
    t_far is in the CALLER's ray parameterization (unnormalized dirs)."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    W = H = 32
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))   # unnormalized pinhole dirs
    from arnerf_tpu.rendering_baked import render_baked_uniform
    kw = dict(B=B, scale=SCALE, interp="stochastic", T_threshold=1e-3,
              n_steps=96, samples_per_round=16, mip=baked.mip,
              sigma=baked.sigma, color_window=8)
    key = jax.random.PRNGKey(9)
    base = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                ro, rd, key, **kw)
    huge = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                ro, rd, key,
                                t_far=jnp.full(ro.shape[0], 1e6), **kw)
    np.testing.assert_array_equal(np.asarray(huge["rgb"]),
                                  np.asarray(base["rgb"]))
    np.testing.assert_array_equal(np.asarray(huge["opacity"]),
                                  np.asarray(base["opacity"]))
    # clamp at the per-ray median surface depth: opacity can only drop
    med = jnp.where(base["opacity"] > 0.5, base["depth"], 1e6)
    clamped = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                   ro, rd, key, t_far=med, **kw)
    assert np.all(np.asarray(clamped["opacity"])
                  <= np.asarray(base["opacity"]) + 1e-5)
    assert float(jnp.sum(clamped["opacity"])) \
        < float(jnp.sum(base["opacity"]))
    # 0 = "no mesh at this pixel" = no clamp
    zero = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                ro, rd, key,
                                t_far=jnp.zeros(ro.shape[0]), **kw)
    np.testing.assert_array_equal(np.asarray(zero["opacity"]),
                                  np.asarray(base["opacity"]))


def test_block4_silhouette_block_far_content():
    """A 2x2 block whose ray 0 MISSES the tight AABB while a sibling hits
    content far from the camera (entry t > one box diagonal) must still
    render: the block prelude's t-window must anchor at the HITTING
    members' entry, not at a missed member's clamped t1=0 (which would
    end the static diagonal-length coarse window before the geometry).
    Directions are deliberately unnormalized (|d|=1.1): the prelude's
    world-unit spacing guarantees require internal normalization."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=8,
                       dtype=jnp.float32)
    hi_y = float(np.asarray(baked.aabb_hi)[1])
    # slab occupies y in [0.55, 0.62]*SCALE for ALL x,z: a -z ray at
    # y=0.585*SCALE rides inside it (opaque on entry); one at hi_y+0.03
    # misses the AABB entirely. Near-parallel block (same direction,
    # small origin offset) mimics a silhouette-straddling pixel block.
    d = jnp.asarray([[0.0, 0.0, -1.1]] * 4)
    ro = jnp.asarray([[0.0, hi_y + 0.03, 3.0],
                      [0.0, 0.585 * SCALE, 3.0],
                      [0.0, 0.585 * SCALE, 3.0],
                      [0.0, 0.585 * SCALE, 3.0]])
    from arnerf_tpu.rendering_baked import render_baked_uniform
    res = render_baked_uniform(
        baked.rows, baked.aabb_lo, baked.aabb_hi, ro, d,
        jax.random.PRNGKey(0), B=B, scale=SCALE, interp="stochastic",
        T_threshold=1e-2, n_steps=192, samples_per_round=16,
        mip=baked.mip, sigma=baked.sigma, color_window=8, block4=True,
        row_index=baked.row_index, rows_q=baked.rows_q)
    opa = np.asarray(res["opacity"])
    dep = np.asarray(res["depth"])
    assert opa[0] == 0.0, f"missing ray rendered: {opa[0]}"
    assert (opa[1:] > 0.9).all(), f"far content lost: {opa}"
    # entry at world z=+0.5 face -> t_world ~ 2.5, caller param = /1.1
    assert (np.abs(dep[1:] - 2.5 / 1.1) < 0.4).all(), dep


def test_quantized_color_table_matches_dense():
    """The occupied-only int8 color table (rows_q/row_index) must leave
    opacity/depth bit-identical (sigma path untouched) and rgb within
    int8 quantization noise of the dense split path."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    assert baked.rows_q is not None and baked.row_index is not None
    # structure: reserved zero row, index map hits only baked voxels
    rq = np.asarray(baked.rows_q)
    ri = np.asarray(baked.row_index)
    assert (rq[0] == 0).all()
    assert rq.shape[0] == int(ri.max()) + 1
    occ = np.asarray(baked.rows[:, 0]) > 0
    assert (ri[occ] > 0).all()
    W = H = 64
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    from arnerf_tpu.rendering_baked import render_baked_uniform
    kw = dict(B=B, scale=SCALE, interp="stochastic", T_threshold=1e-3,
              n_steps=96, samples_per_round=16, mip=baked.mip,
              sigma=baked.sigma, color_window=8)
    key = jax.random.PRNGKey(5)
    dense = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, **kw)
    quant = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                 ro, rd, key, row_index=baked.row_index,
                                 rows_q=baked.rows_q, **kw)
    np.testing.assert_array_equal(np.asarray(quant["opacity"]),
                                  np.asarray(dense["opacity"]))
    np.testing.assert_array_equal(np.asarray(quant["depth"]),
                                  np.asarray(dense["depth"]))
    mse = float(np.mean((np.asarray(quant["rgb"])
                         - np.asarray(dense["rgb"])) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, f"quantized vs dense color PSNR {psnr:.1f}"


def test_block4_bucketing_matches_flat():
    """2x2-block bucketing + quarter-res prelude (block4) must reproduce
    the flat path's image: same weights up to the conservative window
    margins (pure empty-space fetches), same pixel assignment."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    W = H = 64
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    from arnerf_tpu.rendering_baked import cull_and_buckets
    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    flat = render_baked(baked, gs, ro, rd, cfg, interp="trilinear",
                        T_threshold=1e-3, chunk=1 << 12)
    blk = render_baked(baked, gs, ro, rd, cfg, interp="trilinear",
                       T_threshold=1e-3, chunk=1 << 12, img_wh=(W, H))
    # trilinear is deterministic, but the two preludes sample the mip
    # differently (flat: stride-2 per ray; block4: stride-1 on ray 0 of
    # each 2x2 block): a boundary-grazing ray whose only sigma is
    # trilerp spill (<=1 fine voxel outside an occupied supercell) can be
    # killed by one prelude and kept by the other, so tiny opacity
    # (~1e-2) may appear in one image only. Both are conservative for
    # real (voxel-supported) content; require tight agreement up to that
    # boundary-graze scale.
    np.testing.assert_allclose(np.asarray(blk["opacity"]),
                               np.asarray(flat["opacity"]), atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(blk["rgb"]),
                               np.asarray(flat["rgb"]), atol=1.5e-2)
    mse = float(np.mean((np.asarray(blk["rgb"])
                         - np.asarray(flat["rgb"])) ** 2))
    assert -10 * np.log10(max(mse, 1e-12)) > 45.0
    # bucketing internals: block grouping covers exactly the block-hit rays
    buckets, N, blocked = cull_and_buckets(baked, ro, rd, 1 << 12,
                                           img_wh=(W, H))
    assert blocked and N == W * H
    sl = np.concatenate([b[0] for b in buckets])
    assert len(sl) % 4 == 0 and len(np.unique(sl)) == len(sl)


def test_bake_analytic_object_field_matches_oracle():
    """bench.py's object-only FPS path: bake_analytic_field (no training)
    through the production bake code must render the object-only scene at
    oracle quality, and its occupancy must be Lego-like sparse (the whole
    point of the metric — most rays die before any fetch)."""
    from arnerf_tpu.datasets.synthetic import bake_analytic_field
    B = 64
    baked = bake_analytic_field(scale=SCALE, resolution=B, object_only=True,
                                dtype=jnp.float32)
    occ_frac = float(np.mean(np.asarray(baked.sigma) > 0))
    assert occ_frac < 0.10, f"object occupancy {occ_frac:.3f} not sparse"
    # tight AABB must hug the objects, not the cube
    lo, hi = np.asarray(baked.aabb_lo), np.asarray(baked.aabb_hi)
    assert np.all(hi - lo < 2 * SCALE * 0.95)

    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    W = H = 96
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    pose = look_at_pose(np.array([0.9, 0.25, 0.75]))
    ro, rd = get_rays(dirs, jnp.asarray(pose))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt, _, _ = render_analytic(ro, rd, SCALE, n_samples=512,
                               object_only=True)
    out = render_baked(baked, gs, ro, rd, cfg, interp="trilinear",
                       T_threshold=1e-4, chunk=1 << 13)
    pred = np.asarray(out["rgb"]) + (1 - np.asarray(out["opacity"]))[:, None]
    mse = float(np.mean((pred - np.asarray(gt)) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 24.0, f"object-only baked vs oracle PSNR {psnr:.2f}"


def test_mip_dist_is_chebyshev_distance():
    """build_mip_dist = exact Chebyshev distance transform of the dilated
    occupancy mip (0 on occupied supercells)."""
    from arnerf_tpu.rendering_baked import (build_sigma_mip, build_mip_dist,
                                            MIP_FACTOR)
    B = 40                                        # Bc = 5
    Bc = -(-B // MIP_FACTOR)
    rng = np.random.default_rng(7)
    sig = (rng.random((B, B, B)) < 0.002).astype(np.float32)
    mip = np.asarray(build_sigma_mip(sig.reshape(-1), B)).reshape(Bc, Bc, Bc)
    dist = np.asarray(build_mip_dist(jnp.asarray(mip.reshape(-1)), Bc)) \
        .reshape(Bc, Bc, Bc)
    occ = np.argwhere(mip > 0)
    assert len(occ), "fixture needs occupancy"
    grid = np.stack(np.meshgrid(*[np.arange(Bc)] * 3, indexing="ij"), -1)
    bf = np.min(np.max(np.abs(grid[..., None, :] - occ[None, None, None]),
                       axis=-1), axis=-1)
    np.testing.assert_array_equal(dist, np.minimum(bf, 255))
    # empty field: distance saturates at Bc everywhere (no false hits)
    d0 = np.asarray(build_mip_dist(jnp.zeros(Bc ** 3, jnp.uint8), Bc))
    assert (d0 == Bc).all()


def test_dist_prelude_interval_covers_fine_density():
    """The distance-stepping prelude's window (with the renderer's 1.5-
    supercell margins) must contain every fine voxel with sigma > 0 along
    each ray, and kill exactly the rays whose path holds no dilated
    occupancy — the same contract the fixed-stride ladder satisfies."""
    from arnerf_tpu.rendering_baked import (build_sigma_mip, build_mip_dist,
                                            _prelude_dist, MIP_FACTOR)
    B = 64
    Bc = -(-B // MIP_FACTOR)
    w_c = MIP_FACTOR * 2 * SCALE / B
    rng = np.random.default_rng(11)
    # a few random occupied blobs
    sig = np.zeros((B, B, B), np.float32)
    for _ in range(6):
        c = rng.integers(4, B - 4, size=3)
        sig[c[0] - 2:c[0] + 2, c[1] - 2:c[1] + 2, c[2] - 2:c[2] + 2] = 5.0
    mip = build_sigma_mip(jnp.asarray(sig.reshape(-1)), B)
    dist = build_mip_dist(mip, Bc)

    n = 4096
    ro = rng.normal(size=(n, 3)).astype(np.float32)
    ro = ro / np.linalg.norm(ro, axis=1, keepdims=True) * 1.6
    tgt = rng.uniform(-SCALE, SCALE, size=(n, 3)).astype(np.float32)
    rd = tgt - ro
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)
    # box clip
    with np.errstate(divide="ignore"):
        inv = 1.0 / rd
    ta = (-SCALE - ro) * inv
    tb = (SCALE - ro) * inv
    t1 = np.maximum(np.minimum(ta, tb).max(axis=1), 0.0).astype(np.float32)
    t2 = np.maximum(ta, tb).min(axis=1).astype(np.float32)
    hit = t2 > t1

    any_occ, first, last = jax.jit(
        lambda d, ro, rd, t1, t2: _prelude_dist(d, ro, rd, t1, t2, B, SCALE)
    )(dist, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(t1),
      jnp.asarray(t2))
    any_occ = np.asarray(any_occ) & hit
    t_start = np.asarray(first) - 1.5 * w_c
    t_end = np.asarray(last) + 1.5 * w_c

    # brute force: fine sampling of sigma along each ray
    ts = np.linspace(0, 1, 1024, dtype=np.float32)
    tt = t1[:, None] + (t2 - t1)[:, None] * ts[None, :]
    pos = ro[:, None, :] + tt[..., None] * rd[:, None, :]
    ij = np.clip(((pos + SCALE) / (2 * SCALE) * B).astype(np.int64),
                 0, B - 1)
    s = sig[ij[..., 0], ij[..., 1], ij[..., 2]]
    s = np.where((tt < t2[:, None]) & hit[:, None], s, 0.0)
    bf_any = (s > 0).any(axis=1)
    assert not (bf_any & ~any_occ).any(), "prelude killed a density ray"
    rows = np.where(bf_any)[0]
    bf_first = tt[rows, np.argmax(s[rows] > 0, axis=1)]
    bf_last = tt[rows, s.shape[1] - 1
                 - np.argmax(s[rows, ::-1] > 0, axis=1)]
    assert (t_start[rows] <= bf_first + 1e-5).all()
    assert (t_end[rows] >= bf_last - 1e-5).all()


def test_dist_prelude_matches_ladder_render():
    """Rendering with the distance-stepping prelude must match both the
    fixed-stride-ladder prelude and the mip-less full march (trilinear:
    deterministic sampling, windows only move where provably empty)."""
    from arnerf_tpu.rendering_baked import (render_baked_uniform,
                                            build_sigma_mip, build_mip_dist,
                                            MIP_FACTOR)
    B = 32
    rows = np.zeros((B ** 3, N_CH), np.float32)
    ax = (np.arange(B) + 0.5) / B * 2 * SCALE - SCALE
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    ball = (X ** 2 + Y ** 2 + Z ** 2) < 0.15 ** 2
    rows[ball.reshape(-1), 0] = 20.0
    rows[ball.reshape(-1), 1] = 1.5
    mip = build_sigma_mip(jnp.asarray(rows[:, 0]), B)
    dist = build_mip_dist(mip, -(-B // MIP_FACTOR))
    rows_j = jnp.asarray(rows)
    lo = jnp.full(3, -SCALE)
    hi = jnp.full(3, SCALE)
    n = 64
    ro = np.tile([[0.0, 0.0, -1.2]], (n, 1)).astype(np.float32)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tgt = np.stack([0.35 * np.cos(th), 0.35 * np.sin(th),
                    np.zeros(n)], -1).astype(np.float32)
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    kw = dict(B=B, scale=SCALE, interp="trilinear", n_steps=128,
              samples_per_round=16)
    key = jax.random.PRNGKey(0)
    flat = render_baked_uniform(rows_j, lo, hi, jnp.asarray(ro),
                                jnp.asarray(rd), key, **kw)
    ladder = render_baked_uniform(rows_j, lo, hi, jnp.asarray(ro),
                                  jnp.asarray(rd), key, mip=mip, **kw)
    distp = render_baked_uniform(rows_j, lo, hi, jnp.asarray(ro),
                                 jnp.asarray(rd), key, mip=mip,
                                 mip_dist=dist, **kw)
    for ref in (flat, ladder):
        np.testing.assert_allclose(np.asarray(distp["rgb"]),
                                   np.asarray(ref["rgb"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(distp["opacity"]),
                                   np.asarray(ref["opacity"]), atol=2e-3)


def test_bake_field_ships_mip_dist_and_full_renderer_uses_it():
    """bake_field emits mip_dist and the production render_baked path
    stays oracle-accurate with the distance prelude active (block4 +
    split + quantized color all composed)."""
    B = 48
    baked = bake_field(analytic_field, SCALE, resolution=B, n_dirs=16,
                       dtype=jnp.float32)
    assert baked.mip_dist is not None
    Bc = -(-B // 8)
    d = np.asarray(baked.mip_dist)
    assert d.shape == (Bc ** 3,)
    assert ((d == 0) == (np.asarray(baked.mip) > 0)).all()

    cfg = NGPConfig(scale=SCALE, grid_size=64)
    gs = make_grid_state(cfg)
    W = H = 64
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]))))
    out = render_baked(baked, gs, ro, rd, cfg, key=jax.random.PRNGKey(2),
                       T_threshold=1e-3, img_wh=(W, H))
    # the distance prelude must not change the image vs the ladder prelude
    # (same windows wherever the ladder found occupancy; the margins make
    # discretization differences invisible at the fine step)
    ref = render_baked(baked._replace(mip_dist=None), gs, ro, rd, cfg,
                       key=jax.random.PRNGKey(2), T_threshold=1e-3,
                       img_wh=(W, H))
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["opacity"]),
                               np.asarray(ref["opacity"]), atol=2e-3)
    # and stays anchored to the analytic oracle (48^3 bake, raw volume rgb)
    rdn = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt_rgb, gt_op, _ = render_analytic(ro, rdn, SCALE, n_samples=512,
                                       white_bg=False)
    mse = float(jnp.mean((out["rgb"] - gt_rgb) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 22.0, f"dist-prelude full path vs oracle: {psnr:.1f} dB"

def test_mc_prelude_and_compaction_invariance():
    """The MC distance-field prelude (build_mip_dist_mc) + survivor
    compaction must not change the render: same opacity/depth/rgb as the
    preludeless render to float tolerance. Conservativeness of the
    outer-cube Chebyshev field over ALL cascades is the property under
    test — a skipped occupied supercell of ANY cascade would show up as
    missing opacity."""
    from arnerf_tpu.rendering_baked import (bake_field_mc,
                                            cascade_half_extents,
                                            render_baked_mc_uniform)
    SC = 2.0
    C = 3
    B = 64

    def field(x, d):
        return analytic_sigma(x, SC), analytic_rgb(x, SC)

    masks = []
    for h in cascade_half_extents(C, SC):
        ax = (np.arange(B, dtype=np.float32) + 0.5) / B * 2 * h - h
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
        masks.append(np.asarray(analytic_sigma(pts, SC)) > 1e-2)
    baked = bake_field_mc(field, SC, C, resolution=B, occ_masks=masks,
                          n_dirs=16)
    assert baked.mip_dist is not None
    Bc = B // 8
    assert baked.mip_dist.shape == (Bc ** 3,)
    # occupied supercells read distance 0; some empty corner reads > 1
    md = np.asarray(baked.mip_dist).reshape(Bc, Bc, Bc)
    assert (md == 0).any() and (md > 1).any()

    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    ro, rd = get_rays(dirs, jnp.asarray(look_at_pose(
        np.array([0.9, 0.25, 0.75]) * SC * 2.2)))
    kw = dict(B=B, scale=SC, cascades=C, T_threshold=1e-3,
              samples_per_round=16, sigma=baked.sigma, color_window=8,
              row_index=baked.row_index, rows_q=baked.rows_q)
    # starting the exponential ladder at the per-ray prelude entry shifts
    # every sample position (one-voxel steps + stochastic trilerp), so
    # per-ray per-key outputs differ by quadrature noise at silhouettes;
    # the conservativeness witness is EXPECTED quality — 4-key means vs
    # the analytic oracle must match (a skipped occupied supercell of any
    # cascade would cost dB / opacity mass, not noise)
    from arnerf_tpu.datasets.synthetic import render_analytic
    rdn = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt_rgb, gt_opa, _ = render_analytic(ro, rdn, SC, n_samples=1024,
                                        white_bg=False)
    stats = {}
    for label, md, cp in (("base", None, False),
                          ("fast", baked.mip_dist, True)):
        rgbs, opas = [], []
        for s in range(4):
            r = render_baked_mc_uniform(
                baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd,
                jax.random.PRNGKey(s), mip_dist=md, compact=cp, **kw)
            rgbs.append(np.asarray(r["rgb"]))
            opas.append(np.asarray(r["opacity"]))
        mse = float(np.mean((np.mean(rgbs, 0) - np.asarray(gt_rgb)) ** 2))
        stats[label] = (-10 * np.log10(max(mse, 1e-12)),
                        float(np.mean(np.abs(np.mean(opas, 0)
                                             - np.asarray(gt_opa)))))
    # recorded: base 28.22 dB / 0.0155, fast 28.22 dB / 0.0154
    assert stats["fast"][0] > stats["base"][0] - 0.25, stats
    assert stats["fast"][1] < stats["base"][1] + 0.002, stats


def test_display_mode_matches_f32_path():
    """display=True (round 5): on-device white-bg blend + u8 pack must
    agree with the f32 path's host-side composition to u8 rounding."""
    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    baked = bake_field(analytic_field, SCALE, resolution=48, n_dirs=16,
                       occ_mask=None, dtype=jnp.float32)
    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    pose = look_at_pose(np.array([0.9, 0.25, 0.75]))
    ro, rd = get_rays(dirs, jnp.asarray(pose))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(5)
    a = render_baked(baked, gs, ro, rd, cfg, key=key, T_threshold=1e-4,
                     chunk=1 << 11)
    b = render_baked(baked, gs, ro, rd, cfg, key=key, T_threshold=1e-4,
                     chunk=1 << 11, display=True, white_bg=1.0)
    ref = np.clip(np.asarray(a["rgb"])
                  + (1 - np.asarray(a["opacity"]))[:, None], 0, 1)
    got = np.asarray(b["rgb_u8"], np.float32) / 255.0
    assert np.abs(got - ref).max() < 2.5 / 255.0, np.abs(got - ref).max()
    np.testing.assert_allclose(np.asarray(b["opacity"]),
                               np.asarray(a["opacity"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(b["depth"]),
                               np.asarray(a["depth"]), rtol=2e-3, atol=2e-3)


def test_display_frame_fn_matches_render_baked_display():
    """baked_frame_display_fn (round 5, VERDICT r4 #6): the one-readback
    assembled u8 frame must equal render_baked(display=True)'s image —
    same renderer per bucket, same key, same blend — to u8 rounding."""
    from arnerf_tpu.rendering_baked import baked_frame_display_fn
    cfg = NGPConfig(scale=SCALE)
    gs = make_grid_state(cfg)
    baked = bake_field(analytic_field, SCALE, resolution=48, n_dirs=16,
                       occ_mask=None, dtype=jnp.float32)
    W = H = 48
    f = 0.5 * W / np.tan(0.5 * np.deg2rad(45.0))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))
    pose = look_at_pose(np.array([0.9, 0.25, 0.75]))
    ro, rd = get_rays(dirs, jnp.asarray(pose))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(5)
    # single bucket (chunk > N): render_baked derives its bucket key as
    # split(key, 1)[0]; pass the same derived key so the stochastic
    # jitter matches draw for draw
    a = render_baked(baked, gs, ro, rd, cfg, key=key, T_threshold=1e-4,
                     chunk=1 << 18, display=True, white_bg=1.0,
                     img_wh=(W, H))
    frame = baked_frame_display_fn(baked, ro, rd, T_threshold=1e-4,
                                   chunk=1 << 18, img_wh=(W, H),
                                   white_bg=1.0)
    got = np.asarray(frame(jax.random.split(key, 1)[0]))
    assert got.shape == (W * H, 3) and got.dtype == np.uint8
    # identical renderer + keys: allow only u8 rounding skew
    diff = np.abs(got.astype(np.int32)
                  - np.asarray(a["rgb_u8"], np.int32))
    assert diff.max() <= 1, diff.max()
