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
    jit_j = jax.random.uniform(k, (5 * K, 3))
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
