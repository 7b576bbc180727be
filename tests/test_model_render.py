"""NGP model + render orchestration smoke/correctness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.models import (
    NGPConfig, ngp_init, ngp_density, ngp_forward,
    grid_state_init, mark_invisible_cells, update_density_grid)
from arnerf_tpu.rendering import render_train, render_test

CFG = NGPConfig(scale=0.5, grid_size=32, n_levels=4, log2_hashmap_size=12,
                base_resolution=4)


def test_init_and_forward_shapes():
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                           minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    sig = ngp_density(params, x, CFG)
    assert sig.shape == (64,) and bool(jnp.all(sig > 0))
    sig2, rgb = ngp_forward(params, x, d, CFG)
    assert rgb.shape == (64, 3)
    assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))  # sigmoid output
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig2), rtol=1e-6)


def test_cascades_from_scale():
    assert NGPConfig(scale=0.5).cascades == 1
    assert NGPConfig(scale=1.0).cascades == 2
    assert NGPConfig(scale=4.0).cascades == 4
    assert NGPConfig(scale=64.0).cascades == 8


def test_grid_update_warmup_and_sampling():
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    state = grid_state_init(CFG)
    state = update_density_grid(params, state, jax.random.PRNGKey(1), CFG,
                                density_threshold=0.01, warmup=True)
    # fresh random model: densities ~ exp(small MLP outputs) > 0 everywhere
    assert float(jnp.max(state.density_grid)) > 0
    assert state.occ_flat.shape == (CFG.cascades * CFG.grid_size ** 3,)
    occ_before = int(jnp.sum(state.occ_flat))
    assert occ_before > 0
    # non-warmup pass with decay keeps the state consistent
    state2 = update_density_grid(params, state, jax.random.PRNGKey(2), CFG,
                                 density_threshold=0.01, warmup=False)
    assert state2.density_grid.shape == state.density_grid.shape
    # bitfield is the packed version of the occupancy decision
    from arnerf_tpu.ops.packbits import unpackbits
    bits = unpackbits(state2.bitfield)
    assert np.array_equal(np.asarray(bits), np.asarray(state2.occ_flat))


def test_mark_invisible_cells_marks_behind_camera():
    state = grid_state_init(CFG)
    # one camera at z=-1 looking +z: cells far behind it are invisible
    pose = jnp.asarray([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -1.0]]])
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    state = mark_invisible_cells(state, K, pose, CFG, 64, 64)
    grid = np.asarray(state.density_grid).reshape(CFG.cascades, 32, 32, 32)
    # cell at x-center, y-center, z near +0.4 (in front, center fov): visible
    assert grid[0, 16, 16, 28] == 0.0
    # cell far off-axis near the camera plane (outside the ~18deg half-FOV)
    assert grid[0, 1, 16, 1] == -1.0
    assert np.all(np.asarray(state.count_grid) >= 0)


def _rays_looking_at_origin(n=64):
    rng = np.random.default_rng(0)
    o = np.tile([0.0, 0.0, -1.2], (n, 1)).astype(np.float32)
    tgt = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_render_train_runs_and_grads_flow():
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    state = grid_state_init(CFG)
    state = update_density_grid(params, state, jax.random.PRNGKey(1), CFG,
                                density_threshold=0.01, warmup=True)
    rays_o, rays_d = _rays_looking_at_origin(32)

    def loss_fn(p):
        out = render_train(p, state, rays_o, rays_d, jax.random.PRNGKey(2),
                           CFG, m_cap=2048, s_cap=128, max_samples=256)
        return jnp.mean((out["rgb"] - 0.5) ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert out["rgb"].shape == (32, 3)
    assert int(out["rm_samples"]) > 0
    g_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert g_norm > 0


def test_render_test_empty_grid_gives_background():
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    state = grid_state_init(CFG)  # occupancy all zero
    rays_o, rays_d = _rays_looking_at_origin(32)
    out = render_test(params, state, rays_o, rays_d, CFG, chunk=32,
                      n_candidates=128, samples_per_round=8, max_samples=256)
    assert np.allclose(np.asarray(out["rgb"]), 0.0)
    assert np.allclose(np.asarray(out["opacity"]), 0.0)


def test_render_test_matches_render_train_on_solid_scene():
    """With no early-stop pressure differences, the test path must agree
    with the (non-strided) train path."""
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    state = grid_state_init(CFG)
    state = update_density_grid(params, state, jax.random.PRNGKey(1), CFG,
                                density_threshold=0.01, warmup=True)
    rays_o, rays_d = _rays_looking_at_origin(16)

    tr = render_train(params, state, rays_o, rays_d, jax.random.PRNGKey(5),
                      CFG, m_cap=16 * 256, s_cap=256, max_samples=256)
    # render_train perturbs t1 with noise; redo with a key that still
    # perturbs — compare against test path only loosely (sub-step jitter)
    te = render_test(params, state, rays_o, rays_d, CFG, chunk=16,
                     n_candidates=128, samples_per_round=16, max_samples=256)
    # background differs (train blends white for synthetic); compare raw
    raw_train_rgb = np.asarray(tr["rgb"]) - (1 - np.asarray(tr["opacity"]))[:, None]
    assert np.allclose(np.asarray(te["opacity"]), np.asarray(tr["opacity"]),
                       atol=0.05)
    assert np.allclose(np.asarray(te["rgb"]), raw_train_rgb, atol=0.05)


def test_bf16_compute_path_close_to_fp32():
    cfg32 = CFG
    cfg16 = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                      log2_hashmap_size=12, base_resolution=4,
                      compute_dtype="bfloat16")
    params = ngp_init(jax.random.PRNGKey(0), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                           minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (128, 3))
    s32, rgb32 = ngp_forward(params, x, d, cfg32)
    s16, rgb16 = ngp_forward(params, x, d, cfg16)
    assert s16.dtype == jnp.float32 and rgb16.dtype == jnp.float32
    # raw features are ~1e-4 scale; sigma = exp(~0) so tolerances are loose
    assert np.allclose(np.asarray(rgb16), np.asarray(rgb32), atol=0.02)
    assert np.allclose(np.asarray(s16), np.asarray(s32), rtol=0.05)
    # gradients still flow in bf16 mode
    g = jax.grad(lambda p: jnp.sum(ngp_forward(p, x, d, cfg16)[1]))(params)
    assert g["hash_table"].dtype == jnp.float32
    assert float(jnp.sum(jnp.abs(g["hash_table"]))) > 0


def test_render_test_fast_matches_slow():
    from arnerf_tpu.rendering import render_test_fast
    params = ngp_init(jax.random.PRNGKey(0), CFG)
    state = grid_state_init(CFG)
    state = update_density_grid(params, state, jax.random.PRNGKey(1), CFG,
                                density_threshold=0.01, warmup=True)
    rays_o, rays_d = _rays_looking_at_origin(64)
    kw = dict(n_candidates=128, samples_per_round=16, max_samples=256)
    slow = render_test(params, state, rays_o, rays_d, CFG, chunk=64, **kw)
    fast = render_test(params, state, rays_o, rays_d, CFG, chunk=64,
                       fast=True, min_bucket=16, **kw)
    np.testing.assert_allclose(np.asarray(fast["opacity"]),
                               np.asarray(slow["opacity"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(slow["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(slow["depth"]), atol=1e-4)


def test_render_survives_empty_marching_windows():
    """Rays must NOT die when a marching round's candidate window is empty
    (geometry further along the ray than one window). The reference kills
    n_eff==0 rays because its scan is unbounded (volumerendering.cu:221);
    with windowed marching that rule dropped whole objects (regression:
    deep-integration val PSNR 15 dB vs 37 dB)."""
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.rendering import render_test_chunk
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    # occupy ONLY a far slab x in (0.3, 0.5): entering rays cross ~0.8 of
    # empty space first — several 64-candidate windows with n_eff == 0
    G = cfg.grid_size
    occ = np.zeros((G, G, G), np.uint8)
    occ[int(0.8 * G):, :, :] = 1
    gs = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))
    n = 8
    rays_o = jnp.tile(jnp.asarray([[-0.49, 0.0, 0.0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    out = render_test_chunk(params, gs, rays_o, rays_d, cfg,
                            max_samples=256, n_candidates=64,
                            samples_per_round=16)
    assert int(out["total_samples"]) > 0, \
        "rays died before reaching the far slab"
    assert float(jnp.max(out["opacity"])) > 0.0


def test_render_fast_prehit_covers_far_geometry():
    """The first-hit pre-pass must scan the WHOLE marching window, even when
    the per-round n_candidates covers only part of the scene — a ray whose
    first occupied cell lies beyond one round's window must not be killed
    at phase 0 (rendering.py first_hit/render_test_fast)."""
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    G = cfg.grid_size
    occ = np.zeros((G, G, G), np.uint8)
    occ[int(0.8 * G):, :, :] = 1          # far slab only
    gs = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))
    n = 8
    rays_o = jnp.tile(jnp.asarray([[-0.49, 0.0, 0.0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    kw = dict(n_candidates=32, samples_per_round=8, max_samples=256)
    slow = render_test(params, gs, rays_o, rays_d, cfg, chunk=n, **kw)
    fast = render_test(params, gs, rays_o, rays_d, cfg, chunk=n, fast=True,
                       min_bucket=8, **kw)
    assert float(jnp.max(slow["opacity"])) > 0.0
    np.testing.assert_allclose(np.asarray(fast["opacity"]),
                               np.asarray(slow["opacity"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(slow["depth"]), atol=1e-4)


def test_render_fast_empty_scene_short_circuits():
    """All rays killed at the pre-pass: zero field evals, zero output."""
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)  # occupancy all zero
    rays_o, rays_d = _rays_looking_at_origin(16)
    out = render_test(params, gs, rays_o, rays_d, cfg, chunk=16, fast=True,
                      min_bucket=8, n_candidates=64, samples_per_round=8,
                      max_samples=256)
    assert int(out["total_samples"]) == 0
    assert np.allclose(np.asarray(out["opacity"]), 0.0)


def test_first_hit_survives_seg_cap_truncation():
    """ADVICE r2 (medium): a ray GRAZING a long slab has many dilated-
    occupied coarse segments with no truly-occupied fine sample; with
    > seg_cap(=32) such segments before its first real hit, a one-shot
    march_rays_test call returns n_eff == 0 truncated — first_hit must keep
    marching the cursor instead of declaring the ray dead."""
    from arnerf_tpu.rendering import first_hit, scene_hits
    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         coarse_dilation_radius)
    from arnerf_tpu.ops.stepping import SQRT3, num_lattice_steps

    cfg = NGPConfig(scale=0.5, grid_size=128, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    G = cfg.grid_size
    occ = np.zeros((G, G, G), np.uint8)
    # long 1-cell line at y-idx 68 (4 fine cells off the ray's y-idx 64,
    # same supercell -> every segment along it is dilated-occupied)
    occ[10:110, 68, 64] = 1
    # the actual geometry: one on-ray cell far along (+x)
    occ[115, 64, 64] = 1
    occ_flat = jnp.asarray(occ.reshape(-1))

    dt_scale = float(cfg.cascades)  # mirror render_test's default
    max_samples = 1024
    occ_coarse = build_coarse_occupancy(
        occ_flat, cfg.cascades, G,
        dilate=coarse_dilation_radius(
            scale=cfg.scale, exp_step_factor=0.0, grid_size=G,
            max_samples=max_samples, dt_scale=dt_scale))
    diag = 2 * SQRT3 * cfg.scale
    K = num_lattice_steps(0.01, 0.01 + diag, 0.0, max_samples, G, dt_scale)

    rays_o = jnp.asarray([[-0.6, 0.001, 0.001],     # grazing ray
                          [-0.6, 0.4, 0.4]])        # control: empty space
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    hits = scene_hits(rays_o, rays_d, cfg)

    alive, t_first = first_hit(occ_flat, occ_coarse, rays_o, rays_d, hits,
                               cfg, exp_step_factor=0.0,
                               max_samples=max_samples, n_candidates=K,
                               dt_scale=dt_scale)
    # ground truth from the single-level path (no coarse pruning, no
    # truncation possible in one call over the whole window)
    alive_ref, t_ref = first_hit(occ_flat, None, rays_o, rays_d, hits,
                                 cfg, exp_step_factor=0.0,
                                 max_samples=max_samples, n_candidates=K,
                                 dt_scale=dt_scale)
    assert bool(alive_ref[0]) and not bool(alive_ref[1])
    assert bool(alive[0]), "grazing ray killed by seg_cap truncation"
    assert not bool(alive[1])
    assert abs(float(t_first[0]) - float(t_ref[0])) < 1e-4
