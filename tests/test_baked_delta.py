"""Incremental (delta) bake: rendering_baked.bake_ngp_delta.

Pins the mid-training-preview contract (VERDICT r4 #4):
  1. snapshots ride on bake_ngp's result and a no-change delta touches
     only its rolling-refresh stripe;
  2. voxels of grid cells whose EMA density moved (or occupancy flipped)
     re-bake to the NEW field while untouched cells keep their (stale)
     values — and the staleness bound holds: refresh_k consecutive delta
     bakes converge the whole field to a fresh full bake EXACTLY (CPU
     runs the deterministic exact-corner path);
  3. occupancy removals zero rows and shrink the mip so no ghost
     geometry survives;
  4. fields without snapshots (old checkpoints / MC) fall back to a full
     bake.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arnerf_tpu.models.ngp import (NGPConfig, ngp_init, grid_state_init)
from arnerf_tpu.rendering_baked import bake_ngp, bake_ngp_delta

B = 32   # bake resolution
G = 16   # occupancy grid


def _setup(occ_ball=True):
    cfg = NGPConfig(scale=0.5, grid_size=G, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4,
                    sigma_hidden=16, rgb_hidden=16)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    dens = np.zeros((1, G ** 3), np.float32)
    occ = np.zeros((G ** 3,), np.uint8)
    if occ_ball:
        xyz = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"),
                       -1).reshape(-1, 3)
        inside = (np.linalg.norm(xyz - G / 2 + 0.5, axis=1) < G / 4)
        occ[inside] = 1
        dens[0, inside] = 1.0
    gs = gs._replace(density_grid=jnp.asarray(dens),
                     occ_flat=jnp.asarray(occ))
    return cfg, params, gs


def _perturb(params, eps=0.05):
    out = dict(params)
    out["rgb_mlp"] = [params["rgb_mlp"][0] + eps] \
        + list(params["rgb_mlp"][1:])
    return out


def test_snapshots_and_nochange_delta():
    cfg, params, gs = _setup()
    full = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8)
    assert full.src_density is not None and full.src_occ is not None
    stats = {}
    d1 = bake_ngp_delta(params, gs, cfg, full, n_dirs=8, refresh_k=0,
                        stats=stats)
    # nothing moved and no refresh stripe -> zero work, identical field
    assert stats["n_changed"] == 0 and stats["n_removed"] == 0
    np.testing.assert_array_equal(np.asarray(d1.rows),
                                  np.asarray(full.rows))
    np.testing.assert_array_equal(np.asarray(d1.sigma_bricks),
                                  np.asarray(full.sigma_bricks))


def test_refresh_stripes_converge_to_full_bake():
    cfg, params, gs = _setup()
    full = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8)
    # drift ONLY the appearance net: density grid never moves, so without
    # the rolling refresh no voxel would ever re-bake
    p2 = _perturb(params)
    target = bake_ngp(p2, gs, cfg, resolution=B, n_dirs=8)
    K = 4
    cur, covered = full, 0
    for _ in range(K):
        stats = {}
        cur = bake_ngp_delta(p2, gs, cfg, cur, n_dirs=8, refresh_k=K,
                             stats=stats)
        covered += stats["n_changed"]
    assert covered > 0
    # the K stripes tile the cell space -> every voxel re-baked at least
    # once; CPU path is deterministic, so the result is the full bake
    np.testing.assert_allclose(np.asarray(cur.rows),
                               np.asarray(target.rows), atol=1e-6)


def test_density_change_rebakes_changed_cells_only():
    cfg, params, gs = _setup()
    full = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8)
    p2 = _perturb(params, 0.1)
    # move EMA density in one octant only
    dens = np.asarray(gs.density_grid).copy()
    xyz = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)
    hot = (xyz < G // 2).all(axis=1) & (dens[0] > 0)
    dens[0, hot] *= 2.0
    gs2 = gs._replace(density_grid=jnp.asarray(dens))
    stats = {}
    d = bake_ngp_delta(p2, gs2, cfg, full, n_dirs=8, refresh_k=0,
                       stats=stats)
    assert 0 < stats["n_changed"] < stats["n_total"]
    target = bake_ngp(p2, gs2, cfg, resolution=B, n_dirs=8)
    rows_d = np.asarray(d.rows)
    rows_t = np.asarray(target.rows)
    rows_0 = np.asarray(full.rows)
    # voxels far inside the hot octant match the NEW field; voxels far in
    # the opposite octant keep the OLD (stale) values
    vid = np.arange(B ** 3)
    vx, vy, vz = vid // (B * B), (vid // B) % B, vid % B
    hot_v = (vx < B // 3) & (vy < B // 3) & (vz < B // 3)
    cold_v = (vx > 2 * B // 3) & (vy > 2 * B // 3) & (vz > 2 * B // 3)
    baked_v = rows_t[:, 0] > 0
    np.testing.assert_allclose(rows_d[hot_v & baked_v],
                               rows_t[hot_v & baked_v], atol=1e-6)
    np.testing.assert_allclose(rows_d[cold_v & baked_v],
                               rows_0[cold_v & baked_v], atol=1e-6)
    # snapshots advanced only for re-baked cells
    assert np.all(np.asarray(d.src_density)[0, hot]
                  == dens[0, hot])


def test_occupancy_removal_zeroes_rows_and_mip():
    cfg, params, gs = _setup()
    full = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8)
    occ2 = np.asarray(gs.occ_flat).copy()
    gone = np.nonzero(occ2)[0][: len(np.nonzero(occ2)[0]) // 2]
    occ2[gone] = 0
    dens2 = np.asarray(gs.density_grid).copy()
    dens2[0, gone] = 0.0
    gs2 = gs._replace(density_grid=jnp.asarray(dens2),
                      occ_flat=jnp.asarray(occ2))
    stats = {}
    d = bake_ngp_delta(params, gs2, cfg, full, n_dirs=8, refresh_k=0,
                       stats=stats)
    assert stats["n_removed"] > 0
    target = bake_ngp(params, gs2, cfg, resolution=B, n_dirs=8)
    # no ghost density anywhere the fresh bake says empty
    t_sig = np.asarray(target.rows)[:, 0]
    d_sig = np.asarray(d.rows)[:, 0]
    assert not np.any((d_sig > 0) & ~(t_sig >= 0))  # sanity
    assert np.all(d_sig[t_sig == 0] == 0)
    np.testing.assert_array_equal(np.asarray(d.mip), np.asarray(target.mip))


def test_fallback_full_bake_without_snapshots():
    cfg, params, gs = _setup()
    full = bake_ngp(params, gs, cfg, resolution=B, n_dirs=8)
    legacy = full._replace(src_density=None, src_occ=None)
    d = bake_ngp_delta(params, gs, cfg, legacy, n_dirs=8)
    np.testing.assert_allclose(np.asarray(d.rows), np.asarray(full.rows),
                               atol=1e-6)
    assert d.src_density is not None


def test_budgeted_delta_bounded_cost_and_convergence():
    """budget_cells caps each delta's re-bake at the most-moved cells
    (occupancy flips rank first), leaves unserved cells DIRTY (snapshots
    pinned), and repeated budgeted deltas under a STATIC field converge
    to the full bake exactly — bounded cost, bounded staleness."""
    cfg, params, gs = _setup()
    baked = bake_ngp(params, gs, cfg, resolution=B)
    # move EVERY occupied cell's density (the mid-training regime: EMA
    # decay alone moves all cells each block)
    dens = np.asarray(gs.density_grid) * 1.5
    gs2 = gs._replace(density_grid=jnp.asarray(dens))
    occ_cells = int(np.asarray(gs.occ_flat).sum())
    budget = max(8, occ_cells // 4)

    stats = {}
    d1 = bake_ngp_delta(params, gs2, cfg, baked, refresh_k=0,
                        stats=stats, budget_cells=budget)
    assert stats["n_changed"] < stats["n_total"], \
        "budget must prevent a full re-bake"
    # unserved cells stayed dirty: their snapshots still carry the OLD
    # density, so a second call finds them again
    n_dirty = int((np.abs(np.asarray(d1.src_density) - dens) > 1e-6).sum())
    assert n_dirty > 0

    # under a static field, repeated budgeted deltas drain the queue and
    # converge to the full bake of the new state exactly
    ref = bake_ngp(params, gs2, cfg, resolution=B)
    cur = d1
    for _ in range(16):
        cur = bake_ngp_delta(params, gs2, cfg, cur, refresh_k=0,
                             budget_cells=budget)
    np.testing.assert_allclose(np.asarray(cur.rows),
                               np.asarray(ref.rows), rtol=0, atol=1e-5)
    # nothing left dirty
    assert (np.abs(np.asarray(cur.src_density) - dens) < 1e-6).all()
