"""Hoisted block march (round 5): the 16-step block marches all its steps
in ONE batched pass before the scan (marching is parameter-independent —
TrainConfig.march_hoist). These tests pin that the hoisted path is
BIT-IDENTICAL to the in-step path: same MarchResults per step, same
parameters after a full block, warmup/optimize_ext gating intact."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.training import TrainConfig, NeRFTrainer
from arnerf_tpu.training.trainer import (hoisted_block_march, _hoist_active,
                                         sample_rays)
from arnerf_tpu.training.losses import NeRFLossConfig
from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig


def _mk(march_hoist, seed=0, stoch=False, steps=4):
    scfg = SyntheticConfig(img_wh=(48, 48), n_train=6, n_test=1,
                           gt_samples=128)
    train_ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=64, n_levels=4,
                    log2_hashmap_size=12, base_resolution=16,
                    stoch_corners=stoch)
    tc = TrainConfig(batch_size=512, lr=1e-2, num_epochs=1,
                     steps_per_epoch=100, warmup_steps=16,
                     update_interval=steps,
                     samples_per_ray_budget=24, max_samples=128, s_cap=128,
                     seg_cap=16, seg_pool=True, march_selection="sort",
                     march_hoist=march_hoist, adaptive_budget=False,
                     loss=NeRFLossConfig(grid_scale=0.5))
    return NeRFTrainer(cfg, tc, train_ds, None, key=jax.random.PRNGKey(seed))


def _leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_hoisted_march_matches_instep_march():
    """vmapped hoisted marcher == per-step marcher, bit for bit."""
    tr = _mk(True)
    tr.on_train_start()
    # past warmup so the pooled path is active
    for _ in range(2):
        tr.train_block()

    from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                         coarse_dilation_radius,
                                         march_rays_train_pooled)
    from arnerf_tpu.rendering import scene_hits, default_candidates

    cfg, tc = tr.cfg, tr.tc
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    mrs = hoisted_block_march(
        tr.grid_state, tr.images, tr.poses, tr.directions, keys,
        cfg=cfg, tc=tc, exp_step_factor=tr.exp_step_factor,
        seg_cap=tc.seg_cap)

    occ_coarse = build_coarse_occupancy(
        tr.grid_state.occ_flat, cfg.cascades, cfg.grid_size,
        dilate=coarse_dilation_radius(
            scale=cfg.scale, exp_step_factor=tr.exp_step_factor,
            grid_size=cfg.grid_size, max_samples=tc.max_samples))
    for i, key in enumerate(keys):
        k_sample, k_render = jax.random.split(key)
        rays_o, rays_d, _, _ = sample_rays(
            tr.images, tr.poses, tr.directions, k_sample, tc, None)
        k_noise, _, _ = jax.random.split(k_render, 3)
        hits = scene_hits(rays_o, rays_d, cfg)
        noise = jax.random.uniform(k_noise, (rays_o.shape[0],))
        mr = march_rays_train_pooled(
            rays_o, rays_d, hits, tr.grid_state.occ_flat, noise,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=tr.exp_step_factor, grid_size=cfg.grid_size,
            max_samples=tc.max_samples,
            n_candidates=default_candidates(cfg, tr.exp_step_factor,
                                            tc.max_samples),
            m_cap=tc.batch_size * tc.samples_per_ray_budget,
            s_cap=tc.s_cap, occ_coarse=occ_coarse,
            seg_pool_cap=tc.batch_size * tc.seg_cap, selection="sort")
        sliced = jax.tree.map(lambda x: x[i], mrs)
        assert _leaves_equal(sliced, mr), f"step {i} march differs"


def test_block_params_identical_hoist_on_off():
    """A full fused block produces identical parameters either way."""
    tr_a, tr_b = _mk(True), _mk(False)
    tr_a.on_train_start()
    tr_b.on_train_start()
    for _ in range(3):
        ma = tr_a.train_block()
        mb = tr_b.train_block()
    assert _leaves_equal(tr_a.params, tr_b.params)
    for k in ("loss", "psnr", "rm_s", "nseg"):
        assert np.allclose(float(ma[k]), float(mb[k]), rtol=0, atol=0), k


def test_hoist_gating():
    cfg = NGPConfig(scale=0.5)
    tc = TrainConfig(march_hoist=True)
    assert _hoist_active(cfg, tc, 16)
    assert not _hoist_active(cfg, tc, 0)                      # warmup
    assert not _hoist_active(cfg, dataclasses.replace(
        tc, march_selection="search"), 16)
    assert not _hoist_active(cfg, dataclasses.replace(
        tc, optimize_ext=True), 16)
    assert not _hoist_active(cfg, dataclasses.replace(
        tc, seg_pool=False), 16)
    mc_cfg = NGPConfig(scale=4.0)      # multi-cascade (cascades derived)
    assert mc_cfg.cascades > 1 and not _hoist_active(mc_cfg, tc, 16)


def test_hoist_with_stochastic_corners():
    """Stoch-corner training (the production accelerator mode) is also
    bit-identical under the hoist: the corner-seed draw rides k_stoch,
    which the hoisted path leaves untouched."""
    tr_a, tr_b = _mk(True, stoch=True), _mk(False, stoch=True)
    tr_a.on_train_start()
    tr_b.on_train_start()
    for _ in range(3):
        tr_a.train_block()
        tr_b.train_block()
    assert _leaves_equal(tr_a.params, tr_b.params)
