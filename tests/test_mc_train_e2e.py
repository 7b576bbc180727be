"""Multi-cascade (scale > 0.5) training end-to-end: the colmap-class scene
shape (unbounded, exp stepping, 3 occupancy cascades, black-background
convention) that the blender/nsvf fixtures never exercise.

This path had TWO latent faults found by running it (late round 3):
  * the procedural GT rendered a WHITE background while unbounded training
    blends BLACK (reference rendering.py:287-296) — empty rays est~0 vs
    gt~1 made the relative loss ((est-gt)/(est+1e-3))^2 explode to ~2e4
    and NaN within ~250 steps (datasets/synthetic.py now matches GT bg to
    the convention);
  * nothing convergence-tested cascades > 1 end to end.
Validated trajectory (96x96, 30 views, batch 2048, 640 steps, CPU):
val 28.1 dB; MC bake of the trained field 23.6 dB vs both the network
render and the GT. Bars below leave generous margins.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_multi_cascade_training_convergence_and_mc_bake():
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import (SyntheticDataset,
                                               SyntheticConfig)
    from arnerf_tpu.rendering_baked import bake_ngp, render_baked
    from arnerf_tpu.datasets.ray_utils import get_rays

    scfg = SyntheticConfig(scale=2.0, img_wh=(96, 96), n_train=30, n_test=2,
                           gt_samples=384)
    train_ds = SyntheticDataset(split="train", config=scfg)
    test_ds = SyntheticDataset(split="test", config=scfg)
    # unbounded GT uses the black-background convention
    assert float(np.mean(train_ds.rays[0][:, :3])) < 0.5

    cfg = NGPConfig(scale=2.0)
    assert cfg.cascades == 3
    tc = TrainConfig(batch_size=2048, lr=1e-2, num_epochs=2,
                     steps_per_epoch=320, warmup_steps=128,
                     samples_per_ray_budget=32, adaptive_budget=False,
                     loss=NeRFLossConfig(grid_scale=2.0,
                                         lambda_distortion=1e-3))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    tr.on_train_start()
    while tr.step < 640:
        m = tr.train_block()
    assert np.isfinite(float(m["loss"])), "scale-2 training went non-finite"
    val = tr.validate(max_images=1, compute_ssim=False)
    assert val["psnr"] > 24.0, f"scale-2 val {val['psnr']:.2f} dB"

    # MC bake of the genuinely trained field; baked vs network render
    baked = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=96,
                     n_dirs=12)
    assert baked.cascades == 3
    pose = jnp.asarray(test_ds.poses[0])
    ro, rd = get_rays(tr.directions, pose)
    net = tr.render_pose(pose, T_threshold=1e-2, max_samples=96)
    bk = render_baked(baked, tr.grid_state, ro, rd, cfg,
                      key=jax.random.PRNGKey(5), T_threshold=1e-2)
    mse = float(np.mean((np.asarray(bk["rgb"])
                         - np.asarray(net["rgb"])) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 18.0, f"MC baked vs network {psnr:.2f} dB"
