"""End-to-end convergence smoke test: train a small NGP on the procedural
analytic scene and require a real PSNR gain (SURVEY.md §4 test strategy (c))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.training import TrainConfig, NeRFTrainer
from arnerf_tpu.training.losses import NeRFLossConfig
from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig


def make_trainer(mesh=None, batch=1024):
    scfg = SyntheticConfig(img_wh=(64, 64), n_train=12, n_test=2,
                           gt_samples=256)
    train_ds = SyntheticDataset(split="train", config=scfg)
    test_ds = SyntheticDataset(split="test", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=64, n_levels=8,
                    log2_hashmap_size=15, base_resolution=16)
    tc = TrainConfig(batch_size=batch, lr=1e-2, num_epochs=2,
                     steps_per_epoch=300, warmup_steps=64,
                     samples_per_ray_budget=40, max_samples=256, s_cap=256,
                     loss=NeRFLossConfig(grid_scale=0.5))
    return NeRFTrainer(cfg, tc, train_ds, test_ds,
                       key=jax.random.PRNGKey(0), mesh=mesh)


@pytest.mark.slow
def test_train_converges_on_synthetic_scene():
    trainer = make_trainer()
    trainer.on_train_start()
    psnrs = []
    for i in range(600):
        m = trainer.train_step()
        if (i + 1) % 150 == 0:
            psnrs.append(float(m["psnr"]))
    # training PSNR must climb decisively above the "predict the mean" floor
    assert psnrs[-1] > 19.0, psnrs
    # full-quality validation (default deep integration settings)
    val = trainer.validate(max_images=1, compute_ssim=True)
    assert val["psnr"] > 17.0, val
    assert val["ssim"] > 0.5, val


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer()
    trainer.on_train_start()
    for _ in range(40):
        trainer.train_step()
    path = str(tmp_path / "ckpt.npz")
    trainer.save(path)

    trainer2 = make_trainer()
    trainer2.load(path)
    assert trainer2.step == trainer.step
    a = jax.tree.leaves(trainer.params)
    b = jax.tree.leaves(trainer2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resumed training proceeds
    m = trainer2.train_step()
    assert np.isfinite(float(m["loss"]))


def test_orbax_ckpt_roundtrip(tmp_path):
    """Orbax backend saves/restores the same artifact set as npz
    (SURVEY §5: orbax checkpointing with the reference's artifact set)."""
    pytest.importorskip("orbax.checkpoint")
    from arnerf_tpu.training.ckpt import save_ckpt_orbax, load_ckpt_orbax
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    import optax
    cfg = NGPConfig(scale=0.5, grid_size=16, n_levels=2,
                    log2_hashmap_size=8, base_resolution=4)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    p = str(tmp_path / "ck.orbax")
    save_ckpt_orbax(p, params=params, grid_state=gs, opt_state=opt, step=7)
    zero = jax.tree.map(jnp.zeros_like, params)
    p2, g2, o2, step = load_ckpt_orbax(p, params_template=zero,
                                       grid_template=gs,
                                       opt_state_template=opt)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.structure(opt) == jax.tree.structure(o2)


@pytest.mark.slow
def test_train_converges_with_stochastic_corners():
    """Same convergence smoke as above but with stoch_corners=True (the
    production TPU training path: single-corner hash gathers in render_train
    AND the density-grid update probes). Quality bar matches the exact-path
    test — the estimator must not cost meaningful PSNR at this scale."""
    scfg = SyntheticConfig(img_wh=(64, 64), n_train=12, n_test=2,
                           gt_samples=256)
    train_ds = SyntheticDataset(split="train", config=scfg)
    test_ds = SyntheticDataset(split="test", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=64, n_levels=8,
                    log2_hashmap_size=15, base_resolution=16,
                    stoch_corners=True)
    tc = TrainConfig(batch_size=1024, lr=1e-2, num_epochs=2,
                     steps_per_epoch=300, warmup_steps=64,
                     samples_per_ray_budget=40, max_samples=256, s_cap=256,
                     loss=NeRFLossConfig(grid_scale=0.5))
    trainer = NeRFTrainer(cfg, tc, train_ds, test_ds,
                          key=jax.random.PRNGKey(0))
    trainer.on_train_start()
    psnrs = []
    for i in range(600):
        m = trainer.train_step()
        if (i + 1) % 150 == 0:
            psnrs.append(float(m["psnr"]))
    assert psnrs[-1] > 19.0, psnrs
    # validation renders through the EXACT path (seed=None) regardless
    val = trainer.validate(max_images=1, compute_ssim=True)
    assert val["psnr"] > 17.0, val
    assert val["ssim"] > 0.5, val


def test_strided_validate_matches_full():
    """The stride>1 validate probe (bench race snapshots) scores the same
    renderer on a subsampled pixel set; its PSNR must track the full-res
    estimate closely (it is the same estimator, fewer pixels)."""
    trainer = make_trainer()
    trainer.on_train_start()
    for _ in range(60):
        trainer.train_step()
    full = trainer.validate(max_images=1, compute_ssim=False)
    s2 = trainer.validate(max_images=1, compute_ssim=False, stride=2)
    assert abs(full["psnr"] - s2["psnr"]) < 0.8, (full, s2)
    assert "ssim" not in s2  # SSIM is windowed; only computed at stride 1
