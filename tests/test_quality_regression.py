"""Pinned-seed quality regression (VERDICT r3 weak #4): a fixed 200-step
CPU run whose end-of-run PSNR is asserted against a RECORDED value to
±0.25 dB. The e2e smoke bars (17-19 dB) catch breakage; this catches the
silent few-dB regressions — any change to marching, compositing, hash
encoding or loss numerics that shifts quality shows up here as a red test
instead of in a chip run days later.

The pinned values were recorded on the CPU backend (float32, exact
corners, stochastic off — the deterministic configuration; stochastic
paths get their own distributional tests). If a change INTENTIONALLY
improves quality, re-record: python -m tests.test_quality_regression
prints the fresh values.
"""

import numpy as np
import jax
import pytest

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.training import TrainConfig, NeRFTrainer
from arnerf_tpu.training.losses import NeRFLossConfig
from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig

# recorded on the CPU backend (virtual 8-device mesh active but unused),
# jax 0.8.x, 2026-08-19 — see module docstring for re-recording
PINNED_TRAIN_PSNR = 19.55
PINNED_VAL_PSNR = 18.87
TOL_DB = 0.25


def run_pinned():
    scfg = SyntheticConfig(img_wh=(64, 64), n_train=12, n_test=2,
                           gt_samples=256)
    train_ds = SyntheticDataset(split="train", config=scfg)
    test_ds = SyntheticDataset(split="test", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=64, n_levels=8,
                    log2_hashmap_size=15, base_resolution=16,
                    compute_dtype="float32", stoch_corners=False)
    tc = TrainConfig(batch_size=1024, lr=1e-2, num_epochs=1,
                     steps_per_epoch=200, warmup_steps=64,
                     samples_per_ray_budget=40, max_samples=256, s_cap=256,
                     adaptive_budget=False,
                     loss=NeRFLossConfig(grid_scale=0.5))
    trainer = NeRFTrainer(cfg, tc, train_ds, test_ds,
                          key=jax.random.PRNGKey(42))
    trainer.on_train_start()
    m = None
    for _ in range(200):
        m = trainer.train_step()
    train_psnr = float(m["psnr"])
    val = trainer.validate(max_images=1, compute_ssim=False)
    return train_psnr, float(val["psnr"])


@pytest.mark.slow
def test_pinned_seed_psnr_regression():
    train_psnr, val_psnr = run_pinned()
    assert abs(train_psnr - PINNED_TRAIN_PSNR) < TOL_DB, \
        (f"train PSNR drifted: {train_psnr:.3f} vs pinned "
         f"{PINNED_TRAIN_PSNR} (quality-affecting numerics change?)")
    assert abs(val_psnr - PINNED_VAL_PSNR) < TOL_DB, \
        (f"val PSNR drifted: {val_psnr:.3f} vs pinned {PINNED_VAL_PSNR} "
         f"(quality-affecting numerics change?)")


if __name__ == "__main__":
    t, v = run_pinned()
    print(f"PINNED_TRAIN_PSNR = {t:.2f}")
    print(f"PINNED_VAL_PSNR = {v:.2f}")
