"""Adaptive sample budget: shrink when demand stays under half the budget,
never below demand, with hysteresis; training continues at the new shape."""

import numpy as np
import jax

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.training import TrainConfig, NeRFTrainer
from arnerf_tpu.training.losses import NeRFLossConfig
from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig


def make_trainer(**tc_kw):
    scfg = SyntheticConfig(img_wh=(32, 32), n_train=3, n_test=1,
                           gt_samples=32)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5)
    tc_kw.setdefault("warmup_steps", 0)
    tc = TrainConfig(batch_size=256,
                     loss=NeRFLossConfig(grid_scale=0.5), **tc_kw)
    return NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0))


def test_budget_shrinks_with_hysteresis_and_training_continues():
    tr = make_trainer(samples_per_ray_budget=32)
    tr.on_train_start()
    # two low-demand votes: no change yet
    assert not tr._maybe_adapt_budget(5.0)
    assert not tr._maybe_adapt_budget(5.0)
    # a high-demand block resets the votes
    assert not tr._maybe_adapt_budget(30.0)
    assert tr.tc.samples_per_ray_budget == 32
    # three consecutive low-demand votes shrink 32 -> 16
    for _ in range(2):
        assert not tr._maybe_adapt_budget(5.0)
    assert tr._maybe_adapt_budget(5.0)
    assert tr.tc.samples_per_ray_budget == 16
    # training still runs at the new shape
    m = tr.train_step()
    assert np.isfinite(float(m["loss"]))


def test_budget_never_shrinks_below_demand_or_floor():
    tr = make_trainer(samples_per_ray_budget=16)
    tr.on_train_start()
    # demand 7: 7*1.3 > 8 -> shrinking to 8 would truncate; refuse
    for _ in range(5):
        assert not tr._maybe_adapt_budget(7.0)
    assert tr.tc.samples_per_ray_budget == 16
    # demand 2 allows 16 -> 8, but floor stops 8 -> 4
    for _ in range(3):
        tr._maybe_adapt_budget(2.0)
    assert tr.tc.samples_per_ray_budget == 8
    for _ in range(5):
        assert not tr._maybe_adapt_budget(0.5)
    assert tr.tc.samples_per_ray_budget == 8


def test_seg_cap_shrinks_and_grows_back():
    """Adaptive marching seg_cap: shrinks toward measured demand with
    hysteresis, grows back IMMEDIATELY near truncation, and training
    continues at every shape (metrics expose the nseg guard)."""
    tr = make_trainer(samples_per_ray_budget=16)
    tr.on_train_start()
    assert tr.tc.seg_cap == 64
    # demand 4: 4*1.6 < 32 -> three votes shrink 64 -> 32
    for _ in range(2):
        assert not tr._maybe_adapt_seg_cap(4.0)
    assert tr._maybe_adapt_seg_cap(4.0)
    assert tr.tc.seg_cap == 32
    # keep voting: 32 -> 16 -> 8, then the floor holds (half=4 < floor)
    for _ in range(6):
        tr._maybe_adapt_seg_cap(4.0)
    assert tr.tc.seg_cap == 8
    for _ in range(5):
        assert not tr._maybe_adapt_seg_cap(4.0)
    assert tr.tc.seg_cap == 8
    cap = tr.tc.seg_cap
    # near-truncation demand: grow back instantly (single call)
    assert tr._maybe_adapt_seg_cap(0.9 * cap)
    assert tr.tc.seg_cap == min(64, 2 * cap)
    # training still runs at the adapted shape, and metrics carry nseg
    m = tr.train_step()
    assert np.isfinite(float(m["loss"]))
    assert "nseg" in m and float(m["nseg"]) >= 0


def test_seg_cap_never_truncates_silently():
    """If nseg exceeds 0.75*seg_cap while already at 64, no change (64 is
    the exactness bound for the procedural scene's worst case)."""
    tr = make_trainer(samples_per_ray_budget=16)
    tr.on_train_start()
    assert not tr._maybe_adapt_seg_cap(60.0)
    assert tr.tc.seg_cap == 64


def test_budget_static_when_disabled_or_warmup():
    tr = make_trainer(samples_per_ray_budget=32, adaptive_budget=False)
    for _ in range(5):
        assert not tr._maybe_adapt_budget(1.0)
    assert tr.tc.samples_per_ray_budget == 32
    tr2 = make_trainer(samples_per_ray_budget=32, warmup_steps=100)
    assert tr2.step < 100
    for _ in range(5):
        assert not tr2._maybe_adapt_budget(1.0)
    assert tr2.tc.samples_per_ray_budget == 32
