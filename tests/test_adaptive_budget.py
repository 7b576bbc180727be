"""Adaptive sample budget: shrink-to-fit (multiple of 8 holding demand +
30% headroom), never below demand, with hysteresis; grow back immediately
under persistent striding; training continues at the new shape."""

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
    # three consecutive low-demand votes shrink straight to fit: 32 -> 8
    for _ in range(2):
        assert not tr._maybe_adapt_budget(5.0)
    assert tr._maybe_adapt_budget(5.0)
    assert tr.tc.samples_per_ray_budget == 8
    # training still runs at the new shape
    m = tr.train_step()
    assert np.isfinite(float(m["loss"]))


def test_budget_shrinks_to_fit_not_just_halves():
    # demand 18: 18*1.3 = 23.4 -> fit 24 (the halving rule would need
    # demand < 12.3 and leave a quarter of the buffer as padding)
    tr = make_trainer(samples_per_ray_budget=32)
    tr.on_train_start()
    for _ in range(2):
        assert not tr._maybe_adapt_budget(18.0)
    assert tr._maybe_adapt_budget(18.0)
    assert tr.tc.samples_per_ray_budget == 24


def test_budget_grows_back_under_persistent_striding():
    tr = make_trainer(samples_per_ray_budget=32)
    tr.on_train_start()
    for _ in range(3):
        tr._maybe_adapt_budget(5.0)
    assert tr.tc.samples_per_ray_budget == 8
    # demand rebounds past the buffer: grow back instantly (single call),
    # capped at the configured initial budget
    assert tr._maybe_adapt_budget(20.0)
    assert tr.tc.samples_per_ray_budget == 32
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
    """Per-ray-path adaptive seg_cap (seg_pool=False): shrinks toward the
    measured per-block MAX with hysteresis, grows back IMMEDIATELY near
    truncation, and training continues at every shape."""
    tr = make_trainer(samples_per_ray_budget=16, seg_pool=False)
    tr.on_train_start()
    assert tr.tc.seg_cap == 64 and not tr._pool_mode
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
    """Per-ray path: if nseg exceeds 0.75*seg_cap while already at 64, no
    change (64 is the exactness bound for the procedural scene's worst
    case)."""
    tr = make_trainer(samples_per_ray_budget=16, seg_pool=False)
    tr.on_train_start()
    assert not tr._maybe_adapt_seg_cap(60.0)
    assert tr.tc.seg_cap == 64


def test_seg_pool_adapts_on_mean_demand():
    """Pool mode (the default): seg_cap is the pool's MEAN slots/ray —
    shrink-to-fit in multiples of 8 on the batch-mean demand, instant
    grow-back when the mean overflows the pool (striding active), and
    training continues at every shape."""
    tr = make_trainer(samples_per_ray_budget=16)
    tr.on_train_start()
    assert tr._pool_mode and tr.tc.seg_cap == 64
    # mean demand 10.5 -> fit ceil(10.5/8)*8 = 16, after 3 votes
    for _ in range(2):
        assert not tr._maybe_adapt_seg_cap(10.5)
    assert tr._maybe_adapt_seg_cap(10.5)
    assert tr.tc.seg_cap == 16
    # demand within the quality-free striding band (<= 1.25x): no grow
    assert not tr._maybe_adapt_seg_cap(19.0)
    assert tr.tc.seg_cap == 16
    # mean demand rebounds PAST the striding band: grow back instantly
    assert tr._maybe_adapt_seg_cap(25.0)
    assert tr.tc.seg_cap == 32          # ceil(25/8)*8
    # floor holds
    for _ in range(3):
        tr._maybe_adapt_seg_cap(1.0)
    assert tr.tc.seg_cap == 8
    for _ in range(3):
        assert not tr._maybe_adapt_seg_cap(1.0)
    assert tr.tc.seg_cap == 8
    # training still runs; metrics carry the pool's adaptation signal
    m = tr.train_step()
    assert np.isfinite(float(m["loss"]))
    assert float(m["nseg_avg"]) > 0
    assert tr.seg_metric(m) == float(m["nseg_avg"])


def test_seg_pool_equals_per_ray_path_when_demand_fits():
    """When segment demand fits both capacities, pooled and per-ray
    trainers select identical samples -> identical first-step losses.
    (On this uncarved scene demand reaches ~91 segs/ray worst-case and
    ~66 mean, so at the default 64 the flat path TRUNCATES while the pool
    STRIDES — pool captures MORE samples, see the companion assert — and
    only at 128 do both run exact.)"""
    tr_pool = make_trainer(samples_per_ray_budget=16, seg_cap=128)
    tr_flat = make_trainer(samples_per_ray_budget=16, seg_cap=128,
                           seg_pool=False)
    tr_pool.on_train_start()
    tr_flat.on_train_start()
    m1 = tr_pool.train_step()
    m2 = tr_flat.train_step()
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    assert float(m1["rm_s"]) == float(m2["rm_s"])


def test_seg_pool_beats_per_ray_truncation_at_equal_capacity():
    """At the 64 default on the uncarved scene (demand > cap), the pool's
    striding must capture at least as many samples as the flat path's
    per-ray truncation — buffer pressure degrades gracefully instead of
    silently dropping far geometry."""
    tr_pool = make_trainer(samples_per_ray_budget=16)
    tr_flat = make_trainer(samples_per_ray_budget=16, seg_pool=False)
    tr_pool.on_train_start()
    tr_flat.on_train_start()
    m1 = tr_pool.train_step()
    m2 = tr_flat.train_step()
    assert float(m1["rm_s"]) >= float(m2["rm_s"])
    assert np.isfinite(float(m1["loss"]))


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


def test_stoch_anneal_flips_to_exact_corners():
    """Exact-corner finish: past stoch_anneal_frac * total_steps the
    trainer flips cfg.stoch_corners off once (cached rebuild), training
    continues, and the flip never fires when disabled (frac=1.0)."""
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    scfg = SyntheticConfig(img_wh=(32, 32), n_train=3, n_test=1,
                           gt_samples=32)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5, stoch_corners=True)
    tc = TrainConfig(batch_size=256, warmup_steps=0, num_epochs=1,
                     steps_per_epoch=10, samples_per_ray_budget=16,
                     stoch_anneal_frac=0.5,
                     loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0))
    tr.on_train_start()
    assert not tr._maybe_anneal_stoch()          # step 0 < 5
    assert tr.cfg.stoch_corners
    tr.step = 5
    assert tr._maybe_anneal_stoch()              # flips exactly once
    assert not tr.cfg.stoch_corners
    assert not tr._maybe_anneal_stoch()
    m = tr.train_step()                          # continues on exact path
    assert np.isfinite(float(m["loss"]))
    # disabled by frac=1.0
    tr2 = NeRFTrainer(cfg, TrainConfig(
        batch_size=256, warmup_steps=0, num_epochs=1, steps_per_epoch=10,
        samples_per_ray_budget=16, stoch_anneal_frac=1.0,
        loss=NeRFLossConfig(grid_scale=0.5)), ds, key=jax.random.PRNGKey(0))
    tr2.step = 10
    assert not tr2._maybe_anneal_stoch()
    assert tr2.cfg.stoch_corners
