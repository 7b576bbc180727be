"""CLI flag parity with the reference's opt.py (all 30 flags, same names
and defaults; reference opt.py:3-112)."""

from arnerf_tpu.opt import get_opts


REF_DEFAULTS = {
    # dataset group
    "dataset_name": "nsvf", "split": "train", "downsample": 1.0,
    # model
    "scale": 0.5,
    # loss
    "loss_func": "raw", "distortion_loss_w": 0, "depth_loss_w": 0,
    # training
    "batch_size": 8192, "ray_sampling_strategy": "all_images",
    "num_epochs": 30, "num_gpus": 1, "lr": 1e-2,
    "optimize_ext": False, "random_bg": False,
    # validation
    "eval_lpips": False, "val_only": False, "no_save_test": False,
    "val_batch_size": 2 ** 20,
    # misc
    "exp_name": "exp",
    # GUI
    "low_resolution": 1.0,
    # insertor
    "max_pc_pts_num": 1_000_000, "no_global_SH": False,
    # HDR
    "use_exposure": False, "use_EXR": False,
    "train_SH_HDR_mapping": False, "gen_probe_HDR_mapping": False,
    "render_HDR_mapping": False,
}


def test_all_reference_flags_present_with_defaults():
    h = vars(get_opts([]))
    for k, v in REF_DEFAULTS.items():
        assert k in h, f"missing reference flag --{k}"
        assert h[k] == v, f"--{k}: {h[k]!r} != reference default {v!r}"
    # path flags default to unset
    assert h["ckpt_path"] is None and h["weight_path"] is None
    # 30 reference flags + --compute_dtype (TPU-side addition: fp32/bf16/auto
    # field eval; 'auto' = bf16 on accelerator backends, fp32 on CPU)
    assert h["compute_dtype"] == "auto"
    assert h["stoch_corners"] == "auto"
    assert h["seg_pool"] == "on"
    # sharded hash-table training (parallel/tp.py); 1 = pure DP
    assert h["model_parallel"] == 1
    # 30 reference flags + 4 TPU-side additions
    assert len(h) == 34


def test_flag_overrides_parse():
    h = get_opts(["--dataset_name", "nerf", "--scale", "4",
                  "--loss_func", "log", "--optimize_ext", "--num_gpus", "4",
                  "--batch_size", "16384", "--use_EXR"])
    assert (h.dataset_name, h.scale, h.loss_func) == ("nerf", 4.0, "log")
    assert h.optimize_ext and h.use_EXR and h.num_gpus == 4
    assert h.batch_size == 16384


def test_bogus_choice_rejected():
    import pytest
    with pytest.raises(SystemExit):
        get_opts(["--dataset_name", "bogus"])
    with pytest.raises(SystemExit):
        get_opts(["--loss_func", "bogus"])
