"""Checkpoint helpers at the reference's import location
(reference utils.py:21-39) — thin re-exports of arnerf_tpu.training.ckpt."""

from arnerf_tpu.training.ckpt import load_ckpt, save_ckpt, slim_ckpt  # noqa
