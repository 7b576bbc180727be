"""Mip-NeRF-360 distortion loss over compact per-ray segments.

Replaces the reference's CUDA implementation (`distortion_loss_fw_cu` /
`distortion_loss_bw_cu`, reference: models/csrc/losses.cu, formulation from
DVGO-v2, arXiv:2206.05085):

  loss_ray = sum_s [ 2*(wts_incl[s]*ws_excl[s] - ws_incl[s]*wts_excl[s]) ]
             + 1/3 * sum_s ws[s]^2 * deltas[s]

with per-ray inclusive/exclusive prefix sums of ws and ws*ts. Contiguous
segments make these a global cumsum minus the segment base (see
ops/composite.py); JAX autodiff reproduces the hand-written backward
(losses.cu:110-140).
"""

import jax.numpy as jnp

from .composite import _segment_base, _segment_totals


def distortion_loss(ws, deltas, ts, ray_idx, valid, ray_start, counts):
    """Per-ray distortion loss. ws/deltas/ts: (M,). Returns (N,)."""
    fvalid = valid.astype(ws.dtype)
    w = ws * fvalid
    wt = w * ts

    w_cum = jnp.cumsum(w, axis=0)
    wt_cum = jnp.cumsum(wt, axis=0)
    w_incl = w_cum - _segment_base(w_cum, ray_start, ray_idx)
    wt_incl = wt_cum - _segment_base(wt_cum, ray_start, ray_idx)
    w_excl = w_incl - w
    wt_excl = wt_incl - wt

    per_sample = 2.0 * (wt_incl * w_excl - w_incl * wt_excl) \
        + (1.0 / 3.0) * w * w * deltas
    return _segment_totals(per_sample * fvalid, ray_start, counts)
