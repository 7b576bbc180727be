"""Front-to-back volume compositing over compact per-ray segments.

Replaces the reference's serial-per-ray CUDA kernels
`composite_train_fw_kernel` / `composite_train_bw_kernel`
(reference: models/csrc/volumerendering.cu:5-201) and
`composite_test_fw_kernel` (:204-284) with a segmented-prefix-sum
formulation. Because the sample buffer keeps each ray's samples contiguous
(ops/marching.py), a segmented cumulative sum is just a global cumsum minus
the value gathered at each segment's start — no scatters or associative
tricks needed, and JAX autodiff produces the backward pass that the
reference hand-derives (volumerendering.cu:134-145).

Early-ray-termination semantics match the reference exactly: a sample
contributes iff the transmittance BEFORE it exceeds T_threshold (the CUDA
loop breaks after processing the first sample whose post-update T drops to
or below the threshold).
"""

from typing import NamedTuple

import jax.numpy as jnp


class CompositeResults(NamedTuple):
    opacity: jnp.ndarray     # (N,)
    depth: jnp.ndarray       # (N,)
    rgb: jnp.ndarray         # (N, 3)
    ws: jnp.ndarray          # (M,) per-sample weights
    vr_samples: jnp.ndarray  # () total contributing samples


def _segment_base(x_cum, ray_start, ray_idx):
    """Per-sample cumsum value at its segment's start (exclusive)."""
    start = ray_start[ray_idx]                     # (M,)
    return jnp.where(start > 0, x_cum[jnp.maximum(start - 1, 0)], 0.0)


def _segment_totals(x, ray_start, counts):
    """Per-ray sum of x over contiguous segments: gather cumsum at the ends."""
    x_cum = jnp.cumsum(x, axis=0)
    end = ray_start + counts - 1                   # (N,)
    tot = x_cum[jnp.maximum(end, 0)]
    base = jnp.where(ray_start > 0, x_cum[jnp.maximum(ray_start - 1, 0)], 0.0)
    return jnp.where(counts > 0, tot - base, 0.0)


def composite_train(sigmas, rgbs, deltas, ts, ray_idx, valid, ray_start,
                    counts, T_threshold: float) -> CompositeResults:
    """sigmas (M,), rgbs (M,3), deltas/ts (M,), segment layout from marching."""
    fvalid = valid.astype(sigmas.dtype)
    sd = sigmas * deltas * fvalid                  # optical depth per sample
    sd_cum = jnp.cumsum(sd, axis=0)
    sd_excl = sd_cum - sd - _segment_base(sd_cum, ray_start, ray_idx)
    T_before = jnp.exp(-sd_excl)
    alpha = 1.0 - jnp.exp(-sd)
    included = (T_before > T_threshold) & valid
    w = alpha * T_before * included.astype(sigmas.dtype)

    opacity = _segment_totals(w, ray_start, counts)
    depth = _segment_totals(w * ts, ray_start, counts)
    rgb = jnp.stack(
        [_segment_totals(w * rgbs[:, i], ray_start, counts) for i in range(3)],
        axis=-1)
    vr_samples = jnp.sum(included)
    return CompositeResults(opacity=opacity, depth=depth, rgb=rgb, ws=w,
                            vr_samples=vr_samples)


def composite_test_step(sigmas, rgbs, deltas, ts, n_eff, opacity, depth, rgb,
                        T_threshold: float):
    """One incremental compositing round for the test-time renderer.

    Padded per-ray layout: sigmas/deltas/ts (N, S), rgbs (N, S, 3).
    Carries (opacity, depth, rgb) accumulate across rounds like the
    reference's in-place `composite_test_fw` (volumerendering.cu:204-248),
    where the running transmittance is reconstructed as T = 1 - opacity.

    Returns (opacity, depth, rgb, alive) with alive=False once a ray's
    transmittance drops to or below T_threshold. NOTE the reference also
    kills rays whose round produced no samples (volumerendering.cu:221-224)
    — valid there because its marching kernel scans unboundedly to t2, so
    n_eff==0 means the ray is exhausted. Our marching scans a fixed
    candidate window per round, where n_eff==0 can simply mean "this
    window's stretch was empty"; ray exhaustion is the render loop's
    t_cur >= t2 check instead (the march cursor parks beyond t2 when the
    scan passes it).
    """
    N, S = sigmas.shape
    smask = (jnp.arange(S, dtype=jnp.int32)[None, :] < n_eff[:, None])
    sd = sigmas * deltas * smask.astype(sigmas.dtype)
    sd_excl = jnp.cumsum(sd, axis=1) - sd
    T_carry = (1.0 - opacity)[:, None]
    T_before = T_carry * jnp.exp(-sd_excl)
    alpha = 1.0 - jnp.exp(-sd)
    included = (T_before > T_threshold) & smask
    w = alpha * T_before * included.astype(sigmas.dtype)

    opacity = opacity + jnp.sum(w, axis=1)
    depth = depth + jnp.sum(w * ts, axis=1)
    rgb = rgb + jnp.sum(w[..., None] * rgbs, axis=1)
    alive = (1.0 - opacity) > T_threshold
    return opacity, depth, rgb, alive
