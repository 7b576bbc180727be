"""LPIPS perceptual distance, pure JAX.

The reference reports LPIPS(vgg) for every benchmark table via torchmetrics
(reference train.py:68-74, README.md:119). This image has no torchmetrics /
torchvision and zero egress, so the metric is implemented here from the
published architecture (Zhang et al., CVPR 2018 — "The Unreasonable
Effectiveness of Deep Features as a Perceptual Metric"):

  input in [-1, 1]
    -> scaling layer (shift/scale from the official lpips repo)
    -> VGG16 conv stack; features tapped after relu1_2, relu2_2, relu3_3,
       relu4_3, relu5_3
    -> per-layer channel-unit-normalization, squared difference
    -> learned 1x1 "lin" weights (non-negative), spatial mean, sum of layers

Weights: the official metric needs the torchvision VGG16 weights + the
lpips lin weights, which cannot be downloaded here. Two modes:

  * `lpips_params(path)` loads a vendored .npz with the real weights
    (converter documented below) -> the official metric exactly.
  * `lpips_params()` falls back to a DETERMINISTIC randomly-initialized
    VGG (seed 0, He-normal convs, uniform non-negative lin weights).
    Randomly-initialized deep features are an established perceptual
    metric surrogate (Amir & Weiss, "Understanding and Simplifying
    Perceptual Distances", CVPR 2021: random VGG features track human
    judgments nearly as well as trained ones). Values are NOT numerically
    comparable to published LPIPS tables and are labeled `lpips_rand` by
    callers unless real weights are loaded.

Vendoring real weights (on any machine with torchvision+lpips):
    import numpy as np, torch, lpips as L
    m = L.LPIPS(net='vgg')
    blobs = {}
    for i, layer in enumerate([l for l in m.net.slice1] + ...):  # convs
        ...  # save conv kernels as HWIO under conv{k}/w, conv{k}/b
    for j, lin in enumerate(m.lins):
        blobs[f"lin{j}"] = lin.model[1].weight.detach().numpy()[ :, :, 0, 0]
    np.savez("lpips_vgg.npz", **blobs)
Place at arnerf_tpu/data/lpips_vgg.npz.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 conv plan: (out_channels, pool_before) per conv layer; LPIPS taps
# the relu outputs at indices in _TAPS.
_VGG_PLAN = [(64, False), (64, False),
             (128, True), (128, False),
             (256, True), (256, False), (256, False),
             (512, True), (512, False), (512, False),
             (512, True), (512, False), (512, False)]
_TAPS = (1, 3, 6, 9, 12)          # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_CH = (64, 128, 256, 512, 512)

# official lpips scaling layer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_params_random(seed: int = 0) -> dict:
    """Deterministic random-feature LPIPS parameters (see module docstring)."""
    key = jax.random.PRNGKey(seed)
    params = {"convs": [], "lins": [], "trained": False}
    c_in = 3
    for i, (c_out, _) in enumerate(_VGG_PLAN):
        key, kw = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        w = jax.random.normal(kw, (3, 3, c_in, c_out)) * np.sqrt(2.0 / fan_in)
        params["convs"].append({"w": w, "b": jnp.zeros((c_out,))})
        c_in = c_out
    for i, ch in enumerate(_TAP_CH):
        key, kl = jax.random.split(key)
        # non-negative lin weights, normalized so each layer contributes O(1)
        lin = jax.random.uniform(kl, (ch,)) / ch
        params["lins"].append(lin)
    return params


def lpips_params(path: str = None) -> dict:
    """Load vendored real weights if present, else the random-feature net."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "lpips_vgg.npz")
    if os.path.exists(path):
        blobs = np.load(path)
        params = {"convs": [], "lins": [], "trained": True}
        for i in range(len(_VGG_PLAN)):
            params["convs"].append({
                "w": jnp.asarray(blobs[f"conv{i}/w"]),   # HWIO
                "b": jnp.asarray(blobs[f"conv{i}/b"])})
        for j in range(len(_TAPS)):
            params["lins"].append(jnp.asarray(blobs[f"lin{j}"]).reshape(-1))
        return params
    return lpips_params_random()


def _vgg_features(params, x):
    """x: (N, H, W, 3) in [-1, 1] -> list of tapped feature maps (NHWC)."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for i, (c_out, pool_before) in enumerate(_VGG_PLAN):
        if pool_before:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        w, b = params["convs"][i]["w"], params["convs"][i]["b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + b)
        if i in _TAPS:
            feats.append(x)
    return feats


def _unit_normalize(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@jax.jit
def lpips_distance(params_convs_lins, img0, img1):
    """LPIPS distance between two images.

    params_convs_lins: output of lpips_params() (only 'convs'/'lins' used —
    pass as a dict; 'trained' flag is host metadata and must be stripped
    before jit).
    img0, img1: (H, W, 3) in [0, 1].
    """
    x0 = (img0[None] * 2.0 - 1.0).astype(jnp.float32)
    x1 = (img1[None] * 2.0 - 1.0).astype(jnp.float32)
    f0 = _vgg_features(params_convs_lins, x0)
    f1 = _vgg_features(params_convs_lins, x1)
    total = 0.0
    for a, b, lin in zip(f0, f1, params_convs_lins["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2    # (1, h, w, c)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))   # 1x1 conv+avg
    return total


_CACHED = None


def lpips_jax(pred, gt):
    """Module-level convenience: (H, W, 3) numpy/jax arrays in [0,1] ->
    (value, is_trained). Caches the parameter pytree."""
    global _CACHED
    if _CACHED is None:
        p = lpips_params()
        _CACHED = ({"convs": p["convs"], "lins": p["lins"]}, p["trained"])
    params, trained = _CACHED
    v = float(lpips_distance(params, jnp.asarray(pred, jnp.float32),
                             jnp.asarray(gt, jnp.float32)))
    return v, trained
