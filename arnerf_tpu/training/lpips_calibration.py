"""Calibration harness for the random-feature LPIPS surrogate.

The in-repo JAX LPIPS (lpips.py) runs with DETERMINISTIC random VGG
features whenever the official VGG/lin weights aren't vendored (this image
has no torchvision and zero egress). Such `lpips_rand` values are
self-consistent but carry no interpretable scale — VERDICT r2 asked for a
calibration that gives them one: controlled distortions at swept strengths
applied to a procedural render, checking that

  1. within every distortion family, lpips_rand increases monotonically
     with distortion strength (perfect rank correlation), and
  2. lpips_rand agrees with (1 - SSIM) on the induced ordering across ALL
     distorted images (cross-family rank correlation),

which is exactly the evidence Amir & Weiss (CVPR 2021) use to argue random
deep features track perceptual orderings. The numbers land in STATUS.md;
tests/test_lpips_calibration.py pins the monotonicity so a regression in
the feature stack (or an accidental re-seed) fails CI.

Distortion families (strength grows leftward->rightward):
  blur   — separable Gaussian, sigma in pixels
  noise  — additive Gaussian, sigma in intensity units
  quant  — uniform quantization to L levels (L falls as strength grows)
  block  — k x k block averaging (JPEG-blockiness proxy; PIL-free)
"""

import numpy as np
import jax.numpy as jnp

DISTORTIONS = {
    "blur": [0.5, 1.0, 2.0, 3.0, 4.0],          # sigma px
    "noise": [0.02, 0.05, 0.1, 0.2, 0.3],       # sigma intensity
    "quant": [64, 32, 16, 8, 4],                # levels (fewer = stronger)
    "block": [2, 4, 8, 16, 32],                 # block size px
}


def _gauss_kernel(sigma):
    r = max(1, int(np.ceil(3 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def distort(img: np.ndarray, kind: str, strength, seed: int = 0):
    """img: (H, W, 3) float in [0, 1] -> distorted copy, same shape/range."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    if kind == "blur":
        k = _gauss_kernel(float(strength))

        def blur1d(a, axis):
            r = len(k) // 2
            pad = [(r, r) if i == axis else (0, 0) for i in range(a.ndim)]
            p = np.pad(a, pad, mode="edge")
            out = np.zeros_like(a)
            for i, kv in enumerate(k):
                sl = [slice(None)] * a.ndim
                sl[axis] = slice(i, i + a.shape[axis])
                out += kv * p[tuple(sl)]
            return out

        return np.clip(blur1d(blur1d(img, 0), 1), 0.0, 1.0)
    if kind == "noise":
        rng = np.random.default_rng(seed)
        return np.clip(img + rng.normal(0, float(strength), img.shape)
                       .astype(np.float32), 0.0, 1.0)
    if kind == "quant":
        L = int(strength)
        return np.clip(np.round(img * (L - 1)) / (L - 1), 0.0, 1.0)
    if kind == "block":
        k = int(strength)
        hh, ww = (h // k) * k, (w // k) * k
        out = img.copy()
        blk = img[:hh, :ww].reshape(hh // k, k, ww // k, k, 3)
        out[:hh, :ww] = np.repeat(np.repeat(
            blk.mean(axis=(1, 3)), k, axis=0), k, axis=1).reshape(hh, ww, 3)
        return out
    raise ValueError(kind)


def spearman(a, b) -> float:
    """Spearman rank correlation (scipy-free)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 0.0


def reference_image(wh: int = 96) -> np.ndarray:
    """A held-out procedural render (the repo's dataset-free test scene)."""
    from ..datasets.synthetic import SyntheticDataset, SyntheticConfig
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=1, n_test=1,
                           gt_samples=256)
    ds = SyntheticDataset(split="test", config=scfg)
    return np.asarray(ds.rays[0][:, :3], np.float32).reshape(wh, wh, 3)


def calibrate(img: np.ndarray = None, wh: int = 96) -> dict:
    """Run the full sweep. Returns
    {family: {"strengths": [...], "lpips": [...], "ssim": [...],
              "spearman_lpips_vs_strength": r, ...},
     "cross_family_spearman_lpips_vs_1m_ssim": r}
    """
    from .lpips import lpips_jax
    from .metrics import ssim as ssim_fn
    if img is None:
        img = reference_image(wh)
    img_j = jnp.asarray(img)
    out = {}
    all_lp, all_ds = [], []
    for kind, strengths in DISTORTIONS.items():
        lps, ssims = [], []
        for s in strengths:
            d = distort(img, kind, s)
            lp, _ = lpips_jax(d, img)
            sv = float(ssim_fn(jnp.asarray(d), img_j))
            lps.append(lp)
            ssims.append(sv)
        # strength ordering: DISTORTIONS lists weakest -> strongest for all
        # families (quant: fewer levels = stronger)
        rank_strength = list(range(len(strengths)))
        out[kind] = {
            "strengths": strengths, "lpips": lps, "ssim": ssims,
            "spearman_lpips_vs_strength": spearman(lps, rank_strength),
            "spearman_ssim_vs_strength": spearman(
                [-s for s in ssims], rank_strength),
        }
        all_lp.extend(lps)
        all_ds.extend(1.0 - np.asarray(ssims))
    out["cross_family_spearman_lpips_vs_1m_ssim"] = spearman(all_lp, all_ds)
    return out
