"""Image quality metrics, pure JAX (reference uses torchmetrics,
train.py:68-74). LPIPS is provided via the CPU torch path when available
(gated — heavy dependency), matching --eval_lpips."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def mse(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt, data_range: float = 1.0):
    return 10.0 * jnp.log10(data_range ** 2 / mse(pred, gt))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return jnp.asarray(g / g.sum(), jnp.float32)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(pred, gt, data_range: float = 1.0):
    """Standard SSIM, 11x11 gaussian window, per-channel mean.
    pred, gt: (H, W, C) in [0, data_range]."""
    k = _gaussian_kernel()
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    def blur(img):  # separable gaussian, same-size valid windowing
        img = jnp.moveaxis(img, -1, 0)  # (C, H, W)
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda row: jnp.convolve(row, k, mode="valid"), 1, ch))(img)
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda col: jnp.convolve(col, k, mode="valid"), 0, ch))(img)
        return jnp.moveaxis(img, 0, -1)

    mu_p, mu_g = blur(pred), blur(gt)
    mu_pp, mu_gg, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    # fp32 E[x^2]-E[x]^2 cancels catastrophically on flat regions (variance
    # ~1e-6 noise against C2=9e-4 pushed SSIM of near-identical flat images
    # above 1). Enforce variance >= 0 and Cauchy-Schwarz on the covariance.
    sigma_p = jnp.maximum(blur(pred * pred) - mu_pp, 0.0)
    sigma_g = jnp.maximum(blur(gt * gt) - mu_gg, 0.0)
    sigma_pg = blur(pred * gt) - mu_pg
    bound = jnp.sqrt(sigma_p * sigma_g)
    sigma_pg = jnp.clip(sigma_pg, -bound, bound)
    s = ((2 * mu_pg + C1) * (2 * sigma_pg + C2)) / \
        ((mu_pp + mu_gg + C1) * (sigma_p + sigma_g + C2))
    return jnp.mean(s)


_LPIPS = None


class LpipsValue(float):
    """A float LPIPS value carrying whether TRAINED features produced it.

    `trained=False` means the documented random-feature surrogate supplied
    the features (training/lpips.py contract): such values are internally
    consistent but NOT comparable to published LPIPS(vgg) tables, and
    callers must label them `lpips_rand`, never `lpips_vgg`."""
    trained: bool = False

    def __new__(cls, value, trained):
        v = super().__new__(cls, value)
        v.trained = bool(trained)
        return v

    @property
    def label(self):
        return "lpips_vgg" if self.trained else "lpips_rand"


def lpips(pred, gt):
    """LPIPS(vgg). pred, gt: (H, W, 3) numpy in [0, 1].

    Resolution order: torchmetrics' pretrained metric if importable
    (matches the reference's numbers exactly); otherwise the in-repo JAX
    implementation (training/lpips.py — the official net if vendored
    weights exist, else the documented random-feature surrogate).
    Always returns a number in this image — an LpipsValue float whose
    `.trained`/`.label` say whether it's comparable to published tables."""
    global _LPIPS
    try:
        if _LPIPS is None:
            import torch  # noqa
            from torchmetrics.image.lpip import \
                LearnedPerceptualImagePatchSimilarity
            _LPIPS = LearnedPerceptualImagePatchSimilarity("vgg")
    except Exception:
        from .lpips import lpips_jax
        v, trained = lpips_jax(pred, gt)
        return LpipsValue(v, trained)
    import torch
    to_t = lambda x: torch.from_numpy(
        np.asarray(x, np.float32)).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return LpipsValue(float(_LPIPS(to_t(pred).clamp(-1, 1),
                                       to_t(gt).clamp(-1, 1))), True)
