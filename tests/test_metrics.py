"""Metric implementations vs the reference's torchmetrics (torch-cpu)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arnerf_tpu.training.metrics import psnr, ssim, mse


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert np.isclose(float(psnr(a, b)), 20.0, atol=1e-4)  # -10log10(0.01)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    assert float(ssim(img, img)) > 0.9999


def test_ssim_matches_torchmetrics():
    pytest.importorskip("torchmetrics")
    import torch
    from torchmetrics import StructuralSimilarityIndexMeasure
    rng = np.random.default_rng(1)
    # smooth-ish correlated images (SSIM on pure noise is degenerate)
    base = rng.random((72, 72, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    a = gaussian_filter(base, (3, 3, 0))
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    tm = StructuralSimilarityIndexMeasure(data_range=1.0)
    ref = float(tm(torch.from_numpy(b).permute(2, 0, 1)[None],
                   torch.from_numpy(a).permute(2, 0, 1)[None]))
    assert np.isclose(ours, ref, atol=0.02), (ours, ref)


def test_ssim_matches_independent_numpy():
    """Cross-check against a literal NumPy transcription of Wang et al.'s
    SSIM (gaussian 11x11, k1=.01, k2=.03) written independently of the jax
    version."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(3)
    a = gaussian_filter(rng.random((64, 64, 3)).astype(np.float32),
                        (2, 2, 0))
    b = np.clip(a + rng.normal(0, 0.08, a.shape).astype(np.float32), 0, 1)

    def np_ssim(x, y):
        # valid-window gaussian SSIM via separable filtering with
        # truncation chosen to emulate an 11-tap kernel
        def blur(img):
            out = np.stack([gaussian_filter(img[..., c], 1.5,
                                            truncate=(5 + 0.5) / 1.5,
                                            mode="constant")
                            for c in range(img.shape[-1])], -1)
            return out[5:-5, 5:-5]
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        mx, my = blur(x), blur(y)
        sxx = blur(x * x) - mx * mx
        syy = blur(y * y) - my * my
        sxy = blur(x * y) - mx * my
        return np.mean(((2 * mx * my + C1) * (2 * sxy + C2))
                       / ((mx ** 2 + my ** 2 + C1) * (sxx + syy + C2)))

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = np_ssim(a, b)
    # different border handling -> loose tolerance
    assert np.isclose(ours, ref, atol=0.03), (ours, ref)


def test_psnr_matches_torchmetrics():
    pytest.importorskip("torchmetrics")
    import torch
    from torchmetrics import PeakSignalNoiseRatio
    rng = np.random.default_rng(2)
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    tm = PeakSignalNoiseRatio(data_range=1.0)
    ref = float(tm(torch.from_numpy(a), torch.from_numpy(b)))
    assert np.isclose(ours, ref, atol=1e-3)


def test_ssim_never_exceeds_one_on_flat_images():
    """fp32 variance cancellation on flat regions must not push SSIM > 1
    (observed 1.0031 on a white-background render pair)."""
    import jax.numpy as jnp
    from arnerf_tpu.training.metrics import ssim
    a = jnp.ones((64, 64, 3)) * 0.997
    b = a + 1e-4
    v = float(ssim(a, b))
    assert v <= 1.0 + 1e-6, v
    assert v > 0.99
    # identical images: exactly at/below 1
    assert float(ssim(a, a)) <= 1.0 + 1e-6
