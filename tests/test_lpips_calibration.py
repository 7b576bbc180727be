"""Pin the LPIPS-surrogate calibration (VERDICT r2 next #6).

The random-feature surrogate's numbers only mean something if they order
distortions the way a perceptual metric must. These tests pin that
ordering on the procedural scene so a feature-stack regression (changed
seed, broken normalization, conv plan edit) fails CI rather than silently
invalidating every reported lpips_rand.
"""

import numpy as np
import pytest

from arnerf_tpu.training.lpips_calibration import (DISTORTIONS, calibrate,
                                                   distort, spearman,
                                                   reference_image)


@pytest.fixture(scope="module")
def calib():
    return calibrate(wh=64)


def test_monotone_within_every_family(calib):
    """lpips_rand must increase strictly with distortion strength within
    each family (perfect Spearman)."""
    for kind in DISTORTIONS:
        lp = calib[kind]["lpips"]
        assert calib[kind]["spearman_lpips_vs_strength"] == 1.0, \
            f"{kind}: lpips {lp} not monotone in strength"


def test_cross_family_agreement_with_ssim(calib):
    """Across all 20 distorted images the surrogate's ordering must agree
    with 1-SSIM's (rank correlation >= 0.8 — the two metrics legitimately
    disagree on blur-vs-noise tradeoffs, full agreement isn't expected)."""
    r = calib["cross_family_spearman_lpips_vs_1m_ssim"]
    assert r >= 0.8, r


def test_identity_is_zero_and_positive_elsewhere():
    img = reference_image(64)
    from arnerf_tpu.training.lpips import lpips_jax
    v0, trained = lpips_jax(img, img)
    assert v0 == pytest.approx(0.0, abs=1e-6)
    vb, _ = lpips_jax(distort(img, "blur", 2.0), img)
    assert vb > 1e-4


def test_spearman_helper():
    assert spearman([1, 2, 3], [10, 20, 30]) == 1.0
    assert spearman([1, 2, 3], [30, 20, 10]) == -1.0
    assert abs(spearman([1, 2, 3, 4], [1, 3, 2, 4])) < 1.0
