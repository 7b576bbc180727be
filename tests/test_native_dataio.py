"""Native C++ batch image decoder vs the Python reference path."""

import os

import numpy as np
import pytest

from arnerf_tpu.datasets.color_utils import read_image, read_images
from arnerf_tpu.native import load_images_batch, _get_lib


def _write_png_rgba(path, rng, wh=20):
    import imageio.v2 as imageio
    img = (rng.random((wh, wh, 4)) * 255).astype(np.uint8)
    imageio.imsave(path, img)
    return img


def _write_jpg(path, rng, wh=24):
    import imageio.v2 as imageio
    img = (rng.random((wh, wh, 3)) * 255).astype(np.uint8)
    imageio.imsave(path, img, quality=95)


@pytest.mark.skipif(_get_lib() is None, reason="native lib unavailable")
def test_native_matches_python_png(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.png")
        _write_png_rgba(p, rng)
        paths.append(p)
    for blend in (True, False):
        native = load_images_batch(paths, (16, 16), blend_a=blend)
        assert native is not None
        ref = np.stack([read_image(p, (16, 16), blend_a=blend)[:, :3]
                        for p in paths])
        assert np.allclose(native, ref, atol=2e-2), \
            np.abs(native - ref).max()


@pytest.mark.skipif(_get_lib() is None, reason="native lib unavailable")
def test_native_matches_python_jpeg(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.jpg")
        _write_jpg(p, rng)
        paths.append(p)
    native = load_images_batch(paths, (12, 12))
    ref = np.stack([read_image(p, (12, 12))[:, :3] for p in paths])
    assert np.allclose(native, ref, atol=3e-2)


@pytest.mark.skipif(_get_lib() is None, reason="native lib unavailable")
def test_native_exr_roundtrip(tmp_path):
    from arnerf_tpu.native import write_exr
    rng = np.random.default_rng(2)
    hdr = rng.random((16, 16, 3)).astype(np.float32) * 4.0
    p = str(tmp_path / "im.exr")
    assert write_exr(p, hdr)
    native = load_images_batch([p], (16, 16), blend_a=False)
    assert native is not None
    # EXR stores half floats -> compare with tolerance
    assert np.allclose(native[0].reshape(16, 16, 3), hdr, rtol=2e-3,
                       atol=2e-3)


def test_read_images_fallback_on_missing(tmp_path):
    # unknown extension -> native returns failure -> python path raises
    with pytest.raises(Exception):
        read_images([str(tmp_path / "nope.tiff")], (8, 8))
