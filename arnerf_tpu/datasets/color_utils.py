"""Image reading + color-space helpers (reference datasets/color_utils.py)."""

import os
os.environ['OPENCV_IO_ENABLE_OPENEXR'] = '1'  # must precede cv2 import

import numpy as np


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    img = np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img)
    img[img > 1] = 1  # "clamp" tonemapper
    return img


def read_image(img_path, img_wh, blend_a=True, exr_file=False):
    """Load an image to a flattened (H*W, C) float32 array.

    LDR: [0,1] with alpha blended to white (blend_a) or premultiplied.
    EXR: linear HDR via OpenCV (reference color_utils.py:22-41).
    """
    import cv2
    if exr_file:
        img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        if img.shape[2] == 4:
            img = img[..., :3] * img[..., -1:]
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    else:
        import imageio.v2 as imageio
        img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[2] == 4:  # blend A to RGB
        if blend_a:
            img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        else:
            img = img[..., :3] * img[..., -1:]
    img = cv2.resize(img, img_wh)
    return img.reshape(-1, img.shape[-1]).astype(np.float32)


def read_images(img_paths, img_wh, blend_a=True, exr_file=False):
    """Batch image read: native threaded C++ decoder when available
    (arnerf_tpu/native), Python per-image fallback otherwise.
    Returns (n, W*H, 3) float32."""
    if img_paths and not exr_file:
        # EXR premultiply semantics differ per-loader; native path covers
        # LDR + EXR uniformly, but cv2 EXR handling (BGR swap) is kept in
        # the fallback for bit-exactness with the reference
        try:
            from ..native import load_images_batch
            out = load_images_batch(list(img_paths), img_wh, blend_a)
            if out is not None:
                return out
        except Exception:
            pass
    import numpy as _np
    return _np.stack([read_image(p, img_wh, blend_a, exr_file)[:, :3]
                      for p in img_paths]) if img_paths else \
        _np.zeros((0, img_wh[0] * img_wh[1], 3), _np.float32)
