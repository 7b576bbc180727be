"""HDR tonemapping operators (reference insert/tonemapping.py). One set of
functions serves both host numpy and jitted jax (jnp ops work on numpy
inputs); default operator = gamma, like the reference (tonemapping.py:32-33).
"""

import numpy as np
import jax.numpy as jnp


def tonemapping_simple_log(im):
    return jnp.log(1.0 + 5000.0 * im) / np.log(1.0 + 5000.0)


def tonemapping_simple_gamma(im):
    return jnp.power(im / (1 + im), 1.0 / 2.2)


def tonemapping_simple_linear(im):
    return jnp.power(jnp.clip(im, 0, 1), 1.0 / 2.2)


def tonemapping_complex_reinhard(im):
    """OpenCV Reinhard (host-side only; gated on cv2)."""
    import cv2
    op = cv2.createTonemapReinhard(2.2, 1, 0.5, 0)
    return op.process(np.asarray(im, np.float32))


tonemapping_simple = tonemapping_simple_gamma
