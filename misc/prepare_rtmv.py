#!/usr/bin/env python
"""Convert RTMV HDR .exr frames to LDR sRGB pngs in images/
(reference misc/prepare_rtmv.py)."""

import glob
import os
import sys

import numpy as np

from arnerf_tpu.datasets.color_utils import linear_to_srgb


def main(root):
    import cv2
    import imageio.v2 as imageio
    out_dir = os.path.join(root, 'images')
    os.makedirs(out_dir, exist_ok=True)
    for p in sorted(glob.glob(os.path.join(root, '*.exr'))):
        img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)[..., :3]
        img = linear_to_srgb(np.clip(img.astype(np.float32), 0, None))
        name = os.path.splitext(os.path.basename(p))[0] + '.png'
        imageio.imsave(os.path.join(out_dir, name),
                       (img * 255).astype(np.uint8))
        print(name)


if __name__ == '__main__':
    main(sys.argv[1])
