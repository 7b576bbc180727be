"""Synthesize a Blender-format (Synthetic-NeRF) scene of the procedural
analytic field at ANY resolution/view count: `transforms_{train,test}.json`
+ PNGs, exactly the layout the nerf loader (reference datasets/nerf.py)
expects.

This is the real-scene benchmark-readiness tool (VERDICT r3 #8): it
produces a fixture of the reference's actual data shape (800x800, 100
train views — the Blender capture density) so the full benchmark schedule
(`benchmarking/benchmark_synthetic_nerf.sh`) can be proven unattended
before any real dataset lands. The camera/json conventions are shared
with tests/test_blender_fixture_e2e.py (radius 1.5 == the loader's
pose_radius_scale so its per-frame rescale is the identity).

Usage:
  python scripts/make_blender_fixture.py OUT_DIR [--wh 800] [--views 100]
      [--test_views 8] [--samples 256] [--seed 3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FOV_DEG = 45.0
RADIUS = 1.5          # == nerf loader pose_radius_scale: rescale = identity
SCALE = 0.5


def make_fixture(root, wh=800, views=100, test_views=8, samples=256,
                 seed=3, chunk=1 << 16, log=lambda *a: None):
    import jax.numpy as jnp
    from arnerf_tpu.datasets.synthetic import render_analytic
    from arnerf_tpu.datasets.ray_utils import (get_ray_directions, get_rays,
                                               look_at_pose)
    import imageio.v2 as imageio

    W = H = wh
    cax = float(np.deg2rad(FOV_DEG))
    f = 0.5 * W / np.tan(0.5 * cax)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))

    rng = np.random.default_rng(seed)
    for split, n, phase in (("train", views, 0.0),
                            ("test", test_views, 0.5)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            th = 2 * np.pi * (i + phase) / n
            phi = rng.uniform(-0.35, 0.08)   # must stay in the RNG stream
            eye = RADIUS * np.array([np.cos(th) * np.cos(phi), np.sin(phi),
                                     np.sin(th) * np.cos(phi)])
            c2w = look_at_pose(eye)
            name = f"r_{i}"
            png = os.path.join(root, split, f"{name}.png")
            if not os.path.exists(png):   # resumable (pool drops mid-run)
                ro, rd = get_rays(dirs, jnp.asarray(c2w))
                rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
                outs = []
                for s in range(0, ro.shape[0], chunk):
                    rgb, _, _ = render_analytic(ro[s:s + chunk],
                                                rd[s:s + chunk],
                                                SCALE, n_samples=samples)
                    outs.append(np.asarray(rgb))
                img = np.clip(np.concatenate(outs), 0, 1).reshape(H, W, 3)
                imageio.imsave(png, (img * 255 + 0.5).astype(np.uint8))
            blender = c2w.copy()
            blender[:, 1:3] *= -1
            mat = np.eye(4, dtype=np.float64)
            mat[:3, :4] = blender
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": mat.tolist()})
            log(f"{split} {i + 1}/{n}")
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fj:
            json.dump({"camera_angle_x": cax, "frames": frames}, fj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--test_views", type=int, default=8)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()
    make_fixture(args.out, wh=args.wh, views=args.views,
                 test_views=args.test_views, samples=args.samples,
                 seed=args.seed,
                 log=lambda m: print(m, file=sys.stderr, flush=True))
    print(f"fixture at {args.out}: {args.views} train + {args.test_views} "
          f"test views @ {args.wh}x{args.wh}")


if __name__ == "__main__":
    main()
