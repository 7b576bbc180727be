"""Procedural analytic scene + renderer: dataset-free ground truth.

Not present in the reference (which always reads image datasets) — this
module generates exact volume-rendered ground truth from an analytic density
/ albedo field so the framework can be convergence-tested and benchmarked on
machines with no datasets on disk. The analytic field is rendered with dense
uniform sampling (no occupancy grid), i.e. an independent oracle against the
framework's marching/compositing path.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .base import BaseDataset
from .ray_utils import get_ray_directions, get_rays, look_at_pose


def analytic_sigma(x, scale: float):
    """Density: a solid sphere, a box, and a thin slab — sharp but smooth.
    x: (..., 3) world coords. Returns (...,)."""
    s = scale
    # sphere r=0.36s at origin
    d_sph = jnp.linalg.norm(x - jnp.asarray([0.0, 0.1 * s, 0.0]), axis=-1) - 0.36 * s
    # box at (-0.45s, -0.3s, 0.3s) half 0.18s
    q = jnp.abs(x - jnp.asarray([-0.45 * s, -0.3 * s, 0.3 * s])) - 0.18 * s
    d_box = jnp.linalg.norm(jnp.maximum(q, 0), axis=-1) + \
        jnp.minimum(jnp.max(q, axis=-1), 0.0)
    # ground slab y in [0.55s, 0.62s]
    d_slab = jnp.abs(x[..., 1] - 0.585 * s) - 0.035 * s
    d = jnp.minimum(jnp.minimum(d_sph, d_box), d_slab)
    return 90.0 / scale * jax.nn.sigmoid(-d / (0.01 * s))


def analytic_rgb(x, scale: float):
    """Smooth position-dependent albedo in [0.05, 0.95]."""
    p = x / scale
    r = 0.5 + 0.45 * jnp.sin(6.0 * p[..., 0] + 2.0 * p[..., 2])
    g = 0.5 + 0.45 * jnp.cos(5.0 * p[..., 1] - 1.0)
    b = 0.5 + 0.45 * jnp.sin(4.0 * (p[..., 0] + p[..., 1] + p[..., 2]))
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.05, 0.95)


@partial(jax.jit, static_argnames=("scale", "n_samples", "white_bg"))
def render_analytic(rays_o, rays_d, scale: float, n_samples: int = 512,
                    white_bg: bool = True):
    """Dense uniform-sampling oracle renderer of the analytic field."""
    from ..ops.intersection import ray_aabb_intersect_single
    hits = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                     jnp.full(3, scale))
    t1 = jnp.maximum(hits[:, 0], 0.0)
    t2 = hits[:, 1]
    ok = t2 > 0
    dt = (t2 - t1) / n_samples
    k = jnp.arange(n_samples, dtype=jnp.float32)[None, :]
    ts = t1[:, None] + (k + 0.5) * dt[:, None]
    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    sig = analytic_sigma(pos, scale) * ok[:, None]
    col = analytic_rgb(pos, scale)
    sd = sig * dt[:, None]
    T = jnp.exp(-(jnp.cumsum(sd, axis=1) - sd))
    w = T * (1 - jnp.exp(-sd))
    rgb = jnp.sum(w[..., None] * col, axis=1)
    opa = jnp.sum(w, axis=1)
    depth = jnp.sum(w * ts, axis=1)
    if white_bg:
        rgb = rgb + (1.0 - opa[:, None])
    return rgb, opa, depth


@dataclass
class SyntheticConfig:
    scale: float = 0.5
    img_wh: tuple = (128, 128)
    n_train: int = 24
    n_test: int = 4
    cam_radius_factor: float = 2.4   # camera ring radius = factor * scale
    fov_deg: float = 45.0
    gt_samples: int = 512


class SyntheticDataset(BaseDataset):
    """Procedural dataset, API-compatible with the file-based loaders."""

    def __init__(self, root_dir="", split="train", downsample=1.0,
                 config: SyntheticConfig = None, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.config = cfg = config or SyntheticConfig()
        w, h = cfg.img_wh
        w = int(w * downsample)
        h = int(h * downsample)
        self.img_wh = (w, h)
        f = 0.5 * w / np.tan(0.5 * np.deg2rad(cfg.fov_deg))
        self.K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]],
                          np.float32)
        self.directions = get_ray_directions(h, w, self.K)
        self.scale = cfg.scale

        n = cfg.n_train if split.startswith("train") else cfg.n_test
        phase = 0.0 if split.startswith("train") else 0.5
        rad = cfg.cam_radius_factor * cfg.scale
        poses = []
        rng = np.random.default_rng(7 if split.startswith("train") else 11)
        for i in range(n):
            th = 2 * np.pi * (i + phase) / n
            height = rng.uniform(-0.9, 0.2) * cfg.scale
            eye = np.array([rad * np.cos(th), height, rad * np.sin(th)])
            poses.append(look_at_pose(eye))
        self.poses = np.stack(poses).astype(np.float32)

        if kwargs.get("read_meta", True):
            self.rays = self._render_gt()

    def _render_gt(self, chunk=1 << 16):
        cfg = self.config
        imgs = []
        dirs = jnp.asarray(self.directions)
        n = dirs.shape[0]
        for pose in self.poses:
            ro, rd = get_rays(dirs, jnp.asarray(pose))
            rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            parts = []
            for i in range(0, n, chunk):
                rgb, _, _ = render_analytic(ro[i:i + chunk], rd[i:i + chunk],
                                            cfg.scale,
                                            n_samples=cfg.gt_samples)
                parts.append(np.asarray(rgb, np.float32))
            imgs.append(np.concatenate(parts))
        return np.stack(imgs)  # (N, H*W, 3)
