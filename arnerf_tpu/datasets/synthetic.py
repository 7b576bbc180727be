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


def analytic_sigma(x, scale: float, object_only: bool = False):
    """Density: a solid sphere, a box, and a thin slab — sharp but smooth.
    x: (..., 3) world coords. Returns (...,).

    object_only drops the ground slab, leaving just the sphere + box
    (~3% of the cube volume). The slab spans the whole cube, so every
    800x800 ray survives AABB culling and the coarse-mip prelude — an
    adversarial worst case for interactive-FPS comparison against the
    reference's Lego headline (README.md:90), where the white background
    kills most rays before any field fetch. The object-only variant gives
    the renderer Lego-like ray statistics for an apples-to-apples FPS
    measurement without changing the training scene."""
    s = scale
    # sphere r=0.36s at origin
    d_sph = jnp.linalg.norm(x - jnp.asarray([0.0, 0.1 * s, 0.0]), axis=-1) - 0.36 * s
    # box at (-0.45s, -0.3s, 0.3s) half 0.18s
    q = jnp.abs(x - jnp.asarray([-0.45 * s, -0.3 * s, 0.3 * s])) - 0.18 * s
    d_box = jnp.linalg.norm(jnp.maximum(q, 0), axis=-1) + \
        jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d = jnp.minimum(d_sph, d_box)
    if not object_only:
        # ground slab y in [0.55s, 0.62s]
        d_slab = jnp.abs(x[..., 1] - 0.585 * s) - 0.035 * s
        d = jnp.minimum(d, d_slab)
    return 90.0 / scale * jax.nn.sigmoid(-d / (0.01 * s))


def analytic_rgb(x, scale: float):
    """Smooth position-dependent albedo in [0.05, 0.95]."""
    p = x / scale
    r = 0.5 + 0.45 * jnp.sin(6.0 * p[..., 0] + 2.0 * p[..., 2])
    g = 0.5 + 0.45 * jnp.cos(5.0 * p[..., 1] - 1.0)
    b = 0.5 + 0.45 * jnp.sin(4.0 * (p[..., 0] + p[..., 1] + p[..., 2]))
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.05, 0.95)


@partial(jax.jit,
         static_argnames=("scale", "n_samples", "white_bg", "object_only"))
def render_analytic(rays_o, rays_d, scale: float, n_samples: int = 512,
                    white_bg: bool = True, object_only: bool = False):
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
    sig = analytic_sigma(pos, scale, object_only) * ok[:, None]
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


def bake_analytic_field(scale: float = 0.5, resolution: int = 256,
                        object_only: bool = True, n_dirs: int = 16,
                        sigma_thresh: float = 1e-2, **bake_kw):
    """Bake the analytic field into a BakedField directly (no training).

    bench.py uses this for the `render_fps_800_baked_object` extra: the
    renderer's speed under Lego-like ray statistics (object occupies ~3%
    of the cube; most rays die at the tight AABB or in the mip prelude),
    measured with the exact production bake/render code but decoupled
    from a training run. The occupancy mask keeps every voxel whose
    analytic sigma clears `sigma_thresh` — the sigmoid edge is ~0.01*scale
    wide, so the threshold reaches ~9 edge-widths out at sigma_max=180.
    """
    from ..rendering_baked import bake_field
    B = resolution
    ax = (jnp.arange(B, dtype=jnp.float32) + 0.5) / B * 2 * scale - scale
    # z-fastest layout to match bake_field's row indexing
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    centers = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    occ = []
    chunk = 1 << 20
    sig_fn = jax.jit(lambda c: analytic_sigma(c, scale, object_only)
                     > sigma_thresh)
    for i in range(0, centers.shape[0], chunk):
        occ.append(np.asarray(sig_fn(centers[i:i + chunk])))
    occ_mask = np.concatenate(occ)

    def field_fn(xyz, dirs):
        return (analytic_sigma(xyz, scale, object_only),
                analytic_rgb(xyz, scale))

    return bake_field(field_fn, scale, resolution=resolution,
                      occ_mask=occ_mask, n_dirs=n_dirs, **bake_kw)


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
                # GT background must match the training convention
                # (rendering.py / reference rendering.py:287-296): bounded
                # scenes (exp_step_factor == 0, i.e. scale <= 0.5) blend
                # WHITE like the blender datasets; unbounded scenes blend
                # BLACK — white-bg GT there makes empty rays est~0 vs
                # gt~1, and the relative loss (1/(est+1e-3))^2 explodes
                # into NaN within a few hundred steps (found by the
                # scale-2 e2e; real photos have no synthetic background).
                rgb, _, _ = render_analytic(ro[i:i + chunk], rd[i:i + chunk],
                                            cfg.scale,
                                            n_samples=cfg.gt_samples,
                                            white_bg=cfg.scale <= 0.5)
                parts.append(np.asarray(rgb, np.float32))
            imgs.append(np.concatenate(parts))
        return np.stack(imgs)  # (N, H*W, 3)
