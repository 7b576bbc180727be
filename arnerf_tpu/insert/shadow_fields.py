"""Shadow fields: precomputed SH-visibility volumes around an occluder,
fetched at receiver points to darken the scene. Rebuilt from reference
insert/shadow_fields.py.

Instead of shipping a Monte-Carlo-precomputed sf.tar like the reference
(gen_sf_3d, shadow_fields.py:10-41), the sphere-occluder "simplify" field is
generated analytically: the visibility of a unit sphere from a point at
distance d is (1 - spherical cap of half-angle asin(1/d)), whose SH
projection is closed-form zonal harmonics rotated toward the occluder —
exact, instant, and deterministic.
"""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .sh_math import sh9_basis, sh_product0


def grid_sample_3d(vol, pts, align_corners=True):
    """Trilinear volume fetch with border clamp, torch-grid_sample layout:
    vol: (C, D, H, W); pts: (n, 3) in [-1, 1] ordered (x->W, y->H, z->D).
    Returns (n, C)."""
    C, D, H, W = vol.shape

    def to_pix(x, size):
        if align_corners:
            return (x + 1.0) / 2.0 * (size - 1)
        return ((x + 1.0) * size - 1.0) / 2.0

    gx = to_pix(pts[:, 0], W)
    gy = to_pix(pts[:, 1], H)
    gz = to_pix(pts[:, 2], D)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    fz = (gz - z0)[:, None]

    def fetch(iz, iy, ix):
        iz = jnp.clip(iz, 0, D - 1)
        iy = jnp.clip(iy, 0, H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        return vol[:, iz, iy, ix].T  # (n, C)

    out = 0.0
    for dz in (0, 1):
        wz = fz if dz else 1 - fz
        for dy in (0, 1):
            wy = fy if dy else 1 - fy
            for dx in (0, 1):
                wx = fx if dx else 1 - fx
                out = out + wz * wy * wx * fetch(z0 + dz, y0 + dy, x0 + dx)
    return out


def grid_sample_2d(img, pts, align_corners=False):
    """Bilinear fetch, border clamp. img: (C, H, W); pts: (n, 2) as (x, y)."""
    C, H, W = img.shape

    def to_pix(x, size):
        if align_corners:
            return (x + 1.0) / 2.0 * (size - 1)
        return ((x + 1.0) * size - 1.0) / 2.0

    gx = to_pix(pts[:, 0], W)
    gy = to_pix(pts[:, 1], H)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]

    def fetch(iy, ix):
        iy = jnp.clip(iy, 0, H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        return img[:, iy, ix].T

    return ((1 - fx) * (1 - fy) * fetch(y0, x0)
            + fx * (1 - fy) * fetch(y0, x0 + 1)
            + (1 - fx) * fy * fetch(y0 + 1, x0)
            + fx * fy * fetch(y0 + 1, x0 + 1))


def sphere_occlusion_sh9(pts):
    """Exact SH9 of the visibility function of a unit sphere at the origin
    seen from points `pts` (n, 3). V(w) = 0 inside the occlusion cone toward
    -p of half-angle asin(1/|p|), else 1. Closed-form zonal coefficients of a
    spherical cap, rotated along the occlusion axis."""
    pts = np.asarray(pts, np.float64)
    d = np.linalg.norm(pts, axis=-1)
    inside = d <= 1.0
    d_safe = np.maximum(d, 1.0 + 1e-9)
    sin_a = 1.0 / d_safe
    cos_a = np.sqrt(1.0 - sin_a ** 2)           # cap half-angle alpha
    t = cos_a
    # zonal SH of a polar cap of half-angle alpha (integral of P_l over cap):
    # c_l = 2*pi*N_l * int_t^1 P_l(x) dx, N_l = sqrt((2l+1)/(4pi))
    i0 = 1.0 - t
    i1 = 0.5 * (1.0 - t ** 2)
    i2 = 0.5 * (t - t ** 3)                     # int of (3x^2-1)/2 from t..1
    n0 = math.sqrt(1 / (4 * math.pi))
    n1 = math.sqrt(3 / (4 * math.pi))
    n2 = math.sqrt(5 / (4 * math.pi))
    cap0 = 2 * math.pi * n0 * i0
    cap1 = 2 * math.pi * n1 * i1
    cap2 = 2 * math.pi * n2 * i2
    # visibility = 1 - cap(axis = -p/|p|); SH of the constant 1 is sqrt(4pi)
    # in the DC slot only
    axis = -pts / np.maximum(d, 1e-12)[:, None]
    # rotate zonal coeffs: band-l coefficients = c_l * sqrt(4pi/(2l+1))
    # * Y_lm(axis) (standard ZH rotation)
    sh = np.zeros((len(pts), 9))
    Y = np.asarray(sh9_basis(jnp.asarray(axis, jnp.float32)))
    r0 = math.sqrt(4 * math.pi / 1)
    r1 = math.sqrt(4 * math.pi / 3)
    r2 = math.sqrt(4 * math.pi / 5)
    sh[:, 0] = math.sqrt(4 * math.pi) - cap0 * r0 * Y[:, 0]
    for col in range(1, 4):
        sh[:, col] = -cap1 * r1 * Y[:, col]
    for col in range(4, 9):
        sh[:, col] = -cap2 * r2 * Y[:, col]
    sh[inside] = 0.0  # inside the occluder: fully shadowed
    return sh.astype(np.float32)


class SimplifySF:
    """Analytic sphere-occluder shadow field on a procedural grid
    (replaces the reference's shipped sf.tar; shadow_fields.py:86-106)."""

    def __init__(self, sh_coeff_num=9, grid=48):
        self.vol_range = 6
        self.sh_coeff_num = sh_coeff_num
        xs = np.linspace(-self.vol_range, self.vol_range, grid)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
        sh = sphere_occlusion_sh9(pts).reshape(grid, grid, grid, 9)
        # volume layout (C, D, H, W) with xyz -> WHD like the reference's
        # permute(3,2,1,0)
        self.sf_vol = jnp.asarray(np.transpose(sh, (3, 2, 1, 0)))

    def fetch_sh(self, scale, pts):
        p = pts / scale / self.vol_range
        return grid_sample_3d(self.sf_vol, p, align_corners=True)


class ComplexSF:
    """Mesh-specific shadow field volume loaded from the viewer's export
    (reference shadow_fields.py:108-127; .txt via transform_sf_txt or the
    torch .tar it produced)."""

    def __init__(self, sh_path, sh_coeff_num=9):
        self.vol_range = 4
        self.sh_coeff_num = sh_coeff_num
        self.sf_vol = jnp.asarray(load_sf_volume(sh_path, sh_coeff_num))

    def fetch_sh(self, scale, pts):
        p = pts / scale / self.vol_range
        return grid_sample_3d(self.sf_vol, p, align_corners=True)


def load_sf_volume(path, sh_coeff_num=9):
    """Load a (1?, C, D, H, W)-style SF volume from .txt / .npz / torch .tar
    (reference transform_sf_txt_to_torch, shadow_fields.py:44-47)."""
    if path.endswith(".txt"):
        arr = np.loadtxt(path).reshape(30, 30, 30, -1)
        return np.transpose(arr, (3, 2, 1, 0)).astype(np.float32)
    if path.endswith(".npz"):
        return np.load(path)["sf"].astype(np.float32)
    import torch  # torch-cpu is available for ingesting reference assets
    t = torch.load(path, map_location="cpu")
    arr = np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)
    if arr.ndim == 5:  # stored with a leading batch dim
        arr = arr[0]
    return arr


def transform_sf_txt(path_sh, save_path):
    """Convert the viewer's .txt SF export to .npz."""
    arr = np.loadtxt(path_sh).reshape(30, 30, 30, -1)
    np.savez(save_path, sf=np.transpose(arr, (3, 2, 1, 0)).astype(np.float32))


def soft_shadow_map(sfer, model_pos, model_r, model_sh9, pts, rot_inv=None):
    """Shadow factor at receiver points: fetch the occluder's visibility SH
    at each point, SH-product with the light SH, compare DC irradiance
    (reference shadow_fields.py:56-83). Returns (x,) darkening in [0,1]."""
    m2pts = pts - model_pos[None, :]
    if rot_inv is not None:
        m2pts = (rot_inv @ m2pts.T).T
    pts_sh9 = sfer.fetch_sh(model_r, m2pts)                      # (x, 9)
    # per-channel DC of the (visibility x light) product
    psh = sh_product0(
        jnp.broadcast_to(pts_sh9[:, None, :],
                         (pts.shape[0], 3, sfer.sh_coeff_num)),
        jnp.transpose(model_sh9, (0, 2, 1)))                     # (x, 3, 1)
    old_ir = model_sh9[:, 0, :]                                  # (1, 3)
    new_ir = psh[..., 0]                                         # (x, 3)
    res = jnp.mean(jnp.clip(new_ir / old_ir, 0.0, 1.0), axis=-1)
    return jnp.power(res, 10)  # shadow-contrast boost (reference :81)
