"""Real spherical-harmonics (band 0..2, "SH9") math for the AR-insertion
stage. Rebuilt from reference insert/insert_utils.py.

Basis convention matches the insertion subsystem's own (positive-sign real
SH, ordering [1, y, z, x, xy, yz, 3z^2-1, xz, x^2-y^2]) — note this differs
from the tcnn direction encoding used by the radiance field (ops/sh.py),
which carries the Condon-Shortley phase; the two never mix.

The SH9 triple-product tensor (reference loads a precomputed
insert/data/clebsch_3.tar) is computed here at import time by numerical
quadrature: C_ijk = ∫ Y_i Y_j Y_k dΩ via Gauss-Legendre x uniform-phi,
exact for band-limited integrands of this degree.
"""

import numpy as np
import jax
import jax.numpy as jnp


def normalize(v, eps=0.0):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def normalize_eps(v, eps=1e-6):
    return normalize(v, eps)


def sh9_basis(d):
    """d: (..., 3) unit dirs -> (..., 9) basis values
    (reference insert_utils.py:102-127)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        0.2820947918 * jnp.ones_like(x),
        0.4886025119 * y,
        0.4886025119 * z,
        0.4886025119 * x,
        1.0925484306 * x * y,
        1.0925484306 * y * z,
        0.3153915653 * (3.0 * z * z - 1.0),
        1.0925484306 * x * z,
        0.5462742153 * (x * x - y * y),
    ], axis=-1)


def get_sphere_rays(key, probe_num, ray_num):
    """Uniform sphere directions (probe_num, ray_num, 3)
    (reference insert_utils.py:61-70)."""
    k1, k2 = jax.random.split(key)
    cos_t = 1.0 - 2.0 * jax.random.uniform(k1, (probe_num, ray_num))
    phi = 2.0 * jnp.pi * jax.random.uniform(k2, (probe_num, ray_num))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)


def get_cubemap_rays(probe_num, resolution, keep_raw_dim=False):
    """Normalized cubemap directions, face order
    [+z, -z, +x, -x, +y, -y] (reference insert_utils.py:83-100).
    Returns (6, r, r, 3) if keep_raw_dim else (probe_num, 6*r*r, 3)."""
    x = np.linspace(0, 1, resolution) * 2 - 1
    X, Y = np.meshgrid(x, x, indexing="ij")
    X, Y = X[..., None], Y[..., None]
    ones = np.ones_like(X)
    faces = np.stack([
        np.concatenate([X, Y, ones], -1),    # +z (front)
        np.concatenate([X, Y, -ones], -1),   # -z (back)
        np.concatenate([ones, X, Y], -1),    # +x
        np.concatenate([-ones, X, Y], -1),   # -x
        np.concatenate([X, ones, Y], -1),    # +y
        np.concatenate([X, -ones, Y], -1),   # -y
    ], axis=0)
    faces = faces / np.linalg.norm(faces, axis=-1, keepdims=True)
    dirs = jnp.asarray(faces, jnp.float32)
    if keep_raw_dim:
        return dirs
    flat = dirs.reshape(1, -1, 3)
    return jnp.broadcast_to(flat, (probe_num, flat.shape[1], 3))


def get_sh_coeff(rays_d, rays_rgb):
    """Monte-Carlo SH projection (reference insert_utils.py:132-136).
    rays_d, rays_rgb: (probe, n, 3) -> (probe, 9, 3)."""
    Y = sh9_basis(rays_d)                                  # (p, n, 9)
    coeff = jnp.einsum("pnc,pnd->pcd", Y, rays_rgb)        # (p, 9, 3)
    return coeff * (4.0 * jnp.pi / rays_d.shape[1])


def get_sh_val(shec, dirs, clamp_positive=False):
    """Evaluate SH (9, 3) [or (..., 9, 3)] at dirs (n, 3) -> (n, 3)
    (reference insert_utils.py:142-147)."""
    Y = sh9_basis(dirs)                                    # (n, 9)
    if shec.ndim == 2:
        vals = jnp.einsum("nc,cd->nd", Y, shec)
    else:  # per-ray SH (n, 9, 3)
        vals = jnp.einsum("nc,ncd->nd", Y, shec)
    if clamp_positive:
        vals = jax.nn.relu(vals)
    return vals


def sh_product0(shec1, shec2):
    """DC term of the SH triple product (reference insert_utils.py:153-154)."""
    return 0.2821 * jnp.sum(shec1 * shec2, axis=-1, keepdims=True)


def get_sh_main_direction(shec):
    """Dominant light direction from the linear band, luminance-weighted
    (reference insert_utils.py:157-162). shec: (x, 9, 3) -> (x, 3)."""
    dirc = jnp.stack([shec[:, 3], shec[:, 1], shec[:, 2]], axis=-2)  # (x,3,3)
    lum = jnp.asarray([0.3, 0.59, 0.11])
    return normalize(jnp.einsum("xdc,c->xd", dirc, lum))


def rotate_sh_by_recalc(ray_dir, ray_rgb, rot_mat):
    """Rotate an SH light by re-projecting rotated sample rays
    (reference insert_utils.py:171-173)."""
    rd = (rot_mat @ ray_dir.T).T
    return get_sh_coeff(rd[None], ray_rgb[None])


def sh2envmap(sh_coeff, H, W, upper_hemi=False):
    """Lat-long environment map from SH (reference insert_utils.py:201-214)."""
    phi_max = np.pi / 2 if upper_hemi else np.pi
    phi, theta = jnp.meshgrid(jnp.linspace(0.0, phi_max, H),
                              jnp.linspace(-0.5 * np.pi, 1.5 * np.pi, W),
                              indexing="ij")
    dirs = jnp.stack([jnp.cos(theta) * jnp.sin(phi), jnp.cos(phi),
                      jnp.sin(theta) * jnp.sin(phi)], -1).reshape(-1, 3)
    return get_sh_val(sh_coeff, dirs).reshape(H, W, 3)


# ---------------------------------------------------------------------------
# SH9 triple product
# ---------------------------------------------------------------------------

def _compute_triple_product_table():
    """C_ijk = ∫ Y_i Y_j Y_k dΩ by quadrature (exact: integrand band <= 6).

    Replaces the reference's shipped Clebsch-Gordan table
    (insert/data/clebsch_3.tar, used in insert_utils.py:296-310)."""
    n_t, n_p = 32, 64
    nodes, weights = np.polynomial.legendre.leggauss(n_t)  # cos(theta) in [-1,1]
    phi = (np.arange(n_p) + 0.5) / n_p * 2 * np.pi
    ct, ph = np.meshgrid(nodes, phi, indexing="ij")
    w = np.broadcast_to(weights[:, None], ct.shape) * (2 * np.pi / n_p)
    st = np.sqrt(1 - ct ** 2)
    dirs = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1).reshape(-1, 3)
    Y = np.asarray(sh9_basis(jnp.asarray(dirs)))           # (q, 9)
    C = np.einsum("qi,qj,qk,q->ijk", Y, Y, Y, w.reshape(-1))
    C[np.abs(C) < 1e-8] = 0.0
    return C


_TRIPLE_C = None


def _triple_table():
    global _TRIPLE_C
    if _TRIPLE_C is None:
        _TRIPLE_C = jnp.asarray(_compute_triple_product_table(), jnp.float32)
    return _TRIPLE_C


def sh9_product(shec1, shec2):
    """Projected product of two SH9 functions: res_k = C_ijk a_i b_j
    (reference SH9_Triple_Product.SH9_product, insert_utils.py:305-310).
    shec1, shec2: (..., 9) -> (..., 9)."""
    C = _triple_table()
    return jnp.einsum("...i,...j,ijk->...k", shec1, shec2, C)


def sh9_product_93(shec1, shec2):
    """(..., 9, 3) variant — per-channel product
    (reference insert_utils.py:315-317)."""
    return sh9_product(jnp.moveaxis(shec1, -2, -1),
                       jnp.moveaxis(shec2, -2, -1)).swapaxes(-2, -1)


def write2ply(rgbs, pts, save_path):
    """ASCII PLY point-cloud writer (replaces the open3d dependency of
    reference insert_utils.py:40-46)."""
    rgbs = np.clip(np.asarray(rgbs), 0, 1)
    pts = np.asarray(pts)
    with open(save_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        for ax in "xyz":
            f.write(f"property float {ax}\n")
        for c in ("red", "green", "blue"):
            f.write(f"property uchar {c}\n")
        f.write("end_header\n")
        cols = (rgbs * 255).astype(np.uint8)
        for p, c in zip(pts, cols):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def read_ply(path):
    """Minimal ASCII PLY reader (points + colors)."""
    with open(path) as f:
        n = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        data = np.loadtxt(f, max_rows=n)
    pts = data[:, :3]
    rgbs = data[:, 3:6] / 255.0 if data.shape[1] >= 6 else None
    return pts, rgbs


def pts2normal(pts):
    """Screen-space normals from a point map (b, h, w, 3)
    (reference insert_utils.py:51-59)."""
    dy = pts[:, :-1] - pts[:, 1:]
    dy = jnp.concatenate([dy[:, :1], dy], 1)
    dx = pts[:, :, :-1] - pts[:, :, 1:]
    dx = jnp.concatenate([dx[:, :, :1], dx], 2)
    return normalize(jnp.cross(dy, dx))
