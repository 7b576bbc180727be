"""Isosurface extraction via marching tetrahedra (self-contained NumPy).

Replaces the reference's mcubes+trimesh mesh-extraction cell in test.ipynb.
Marching tetrahedra needs no 256-entry case table: each cube splits into six
tetrahedra around the main diagonal and each tetrahedron's 16 sign patterns
reduce to "one vertex inside" (1 triangle), "two inside" (2 triangles), or
nothing — all derived programmatically below.
"""

import numpy as np

# cube corner offsets, index = bit pattern (x, y, z)
_CORNERS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                     for z in (0, 1)], np.int32)
# 6 tetrahedra sharing the 0-7 main diagonal (indices into _CORNERS)
_TETS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int32)


def _tet_triangles(inside):
    """For one sign pattern (4 bools) return triangles as lists of edge
    pairs ((a, b) = interpolate between tet-local vertices a, b)."""
    ins = [i for i in range(4) if inside[i]]
    outs = [i for i in range(4) if not inside[i]]
    if len(ins) == 0 or len(ins) == 4:
        return []
    if len(ins) == 1:
        a = ins[0]
        return [[(a, outs[0]), (a, outs[1]), (a, outs[2])]]
    if len(ins) == 3:
        a = outs[0]
        return [[(a, ins[0]), (a, ins[1]), (a, ins[2])]]
    # two in, two out -> quad -> two triangles
    a, b = ins
    c, d = outs
    return [[(a, c), (a, d), (b, d)], [(a, c), (b, d), (b, c)]]


_CASES = [_tet_triangles([bool(p & (1 << i)) for i in range(4)])
          for p in range(16)]


def marching_tetrahedra(field, threshold, origin=(0, 0, 0), spacing=1.0):
    """field: (X, Y, Z) scalar grid -> (verts (V, 3), faces (F, 3)).
    Surface at field == threshold; vertices linearly interpolated."""
    X, Y, Z = field.shape
    ix, iy, iz = np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                             np.arange(Z - 1), indexing="ij")
    base = np.stack([ix, iy, iz], -1).reshape(-1, 3)          # (C, 3)
    corner_idx = base[:, None, :] + _CORNERS[None]            # (C, 8, 3)
    vals = field[corner_idx[..., 0], corner_idx[..., 1],
                 corner_idx[..., 2]]                          # (C, 8)

    tris = []
    for tet in _TETS:
        tv = vals[:, tet]                                     # (C, 4)
        tp = corner_idx[:, tet, :].astype(np.float64)          # (C, 4, 3)
        inside = tv > threshold
        pattern = (inside * (1 << np.arange(4))).sum(-1)      # (C,)
        for p in range(1, 15):
            sel = np.where(pattern == p)[0]
            if len(sel) == 0:
                continue
            for tri in _CASES[p]:
                pts = []
                for a, b in tri:
                    va, vb = tv[sel, a], tv[sel, b]
                    t = (threshold - va) / np.where(
                        np.abs(vb - va) > 1e-12, vb - va, 1e-12)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pts.append(tp[sel, a] * (1 - t) + tp[sel, b] * t)
                tris.append(np.stack(pts, axis=1))            # (n, 3, 3)
    if not tris:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
    tri_pts = np.concatenate(tris, 0)                         # (T, 3, 3)

    # weld duplicate vertices
    flat = tri_pts.reshape(-1, 3)
    key = np.round(flat / max(1e-9, 1e-6)).astype(np.int64)
    _, uniq_idx, inv = np.unique(key, axis=0, return_index=True,
                                 return_inverse=True)
    verts = flat[uniq_idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # degenerate faces out
    keep = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[keep]
    verts = verts * spacing + np.asarray(origin)
    return verts, faces


def save_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def extract_ngp_mesh(params, cfg, resolution=256, threshold=20.0,
                     chunk=1 << 18):
    """Density-field isosurface of a trained NGP (test.ipynb equivalent)."""
    import jax.numpy as jnp
    from ..models.ngp import ngp_density
    s = cfg.scale
    xs = np.linspace(-s, s, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    sig = np.empty(grid.shape[0], np.float32)
    for i in range(0, grid.shape[0], chunk):
        sig[i:i + chunk] = np.asarray(
            ngp_density(params, jnp.asarray(grid[i:i + chunk]), cfg))
    field = sig.reshape(resolution, resolution, resolution)
    spacing = 2 * s / (resolution - 1)
    return marching_tetrahedra(field, threshold, origin=(-s, -s, -s),
                               spacing=spacing)
