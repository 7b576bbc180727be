"""Marching-tetrahedra isosurface tests."""

import numpy as np

from arnerf_tpu.utils.mesh import marching_tetrahedra, save_obj


def test_sphere_surface():
    n = 24
    xs = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)  # >0 inside r=0.5
    spacing = 2.0 / (n - 1)
    verts, faces = marching_tetrahedra(field, 0.0, origin=(-1, -1, -1),
                                       spacing=spacing)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    # all vertices near the r=0.5 isosurface
    assert np.abs(r - 0.5).max() < 0.1
    assert faces.max() < len(verts)
    # surface area approximates 4*pi*r^2
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert np.isclose(area, 4 * np.pi * 0.25, rtol=0.15)


def test_empty_field():
    field = np.zeros((5, 5, 5))
    verts, faces = marching_tetrahedra(field, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_save_obj(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
    faces = np.array([[0, 1, 2]])
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"
