"""Loader-to-convergence proof on the reference's Blender format
(VERDICT r1 missing #5): render the procedural analytic scene into a real
`transforms_{train,test}.json` + PNG fixture, then drive the actual
train.py CLI with --dataset_name nerf through training + validation.

This closes the gap between "the nerf loader parses fixtures" and "the nerf
loader feeds a training run to convergence" without any external dataset.
Reference: datasets/nerf.py + README.md quickstart."""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from arnerf_tpu.datasets.synthetic import render_analytic
from arnerf_tpu.datasets.ray_utils import (get_ray_directions, get_rays,
                                           look_at_pose)

SCALE = 0.5
W = H = 64                    # nerf loader: w = h = int(800 * downsample)
DOWNSAMPLE = W / 800.0
FOV_DEG = 45.0


def _make_fixture(root):
    """Blender-format scene of the analytic field: 20 train + 2 test views."""
    import imageio.v2 as imageio
    cax = float(np.deg2rad(FOV_DEG))
    f = 0.5 * W / np.tan(0.5 * cax)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))

    rng = np.random.default_rng(3)
    for split, n, phase in (("train", 20, 0.0), ("test", 2, 0.5)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            th = 2 * np.pi * (i + phase) / n
            # cameras MUST sit on a sphere (constant ||t||): the reference
            # loader rescales each pose by its own norm/1.5
            # (reference datasets/nerf.py:70-73), which is only globally
            # consistent when all cameras share one radius — true for real
            # Blender captures, and required here
            phi = rng.uniform(-0.35, 0.08)        # elevation angle
            # R = pose_radius_scale exactly, so the loader's per-frame
            # ||t||/1.5 rescale (reference datasets/nerf.py:70-73) is the
            # identity and train-time geometry matches the rendered GT scale
            R = 1.5
            eye = R * np.array([np.cos(th) * np.cos(phi), np.sin(phi),
                                np.sin(th) * np.cos(phi)])
            c2w = look_at_pose(eye)               # [right down front]
            ro, rd = get_rays(dirs, jnp.asarray(c2w))
            rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            rgb, _, _ = render_analytic(ro, rd, SCALE, n_samples=512)
            img = np.clip(np.asarray(rgb), 0, 1).reshape(H, W, 3)
            name = f"r_{i}"
            imageio.imsave(os.path.join(root, split, f"{name}.png"),
                           (img * 255 + 0.5).astype(np.uint8))
            # loader convention: json stores [right up back] (c2w[:,1:3]*=-1)
            blender = c2w.copy()
            blender[:, 1:3] *= -1
            mat = np.eye(4, dtype=np.float64)
            mat[:3, :4] = blender
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": mat.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fj:
            json.dump({"camera_angle_x": cax, "frames": frames}, fj)


def test_nerf_loader_reads_fixture(tmp_path):
    """Fast check: geometry survives the loader's pose normalization."""
    _make_fixture(str(tmp_path))
    from arnerf_tpu.datasets.nerf import NeRFDataset
    ds = NeRFDataset(str(tmp_path), split="train", downsample=DOWNSAMPLE)
    assert ds.img_wh == (W, H)
    assert ds.rays.shape == (20, W * H, 3)
    assert ds.poses.shape == (20, 3, 4)
    # loader rescales camera radius to pose_radius_scale=1.5 (from 1.35)
    r = np.linalg.norm(ds.poses[:, :, 3], axis=1)
    assert np.allclose(r, 1.5, atol=0.01), r
    # images decoded to [0,1] with real content
    assert 0.2 < float(ds.rays.mean()) < 1.0


@pytest.mark.slow
def test_train_cli_on_blender_fixture(tmp_path):
    """The real train.py CLI on the real nerf loader, to convergence."""
    _make_fixture(str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cmd = [sys.executable, os.path.join(repo, "train.py"),
           "--dataset_name", "nerf", "--root_dir", str(tmp_path),
           "--downsample", str(DOWNSAMPLE), "--exp_name", "fixture",
           "--num_epochs", "1", "--batch_size", "1024", "--scale", "0.5"]
    r = subprocess.run(cmd, cwd=str(run_dir), env=env, capture_output=True,
                       text=True, timeout=3000)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    m = re.search(r"test/psnr=([0-9.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    psnr = float(m.group(1))
    # in-process probe at this exact spec reached val 30.1 dB; 28 leaves
    # margin for RNG while still proving loader-to-convergence
    assert psnr > 28.0, f"fixture e2e test PSNR too low: {psnr}"
    assert (run_dir / "ckpts/nerf/fixture/epoch=0.npz").exists()
