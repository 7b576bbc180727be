"""NSVF loader-to-convergence proof: render the procedural analytic scene
into a real NSVF-format fixture (bbox.txt / intrinsics.txt / pose/ / rgb/
with split prefixes), then drive the actual train.py CLI with
--dataset_name nsvf through training + validation.

Companion to tests/test_blender_fixture_e2e.py — together they prove two
reference data formats end-to-end without external datasets.
Reference: datasets/nsvf.py."""

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
W = H = 64                    # loader: w = h = int(800 * downsample)
DOWNSAMPLE = W / 800.0
FOV_DEG = 45.0


def _make_fixture(root):
    """NSVF 'Synthetic' scene of the analytic field: 20 train + 2 test."""
    import imageio.v2 as imageio
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(FOV_DEG))
    f = f800 * DOWNSAMPLE
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    dirs = jnp.asarray(get_ray_directions(H, W, K))

    os.makedirs(os.path.join(root, "pose"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    # bbox shift=(0,0,0), box scale = 0.5*1.05; poses divide by 1.05 — put
    # cameras at 1.5*1.05 so the loader-frame radius is 1.5
    with open(os.path.join(root, "bbox.txt"), "w") as fb:
        fb.write("-0.5 -0.5 -0.5 0.5 0.5 0.5 0.05\n")
    with open(os.path.join(root, "intrinsics.txt"), "w") as fi:
        fi.write(f"{f800} 0 400 0\n0 {f800} 400 0\n0 0 1 0\n0 0 0 1\n")

    rng = np.random.default_rng(3)
    for prefix, n, phase in (("0", 20, 0.0), ("2", 2, 0.5)):
        for i in range(n):
            th = 2 * np.pi * (i + phase) / n
            phi = rng.uniform(-0.35, 0.08)
            R = 1.5 * 1.05
            eye = R * np.array([np.cos(th) * np.cos(phi), np.sin(phi),
                                np.sin(th) * np.cos(phi)])
            c2w = look_at_pose(eye)               # [right down front]
            # GT must be rendered at the LOADER-frame geometry (poses are
            # divided by the padded box scale): scale eye consistently
            ro, rd = get_rays(dirs, jnp.asarray(c2w))
            rd_n = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            # render from the scaled-down camera (scene seen 1.05x larger
            # is what training reconstructs; GT must match that frame)
            ro_l = ro / 1.05
            rgb, _, _ = render_analytic(ro_l, rd_n, SCALE, n_samples=512)
            img = np.clip(np.asarray(rgb), 0, 1).reshape(H, W, 3)
            name = f"{prefix}_{i:03d}"
            imageio.imsave(os.path.join(root, "rgb", f"{name}.png"),
                           (img * 255 + 0.5).astype(np.uint8))
            mat = np.eye(4)
            mat[:3, :4] = np.asarray(c2w, np.float64)
            np.savetxt(os.path.join(root, "pose", f"{name}.txt"), mat)


def test_nsvf_loader_reads_fixture(tmp_path):
    root = str(tmp_path / "Synthetic_fixture")
    _make_fixture(root)
    from arnerf_tpu.datasets.nsvf import NSVFDataset
    ds = NSVFDataset(root, split="train", downsample=DOWNSAMPLE)
    assert ds.img_wh == (W, H)
    assert ds.rays.shape == (20, W * H, 3)
    assert ds.poses.shape == (20, 3, 4)
    r = np.linalg.norm(ds.poses[:, :, 3], axis=1)
    assert np.allclose(r, 1.5, atol=0.01), r
    ds_t = NSVFDataset(root, split="test", downsample=DOWNSAMPLE)
    assert ds_t.rays.shape == (2, W * H, 3)


@pytest.mark.slow
def test_train_cli_on_nsvf_fixture(tmp_path):
    root = str(tmp_path / "Synthetic_fixture")
    _make_fixture(root)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cmd = [sys.executable, os.path.join(repo, "train.py"),
           "--dataset_name", "nsvf", "--root_dir", root,
           "--downsample", str(DOWNSAMPLE), "--exp_name", "nsvf_fix",
           "--num_epochs", "1", "--batch_size", "1024", "--scale", "0.5"]
    r = subprocess.run(cmd, cwd=str(run_dir), env=env, capture_output=True,
                       text=True, timeout=3000)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    m = re.search(r"test/psnr=([0-9.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    psnr = float(m.group(1))
    assert psnr > 28.0, f"nsvf fixture e2e test PSNR too low: {psnr}"
