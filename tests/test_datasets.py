"""Data-layer tests: loaders against synthesized on-disk fixtures."""

import json
import os
import struct

import numpy as np
import pytest

from arnerf_tpu.datasets.ray_utils import (
    get_ray_directions, get_rays, axisangle_to_R, center_poses,
    create_spheric_poses)


def test_ray_directions_pixel_centers():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    dirs = get_ray_directions(48, 64, K)
    assert dirs.shape == (48 * 64, 3)
    # center pixel (u=31, v=23): direction ((31-32+.5)/100, (23-24+.5)/100, 1)
    d = dirs.reshape(48, 64, 3)[23, 31]
    np.testing.assert_allclose(d, [-0.005, -0.005, 1.0], atol=1e-6)


def test_get_rays_batched_matches_single():
    import jax.numpy as jnp
    K = np.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])
    dirs = jnp.asarray(get_ray_directions(16, 16, K)[:5])
    pose = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)),
                       dtype=jnp.float32)
    o1, d1 = get_rays(dirs, pose)
    poses = jnp.broadcast_to(pose, (5, 3, 4))
    o2, d2 = get_rays(dirs, poses)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_axisangle_to_R_small_angle_and_90deg():
    import jax.numpy as jnp
    v = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(axisangle_to_R(v))[0]
    # 90 deg about z: x -> y
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0],
                               atol=1e-5)
    R0 = np.asarray(axisangle_to_R(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-5)


def test_center_poses_centers_the_rig():
    rng = np.random.default_rng(1)
    poses = np.stack([np.concatenate([np.eye(3), rng.normal(size=(3, 1)) +
                                      np.array([[5], [0], [0]])], 1)
                      for _ in range(10)])
    centered, avg = center_poses(poses)
    assert np.abs(centered[..., 3].mean(0)).max() < 1.0


def _write_blender_scene(root, n=3, wh=16):
    os.makedirs(root, exist_ok=True)
    import imageio.v2 as imageio
    frames = []
    rng = np.random.default_rng(0)
    for i in range(n):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3.0 + i * 0.1]
        frames.append({"file_path": f"./r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = (rng.random((wh, wh, 4)) * 255).astype(np.uint8)
        imageio.imsave(os.path.join(root, f"r_{i}.png"), img)
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


def test_nerf_blender_loader(tmp_path):
    root = str(tmp_path / "lego")
    _write_blender_scene(root)
    from arnerf_tpu.datasets.nerf import NeRFDataset
    ds = NeRFDataset(root, split="train", downsample=16 / 800)
    assert ds.img_wh == (16, 16)
    assert ds.poses.shape == (3, 3, 4)
    assert ds.rays.shape == (3, 256, 3)
    # poses normalized to radius 1.5
    norms = np.linalg.norm(ds.poses[:, :, 3], axis=1)
    np.testing.assert_allclose(norms, 1.5, atol=1e-5)
    batch = ds.sample_batch(np.random.default_rng(0))
    assert batch["rgb"].shape == (ds.batch_size, 3)


def _write_nsvf_scene(root, n=4, wh=16):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "pose"), exist_ok=True)
    import imageio.v2 as imageio
    np.savetxt(os.path.join(root, "bbox.txt"),
               np.array([-1, -1, -1, 1, 1, 1, 0.1]))
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write("1111.1 0 400 0\n0 1111.1 400 0\n0 0 1 0\n0 0 0 1\n")
    rng = np.random.default_rng(0)
    for i in range(n):
        prefix = "0_" if i < n - 1 else "2_"
        img = (rng.random((wh, wh, 3)) * 255).astype(np.uint8)
        imageio.imsave(os.path.join(root, "rgb", f"{prefix}{i:04d}.png"), img)
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, 2.5 + 0.1 * i]
        np.savetxt(os.path.join(root, "pose", f"{prefix}{i:04d}.txt"), pose)


def test_nsvf_loader(tmp_path):
    root = str(tmp_path / "Synthetic_NSVF" / "Robot")
    _write_nsvf_scene(root)
    from arnerf_tpu.datasets.nsvf import NSVFDataset
    ds = NSVFDataset(root, split="train", downsample=16 / 800)
    assert ds.img_wh == (16, 16)
    assert len(ds.poses) == 3          # only the 0_ prefixed images
    assert ds.rays.shape[0] == 3
    # poses bounded into [-0.5, 0.5]
    assert np.abs(ds.poses[:, :, 3]).max() <= 1.5
    ds_test = NSVFDataset(root, split="test", downsample=16 / 800)
    assert len(ds_test.poses) == 1     # the 2_ prefixed image


def _write_colmap_model(sparse_dir, n=9):
    os.makedirs(sparse_dir, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 32, 24))  # PINHOLE id=1
        f.write(struct.pack("<dddd", 30.0, 30.0, 16.0, 12.0))
    # images.bin
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<idddddddi", i + 1, 1.0, 0.0, 0.0, 0.0,
                                0.1 * i, 0.0, 2.0, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    # points3D.bin
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 20))
        for i in range(20):
            xyz = rng.normal(size=3)
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz, 100, 100, 100, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_colmap_utils_roundtrip(tmp_path):
    sparse = str(tmp_path / "scene" / "sparse" / "0")
    _write_colmap_model(sparse)
    from arnerf_tpu.datasets.colmap_utils import (
        read_cameras_binary, read_images_binary, read_points3d_binary,
        qvec2rotmat)
    cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 32
    ims = read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(ims) == 9
    assert ims[1].name == "img_000.png"
    np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3))
    pts = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    assert len(pts) == 20


def test_colmap_dataset(tmp_path):
    root = str(tmp_path / "scene")
    _write_colmap_model(os.path.join(root, "sparse", "0"))
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    for i in range(9):
        imageio.imsave(os.path.join(root, "images", f"img_{i:03d}.png"),
                       (rng.random((24, 32, 3)) * 255).astype(np.uint8))
    from arnerf_tpu.datasets.colmap import ColmapDataset
    ds = ColmapDataset(root, split="train")
    assert ds.img_wh == (32, 24)
    assert len(ds.poses) == 7          # every 8th image held out (idx 0, 8)
    ds_t = ColmapDataset(root, split="test")
    assert len(ds_t.poses) == 2
    assert ds.rays.shape == (7, 32 * 24, 3)


def test_registry_has_all_reference_datasets():
    from arnerf_tpu.datasets import dataset_dict
    for name in ("nerf", "nsvf", "colmap", "colmap_exr", "colmap_real_exr",
                 "myblender", "nerfpp", "rtmv"):
        assert name in dataset_dict
