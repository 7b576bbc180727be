"""COLMAP poses + EXR HDR images (fork-added dataset).
Rebuilt from reference datasets/colmap_exr.py: filename remap
train_r_15_3.png -> train_hdr/hdr_015.exr, every-8th test split."""

import os

import numpy as np

from .ray_utils import create_spheric_poses, center_poses
from .color_utils import read_image
from .colmap_utils import read_images_binary, read_points3d_binary
from .colmap import ColmapDataset


class ColmapEXRDataset(ColmapDataset):
    def remap_name(self, img_name):
        # train_r_15_3.png -> train_hdr/hdr_015.exr (colmap_exr.py:52-58)
        sp = img_name.split('_')
        return '{}_hdr/hdr_{:0>3d}.exr'.format(sp[0], int(sp[2]))

    def read_meta(self, split, **kwargs):
        imdata = read_images_binary(
            os.path.join(self.root_dir, 'sparse/0/images.bin'))
        img_names = [self.remap_name(imdata[k].name) for k in imdata]
        perm = np.argsort(img_names)
        img_paths = [os.path.join(self.root_dir, name)
                     for name in sorted(img_names)]
        bottom = np.array([[0, 0, 0, 1.0]])
        w2c = np.stack([
            np.concatenate([np.concatenate(
                [imdata[k].qvec2rotmat(), imdata[k].tvec.reshape(3, 1)], 1),
                bottom], 0) for k in imdata], 0)
        poses = np.linalg.inv(w2c)[perm, :3]

        pts3d_d = read_points3d_binary(
            os.path.join(self.root_dir, 'sparse/0/points3D.bin'))
        pts3d = np.array([pts3d_d[k].xyz for k in pts3d_d])
        self.poses, self.pts3d, pose_avg = center_poses(poses, pts3d)
        scale = np.linalg.norm(self.poses[..., 3], axis=-1).min()
        self.poses[..., 3] /= scale
        self.pts3d /= scale
        self.blender_trans = np.eye(4)
        self.blender_trans[:3, :] = pose_avg
        self.blender_scale = scale

        if split == 'test_traj':
            self.poses = create_spheric_poses(
                1.2, self.poses[:, 1, 3].mean()).astype(np.float32)
            return

        if split == 'train':
            keep = [i for i in range(len(img_paths)) if i % 8 != 0]
        elif split == 'test':
            keep = [i for i in range(len(img_paths)) if i % 8 == 0]
        else:
            keep = list(range(len(img_paths)))
        img_paths = [img_paths[i] for i in keep]
        self.poses = np.asarray(self.poses[keep], np.float32)

        rays = [read_image(p, self.img_wh, blend_a=False, exr_file=True)
                for p in img_paths]
        if rays:
            self.rays = np.stack(rays).astype(np.float32)
