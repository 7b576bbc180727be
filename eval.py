#!/usr/bin/env python
"""Offline evaluation tool — the reference's test.ipynb as a CLI: test-set
PSNR/SSIM + render FPS, occupancy-grid visualization, and isosurface mesh
extraction. Run with the training flags plus --ckpt_path.

  python eval.py --dataset_name nerf --root_dir ... --ckpt_path ckpt.npz \
      [--mesh out.obj] [--grid_vis grid.png] [--cam_vis cams.png]

--cam_vis is the notebook's plotly camera/ray cell (reference test.ipynb,
its last cell) as a dependency-free orthographic plot: camera centers and
central view rays projected onto the xy/xz/yz planes with the scene AABB.
"""

import sys
import time

import numpy as np

from arnerf_tpu.opt import get_opts


def main():
    argv = sys.argv[1:]
    mesh_path = grid_vis = None
    if '--mesh' in argv:
        i = argv.index('--mesh')
        mesh_path = argv[i + 1]
        del argv[i:i + 2]
    if '--grid_vis' in argv:
        i = argv.index('--grid_vis')
        grid_vis = argv[i + 1]
        del argv[i:i + 2]
    cam_vis = None
    if '--cam_vis' in argv:
        i = argv.index('--cam_vis')
        cam_vis = argv[i + 1]
        del argv[i:i + 2]
    hparams = get_opts(argv)

    import jax
    import jax.numpy as jnp
    from arnerf_tpu.datasets import dataset_dict
    from arnerf_tpu.datasets.ray_utils import get_rays
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.training.ckpt import load_ckpt
    from arnerf_tpu.training.metrics import psnr as psnr_fn, ssim as ssim_fn
    from arnerf_tpu.rendering import render_test

    kwargs = {'root_dir': hparams.root_dir, 'downsample': hparams.downsample}
    test_ds = dataset_dict[hparams.dataset_name](split='test', **kwargs)

    rgb_act = 'None' if (hparams.use_exposure or hparams.use_EXR) \
        else 'Sigmoid'
    cfg = NGPConfig(scale=hparams.scale, rgb_act=rgb_act,
                    use_raw_hdr=hparams.use_EXR)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    grid_state = grid_state_init(cfg)
    params, grid_state, _, _ = load_ckpt(
        hparams.ckpt_path, params_template=params,
        grid_template=grid_state)

    exp_step_factor = 1 / 256 if hparams.scale > 0.5 else 0.0
    w, h = test_ds.img_wh
    dirs = jnp.asarray(test_ds.directions)

    # ARNERF_EVAL_BAKED=1: measure the baked-field fast path instead of the
    # network renderer (LDR only; rendering_baked.py)
    import os
    baked = None
    # LDR scenes only (HDR needs the tonemapper MLPs); multi-cascade
    # scenes bake per-cascade grids (rendering_baked.bake_field_mc)
    if os.environ.get('ARNERF_EVAL_BAKED', '') not in ('', '0') \
            and rgb_act == 'Sigmoid':
        from arnerf_tpu.rendering_baked import bake_ngp, render_baked
        t0 = time.time()
        baked = bake_ngp(params, grid_state, cfg)
        print(f'baked field in {time.time() - t0:.1f}s')

    # FPS + PSNR loop (test.ipynb's measurement cell)
    psnrs, ssims, times = [], [], []
    for i in range(len(test_ds.poses)):
        rays_o, rays_d = get_rays(dirs, jnp.asarray(test_ds.poses[i]))
        t0 = time.time()
        if baked is not None:
            out = render_baked(baked, grid_state, rays_o, rays_d, cfg,
                               key=jax.random.PRNGKey(i),
                               T_threshold=1e-2, img_wh=(w, h))
        else:
            out = render_test(params, grid_state, rays_o, rays_d, cfg,
                              exp_step_factor=exp_step_factor,
                              T_threshold=1e-2, max_samples=96, fast=True)
        jax.block_until_ready(out['rgb'])
        np.asarray(out['rgb'][:1])
        times.append(time.time() - t0)
        pred = np.asarray(out['rgb']).reshape(h, w, 3)
        if exp_step_factor == 0.0:
            pred = pred + (1 - np.asarray(out['opacity']).reshape(h, w, 1))
        pred = np.clip(pred, 0, 1)
        if len(test_ds.rays) > 0:
            gt = np.asarray(test_ds.rays[i][:, :3]).reshape(h, w, 3)
            psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt))))
            ssims.append(float(ssim_fn(jnp.asarray(pred), jnp.asarray(gt))))
    fps = 1.0 / np.mean(times[1:]) if len(times) > 1 else 1.0 / times[0]
    msg = f'FPS: {fps:.2f} ({w}x{h})'
    if psnrs:
        msg += f'  PSNR: {np.mean(psnrs):.3f}  SSIM: {np.mean(ssims):.4f}'
    print(msg)

    if grid_vis:
        import imageio.v2 as imageio
        G = cfg.grid_size
        occ = np.asarray(grid_state.occ_flat).reshape(cfg.cascades, G, G, G)
        # middle slices of each cascade, tiled horizontally
        tiles = [occ[c, :, :, G // 2] * 255 for c in range(cfg.cascades)]
        imageio.imsave(grid_vis,
                       np.concatenate(tiles, axis=1).astype(np.uint8))
        print(f'occupancy slices -> {grid_vis}')

    if cam_vis:
        import imageio.v2 as imageio
        S, half = 320, float(hparams.scale)
        poses = np.asarray(test_ds.poses)                  # (n, 3, 4)
        cam_o = poses[:, :, 3]
        cam_d = -poses[:, :, 2]                            # central ray
        cam_d /= np.linalg.norm(cam_d, axis=1, keepdims=True) + 1e-12
        lim = max(half, float(np.abs(cam_o).max())) * 1.15
        canvas = np.full((S, 3 * S, 3), 255, np.uint8)

        def px(v):      # world coord -> pixel
            return np.clip(((v + lim) / (2 * lim) * (S - 1)).astype(int),
                           0, S - 1)

        for p, (a, b) in enumerate(((0, 1), (0, 2), (1, 2))):
            x0 = p * S
            # scene AABB square
            lo, hi = px(np.float64(-half)), px(np.float64(half))
            canvas[lo:hi + 1, [x0 + lo, x0 + hi]] = (200, 200, 200)
            canvas[[lo, hi], x0 + lo:x0 + hi + 1] = (200, 200, 200)
            # central view rays (o -> o + 0.6 * lim * d) then camera dots
            for o, d in zip(cam_o, cam_d):
                t = np.linspace(0, 0.6 * lim, 64)
                seg = o[None, :] + t[:, None] * d[None, :]
                canvas[px(seg[:, b]), x0 + px(seg[:, a])] = (120, 170, 255)
            yy, xx = px(cam_o[:, b]), px(cam_o[:, a])
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    canvas[np.clip(yy + dy, 0, S - 1),
                           x0 + np.clip(xx + dx, 0, S - 1)] = (220, 60, 40)
        imageio.imsave(cam_vis, canvas)
        print(f'camera/ray plot (xy|xz|yz) -> {cam_vis}')

    if mesh_path:
        from arnerf_tpu.utils.mesh import extract_ngp_mesh, save_obj
        verts, faces = extract_ngp_mesh(params, cfg, resolution=256,
                                        threshold=20.0)
        save_obj(mesh_path, verts, faces)
        print(f'mesh: {len(verts)} verts, {len(faces)} faces -> {mesh_path}')


if __name__ == '__main__':
    main()
