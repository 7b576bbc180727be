#!/usr/bin/env python
"""Interactive viewer — the reference's show_gui.py rebuilt on the TPU
renderer. Backend cascade: dearpygui (if installed, like the reference) ->
OpenCV window with mouse orbit -> headless FPS benchmark loop. Launch with
the SAME flags used for training plus --ckpt_path (reference README.md:81).
"""

import time

import numpy as np

from arnerf_tpu.opt import get_opts


class OrbitCamera:
    """Orbit/scale/pan camera (reference show_gui.py:19-51)."""

    def __init__(self, K, img_wh, r):
        self.K = K
        self.W, self.H = img_wh
        self.radius = r
        self.center = np.zeros(3)
        self.rot = np.eye(3)

    @property
    def pose(self):
        from scipy.spatial.transform import Rotation  # noqa: F401
        res = np.eye(4)
        res[2, 3] -= self.radius
        rot = np.eye(4)
        rot[:3, :3] = self.rot
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    def orbit(self, dx, dy):
        from scipy.spatial.transform import Rotation as R
        rotvec_x = self.rot[:, 1] * np.radians(0.05 * dx)
        rotvec_y = self.rot[:, 0] * np.radians(-0.05 * dy)
        self.rot = R.from_rotvec(rotvec_y).as_matrix() @ \
            R.from_rotvec(rotvec_x).as_matrix() @ self.rot

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 1e-4 * self.rot @ np.array([dx, dy, dz])


class NGPGUI:
    """reference show_gui.py:54-191.

    baked=True (or env ARNERF_GUI_BAKED=1) bakes the field into the dense
    SH voxel grid once at startup and renders frames from it
    (rendering_baked.py) — the TPU-native interactive path. LDR only: the
    SH fit assumes bounded radiance, so HDR/exposure modes keep the
    network renderer.
    """

    def __init__(self, hparams, K, img_wh, radius=2.5, baked=None):
        import os
        import jax
        import jax.numpy as jnp
        from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
        from arnerf_tpu.training.ckpt import load_ckpt

        self.hparams = hparams
        rgb_act = 'None' if (hparams.use_exposure or hparams.use_EXR) \
            else 'Sigmoid'
        self.cfg = NGPConfig(scale=hparams.scale, rgb_act=rgb_act,
                             use_raw_hdr=hparams.use_EXR)
        self.params = ngp_init(jax.random.PRNGKey(0), self.cfg)
        self.grid_state = grid_state_init(self.cfg)
        if hparams.ckpt_path:
            self.params, self.grid_state, _, _ = load_ckpt(
                hparams.ckpt_path, params_template=self.params,
                grid_template=self.grid_state)
        self.cam = OrbitCamera(K, img_wh, r=radius)
        self.W, self.H = img_wh
        self.dt = 0
        self.mean_samples = 0
        self.img_mode = 0
        self.exposure = 1.0
        self._jnp = jnp
        if baked is None:
            baked = os.environ.get('ARNERF_GUI_BAKED', '') not in ('', '0')
        self.baked = None
        # baked path: LDR scenes (HDR needs the tonemapper MLPs); multi-
        # cascade scenes bake per-cascade grids and render through the
        # exponential-stepping MC path (rendering_baked.bake_field_mc)
        if baked and self.cfg.rgb_act == 'Sigmoid' and hparams.ckpt_path:
            from arnerf_tpu.rendering_baked import bake_ngp
            t0 = time.time()
            self.baked = bake_ngp(self.params, self.grid_state, self.cfg)
            print(f'baked field in {time.time() - t0:.1f}s')
        self._frame = 0
        self._ckpt_mtime = (os.path.getmtime(hparams.ckpt_path)
                            if hparams.ckpt_path
                            and os.path.exists(hparams.ckpt_path) else 0.0)

    def refresh_bake(self, force=False):
        """Mid-training preview: if the checkpoint file changed on disk
        (a concurrent train.py run saves every epoch / snapshot), reload
        it and INCREMENTALLY re-bake only the changed grid cells
        (rendering_baked.bake_ngp_delta) — seconds instead of the ~57 s
        full bake, which is what makes watching a live training run
        viable on the baked path (the reference GUI renders the live
        field directly, show_gui.py:82-94). No-op on the network path or
        when the file is unchanged (unless force). Returns True when the
        preview advanced."""
        import os
        p = self.hparams.ckpt_path
        if not p or not os.path.exists(p):
            return False
        mtime = os.path.getmtime(p)
        if not force and mtime <= self._ckpt_mtime:
            return False
        from arnerf_tpu.training.ckpt import load_ckpt
        self.params, self.grid_state, _, _ = load_ckpt(
            p, params_template=self.params, grid_template=self.grid_state)
        self._ckpt_mtime = mtime
        if self.baked is not None:
            from arnerf_tpu.rendering_baked import bake_ngp_delta
            t0, stats = time.time(), {}
            # bounded-cost preview: mid-training every cell's density
            # moves each block, so cap each refresh at ~1/16 of the
            # occupied cells (priority by density movement + rolling
            # refresh stripe — bounded staleness, interactive cost)
            import numpy as _np
            occ_cells = int(_np.asarray(self.grid_state.occ_flat,
                                        _np.float32).sum())
            self.baked = bake_ngp_delta(self.params, self.grid_state,
                                        self.cfg, self.baked, stats=stats,
                                        budget_cells=max(1024,
                                                         occ_cells // 16))
            print(f'delta bake {time.time() - t0:.1f}s '
                  f'({stats.get("n_changed", 0)} voxels, '
                  f'{100 * stats.get("frac", 0):.1f}%)')
        return True

    def render_cam(self, cam):
        import jax.numpy as jnp
        from arnerf_tpu.datasets.ray_utils import get_ray_directions, get_rays
        from arnerf_tpu.rendering import render_test
        t = time.time()
        directions = jnp.asarray(get_ray_directions(cam.H, cam.W, cam.K))
        rays_o, rays_d = get_rays(directions,
                                  jnp.asarray(cam.pose[:3], jnp.float32))
        exp_step_factor = 1 / 256 if self.hparams.dataset_name in (
            'colmap', 'nerfpp') else 0.0
        if self.baked is not None:
            import jax
            from arnerf_tpu.rendering_baked import (render_baked,
                                                    baked_frame_display_fn)
            self._frame += 1
            # display mode (round 5): LDR color frames ride the
            # ONE-readback display fn — every bucket dispatched async,
            # background blend + u8 pack + pixel-order gather on DEVICE,
            # one (N, 3) uint8 fetch (VERDICT r4 #6; the f32 multi-fetch
            # frame was ~2/3 tunnel cost). EXR/HDR and depth view keep
            # render_baked's f32 readback (they tonemap / color-map here).
            use_disp = not self.hparams.use_EXR and self.img_mode == 0
            if use_disp:
                dframe = baked_frame_display_fn(
                    self.baked, rays_o, rays_d, T_threshold=1e-2,
                    # interactive spec: color_window 4 (chip sweep r4 —
                    # +2.4x object FPS at -0.34 dB on the trained scene)
                    color_window=4, img_wh=(cam.W, cam.H), white_bg=0.0)
                out = {'rgb': np.asarray(
                    dframe(jax.random.PRNGKey(self._frame)),
                    np.float32) / 255.0,
                    'depth': np.zeros((cam.H * cam.W,), np.float32)}
            else:
                out = render_baked(
                    self.baked, self.grid_state, rays_o, rays_d, self.cfg,
                    key=jax.random.PRNGKey(self._frame),
                    exp_step_factor=exp_step_factor, T_threshold=1e-2,
                    color_window=4, img_wh=(cam.W, cam.H))
            out['total_samples'] = 0
        else:
            kwargs = {}
            if self.cfg.rgb_act == 'None' and not self.cfg.use_raw_hdr:
                kwargs['exposure'] = jnp.full((1, 1), self.exposure)
            out = render_test(
                self.params, self.grid_state, rays_o, rays_d, self.cfg,
                exp_step_factor=exp_step_factor, T_threshold=1e-2,
                max_samples=96, samples_per_round=32, fast=True,
                output_radiance=self.hparams.use_EXR, **kwargs)
        rgb = np.asarray(out['rgb']).reshape(self.H, self.W, 3)
        depth = np.asarray(out['depth']).reshape(self.H, self.W)
        self.dt = time.time() - t
        self.mean_samples = out['total_samples'] / rays_o.shape[0]
        if self.hparams.use_EXR:
            rgb = np.power(rgb / (1 + rgb), 1.0 / 2.2)
        if self.img_mode == 0:
            return np.clip(rgb, 0, 1)
        from train import depth2img
        return depth2img(depth).astype(np.float32) / 255.0


def run_dearpygui(gui):
    """Native dearpygui frontend (reference show_gui.py:110-191)."""
    import dearpygui.dearpygui as dpg
    W, H = gui.W, gui.H
    buffer = np.ones((H, W, 3), dtype=np.float32)
    dpg.create_context()
    dpg.create_viewport(title='arnerf_tpu', width=W, height=H,
                        resizable=False)
    with dpg.texture_registry(show=False):
        dpg.add_raw_texture(W, H, buffer, format=dpg.mvFormat_Float_rgb,
                            tag='_texture')
    with dpg.window(tag='_primary_window', width=W, height=H):
        dpg.add_image('_texture')
    dpg.set_primary_window('_primary_window', True)

    with dpg.window(label='Control', tag='_control_window', width=200,
                    height=150, pos=(10, 10)):
        dpg.add_slider_float(label='exposure', default_value=1.0,
                             min_value=1 / 60, max_value=32, tag='_exposure')
        dpg.add_button(label='show depth', tag='_button_depth',
                       callback=lambda: setattr(gui, 'img_mode',
                                                1 - gui.img_mode))
        dpg.add_separator()
        dpg.add_text('no data', tag='_log_time')
        dpg.add_text('no data', tag='_samples_per_ray')

    def cb_drag(sender, app_data):
        if not dpg.is_item_focused('_primary_window'):
            return
        gui.cam.orbit(app_data[1], app_data[2])

    def cb_wheel(sender, app_data):
        if dpg.is_item_focused('_primary_window'):
            gui.cam.scale(app_data)

    def cb_pan(sender, app_data):
        if dpg.is_item_focused('_primary_window'):
            gui.cam.pan(app_data[1], app_data[2])

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                   callback=cb_drag)
        dpg.add_mouse_wheel_handler(callback=cb_wheel)
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                   callback=cb_pan)
    dpg.setup_dearpygui()
    dpg.show_viewport()
    while dpg.is_dearpygui_running():
        gui.exposure = dpg.get_value('_exposure')
        gui.refresh_bake()   # live-training preview: delta-bake on ckpt change
        buffer[:] = gui.render_cam(gui.cam)
        dpg.set_value('_texture', buffer)
        dpg.set_value('_log_time',
                      f'Render time: {1000 * gui.dt:.2f} ms '
                      f'FPS: {1 / max(gui.dt, 1e-9):.1f}')
        dpg.set_value('_samples_per_ray',
                      f'samples/ray: {gui.mean_samples:.2f}')
        dpg.render_dearpygui_frame()
    dpg.destroy_context()


def run_opencv(gui):
    """Fallback frontend: cv2 window with mouse orbit/zoom."""
    import cv2
    state = {'drag': None}

    def on_mouse(event, x, y, flags, _):
        if event == cv2.EVENT_LBUTTONDOWN:
            state['drag'] = (x, y)
        elif event == cv2.EVENT_LBUTTONUP:
            state['drag'] = None
        elif event == cv2.EVENT_MOUSEMOVE and state['drag']:
            dx, dy = x - state['drag'][0], y - state['drag'][1]
            gui.cam.orbit(dx * 10, dy * 10)
            state['drag'] = (x, y)
        elif event == cv2.EVENT_MOUSEWHEEL:
            gui.cam.scale(1 if flags > 0 else -1)

    cv2.namedWindow('arnerf_tpu')
    cv2.setMouseCallback('arnerf_tpu', on_mouse)
    while True:
        rgb = gui.render_cam(gui.cam)
        hud = f'{1 / max(gui.dt, 1e-9):.1f} FPS  ' \
              f'{gui.mean_samples:.1f} samples/ray'
        img = cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.putText(img, hud, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 0), 1)
        cv2.imshow('arnerf_tpu', img)
        k = cv2.waitKey(1)
        if k in (27, ord('q')):
            break
        if k == ord('d'):
            gui.img_mode = 1 - gui.img_mode
        if k == ord('r'):
            gui.refresh_bake(force=True)
        gui.refresh_bake()   # live-training preview (ckpt mtime poll)


def run_headless(gui, n_frames=30):
    """No display: orbit the camera and report FPS."""
    times = []
    for i in range(n_frames):
        gui.cam.orbit(30, 0)
        gui.render_cam(gui.cam)
        times.append(gui.dt)
        if i == 0:
            print(f'first frame (compile): {gui.dt:.2f}s')
    t = np.mean(times[2:])
    print(f'headless orbit: {1 / t:.2f} FPS at {gui.W}x{gui.H}, '
          f'{gui.mean_samples:.1f} samples/ray')


if __name__ == '__main__':
    hparams = get_opts()
    from arnerf_tpu.datasets import dataset_dict
    kwargs = {'root_dir': hparams.root_dir,
              'downsample': hparams.downsample, 'read_meta': False}
    dataset = dataset_dict[hparams.dataset_name](**kwargs)
    l = hparams.low_resolution
    K = np.asarray(dataset.K, np.float32).copy()
    K[:2] /= l
    img_wh = (int(dataset.img_wh[0] / l), int(dataset.img_wh[1] / l))
    gui = NGPGUI(hparams, K, img_wh)
    try:
        import dearpygui.dearpygui  # noqa: F401
        run_dearpygui(gui)
    except ImportError:
        import os
        if os.environ.get('DISPLAY'):
            run_opencv(gui)
        else:
            run_headless(gui)
