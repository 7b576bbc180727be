"""show_gui.py camera math + headless render-cam smoke test
(reference show_gui.py:19-108)."""

import numpy as np


def test_orbit_camera_math():
    import sys
    sys.path.insert(0, "/root/repo")
    from show_gui import OrbitCamera
    K = np.asarray([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    cam = OrbitCamera(K, (128, 128), r=2.5)
    p0 = cam.pose
    assert p0.shape == (4, 4)
    np.testing.assert_allclose(p0[:3, :3], np.eye(3))
    np.testing.assert_allclose(p0[:3, 3], [0, 0, -2.5])
    cam.orbit(100, 0)
    p1 = cam.pose
    assert not np.allclose(p1[:3, :3], np.eye(3))
    # rotations stay orthonormal
    np.testing.assert_allclose(p1[:3, :3] @ p1[:3, :3].T, np.eye(3),
                               atol=1e-10)
    cam.scale(1)
    assert np.linalg.norm(cam.pose[:3, 3]) < 2.5  # zoomed in
    cam.pan(10, -5)
    assert not np.allclose(cam.center, 0)


def test_ngp_gui_render_cam_headless():
    import sys
    sys.path.insert(0, "/root/repo")
    from show_gui import NGPGUI, OrbitCamera
    from arnerf_tpu.opt import get_opts
    h = get_opts(["--dataset_name", "synthetic", "--scale", "0.5"])
    K = np.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    gui = NGPGUI(h, K, (64, 64), radius=2.5)
    rgb = gui.render_cam(gui.cam)
    assert rgb.shape == (64, 64, 3)
    assert np.isfinite(rgb).all() and (rgb >= 0).all() and (rgb <= 1).all()
    assert gui.dt > 0 and gui.mean_samples >= 0


def test_ngp_gui_baked_render_path():
    """GUI wired to the baked renderer (rendering_baked.py)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from show_gui import NGPGUI
    from arnerf_tpu.opt import get_opts
    from arnerf_tpu.rendering_baked import bake_ngp
    h = get_opts(["--dataset_name", "synthetic", "--scale", "0.5"])
    K = np.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    gui = NGPGUI(h, K, (64, 64), radius=2.5)
    # no ckpt -> bake from the (random-init) params at a tiny resolution
    gui.baked = bake_ngp(gui.params, gui.grid_state, gui.cfg, resolution=16,
                         n_dirs=8, dtype=np.float32)
    rgb = gui.render_cam(gui.cam)
    assert rgb.shape == (64, 64, 3)
    assert np.isfinite(rgb).all()
