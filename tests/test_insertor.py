"""AR insertor end-to-end smoke tests (offline prep + relight/composite
paths), on a tiny synthetic scene — no TCP, no viewer."""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.insert.main import NGPInsertor, SH_ORDER


def make_hparams(tmp_path, **over):
    hp = types.SimpleNamespace(
        root_dir="", dataset_name="synthetic", split="train", downsample=1.0,
        scale=0.5, use_exposure=False, use_EXR=False,
        distortion_loss_w=0, depth_loss_w=0, loss_func="raw",
        batch_size=1024, ray_sampling_strategy="all_images", num_epochs=1,
        num_gpus=1, lr=1e-2, optimize_ext=False, random_bg=False,
        val_batch_size=2 ** 20, eval_lpips=False, val_only=False,
        no_save_test=True, exp_name="t_insert", ckpt_path=None,
        weight_path=None, low_resolution=1.0, max_pc_pts_num=int(1e4),
        no_global_SH=False, train_SH_HDR_mapping=False,
        gen_probe_HDR_mapping=False, render_HDR_mapping=False)
    for k, v in over.items():
        setattr(hp, k, v)
    return hp


@pytest.fixture(scope="module")
def insertor(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("insert")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        hp = make_hparams(tmp)
        # monkeypatch the dataset to a tiny procedural config
        from arnerf_tpu.datasets.synthetic import SyntheticConfig
        import arnerf_tpu.datasets as dsets
        orig = dsets.dataset_dict["synthetic"]
        dsets.dataset_dict["synthetic"] = lambda **kw: orig(
            config=SyntheticConfig(img_wh=(24, 24), n_train=3, n_test=1,
                                   gt_samples=32), **kw)
        ins = NGPInsertor(hp)
        dsets.dataset_dict["synthetic"] = orig
        # give the model a non-trivial occupancy (sphere) so rays hit things
        from arnerf_tpu.models import grid_state_init
        gs = grid_state_init(ins.cfg)
        G = ins.cfg.grid_size
        g = (np.arange(G) + 0.5) / G * 2 - 1
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        occ = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) < 0.6).astype(np.uint8)
        ins.grid_state = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))
        yield ins
    finally:
        os.chdir(cwd)


def test_render_pose_shapes(insertor):
    rgb, depth, _, _ = insertor.render_pose(insertor.dataset.poses[0])
    assert rgb.shape == (insertor.H, insertor.W, 3)
    assert depth.shape == (insertor.H, insertor.W)
    assert np.isfinite(rgb).all()


def test_generate_surface_and_point_cloud(insertor):
    insertor.generate_surface(save=True)
    assert insertor.spts.shape == (3, insertor.H, insertor.W, 3)
    assert insertor.normals.shape == (3, insertor.H, insertor.W, 3)
    # normals are unit-ish where defined
    nn = np.linalg.norm(insertor.normals.reshape(-1, 3), axis=1)
    assert np.nanmax(nn) < 1.5
    insertor.generate_point_cloud()
    assert os.path.exists(os.path.join(insertor.gen_path, "pc.ply"))
    assert os.path.exists(os.path.join(insertor.gen_path, "btrans.npy"))


def test_generate_probe_sh_and_sg(insertor):
    pt = jnp.asarray([0.0, 0.0, 0.0])
    sh = insertor.generate_probe(pt, sh_probe=True)
    assert sh.shape == (1, SH_ORDER ** 2, 3)
    env = insertor.generate_probe(pt, return_envmap=True)
    assert env.shape == (128, 128, 3)
    insertor.env_opt.n_iter = 5  # keep the test fast
    sg = insertor.generate_probe(pt, sh_probe=False)
    assert sg.shape[-1] == 7


def test_generate_probe_baked_matches_network(insertor):
    """ARNERF_INSERT_BAKED routes probe rays through the baked SH grid
    (the serving hot loop: 1-6k network renders per object move otherwise).
    The baked probe must agree with the network probe — same field, two
    quadratures (32^3 stochastic voxel bake vs 96-sample marching)."""
    pt = jnp.asarray([0.0, 0.0, 0.0])
    sh_net = np.asarray(insertor.generate_probe(pt, sh_probe=True))
    os.environ["ARNERF_INSERT_BAKE_RES"] = "32"
    insertor.use_baked = True
    try:
        sh_baked = np.asarray(insertor.generate_probe(pt, sh_probe=True))
        # generate_probe now routes through the FUSED one-dispatch serving
        # path; pin it against the bucketed baked path explicitly (same
        # field + quadrature, only stochastic jitter keys differ)
        ray_dirs = insertor.sh_ray_dirs.reshape(-1, 3)
        rays_o = jnp.broadcast_to(pt[None], ray_dirs.shape)
        rgb_legacy, _ = insertor._probe_render(
            rays_o, ray_dirs, sh_bkg=insertor.global_sh[0])
        from arnerf_tpu.insert.sh_math import get_sh_coeff
        sh_legacy = np.asarray(get_sh_coeff(ray_dirs[None],
                                            rgb_legacy[None]))
        assert np.allclose(sh_legacy, sh_baked, atol=0.05), \
            np.abs(sh_legacy - sh_baked).max()
        # precompute probes (rgb + transmittance SH, no background) too
        pts = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
        rgb_sh, opc_sh = insertor.generate_sh_probes_for_precompute(pts)
        # dirty-rect serving frame on the baked path (mesh-depth far clamp
        # + im_bkg blend)
        H = W = 8
        bbox = [[4, 4], [4 + H, 4 + W]]
        rng = np.random.default_rng(1)
        normals = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        pose = jnp.asarray(insertor.dataset.poses[0])
        insertor.last_rgb = insertor.last_depth = None
        out = insertor.render_insert_object(
            normals, jnp.full((H, W), 1e-4, jnp.float32), pose, sh_baked,
            full_return=False, use_sg_base=False, sg_use_self_shadow=False,
            model_bbox=bbox, model_bbox_last=None)
        assert out.shape == (insertor.H, insertor.W, 3)
        assert np.isfinite(out).all()
        # a mesh depth this close to the camera clamps the scene march to
        # an empty window: the composite must return the object render
        # (im_bkg) exactly inside the bbox
        lr = np.asarray(insertor.last_depth)[4:4 + H, 4:4 + W, 0]
        assert np.allclose(lr, 0.0, atol=1e-5), lr.max()
        insertor.last_rgb = insertor.last_depth = None
    finally:
        insertor.use_baked = False
        insertor._baked = None
        del os.environ["ARNERF_INSERT_BAKE_RES"]
    assert sh_baked.shape == sh_net.shape
    assert np.isfinite(sh_baked).all()
    # DC term = mean radiance over the sphere: the two quadratures must
    # agree on it (the fixture field is near-homogeneous, so the dominant
    # error is the coarse 32^3 bake discretization)
    assert np.allclose(sh_baked[0, 0], sh_net[0, 0], atol=0.25), \
        (sh_baked[0, 0], sh_net[0, 0])
    assert rgb_sh.shape == (2, 9, 3)
    dc = np.asarray(opc_sh[:, 0, 0]) / np.sqrt(4 * np.pi)
    assert np.all(dc > -0.2) and np.all(dc < 1.2)


def test_generate_sh_probes_for_precompute(insertor):
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.2, 0.2, (4, 3)),
                      jnp.float32)
    rgb_sh, opc_sh = insertor.generate_sh_probes_for_precompute(pts)
    assert rgb_sh.shape == (4, 9, 3)
    assert opc_sh.shape == (4, 9, 1)
    # DC of the transmittance SH must be within the physical range
    dc = np.asarray(opc_sh[:, 0, 0]) / np.sqrt(4 * np.pi)
    assert np.all(dc > -0.2) and np.all(dc < 1.2)


def test_render_object_and_insert(insertor):
    H = W = 8
    bbox = [[4, 4], [4 + H, 4 + W]]
    rng = np.random.default_rng(1)
    normals = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    depths = jnp.asarray(np.full((H, W), 1.0, np.float32))
    pose = jnp.asarray(insertor.dataset.poses[0])

    # SH path (neural BRDF runs with random weights; shapes/finiteness only)
    sh = insertor.generate_probe(jnp.zeros(3), sh_probe=True)
    res, depth_t = insertor.render_object(
        bbox, normals, depths, sh, pose, use_sg_base=False)
    assert res.shape == (insertor.H, insertor.W, 3)
    assert np.isfinite(np.asarray(res)).all()
    assert float(jnp.sum(depth_t > 0)) == H * W

    # full insert composite (no shadows: no SSDF volume loaded)
    out = insertor.render_insert_object(
        normals, depths, pose, sh, full_return=False, use_sg_base=False,
        sg_use_self_shadow=False, model_bbox=bbox, model_bbox_last=None)
    assert out.shape == (insertor.H, insertor.W, 3)
    assert np.isfinite(out).all()


def test_simplify_shadow_field_darkens_near_occluder(insertor):
    from arnerf_tpu.insert.shadow_fields import SimplifySF, soft_shadow_map
    sf = SimplifySF(grid=24)
    model_pos = jnp.zeros(3)
    light_sh = jnp.zeros((1, 9, 3)).at[:, 0, :].set(2.0)  # ambient light
    near_pts = jnp.asarray([[0.0, -1.2, 0.0]])   # close below the object
    far_pts = jnp.asarray([[0.0, -5.5, 0.0]])    # far below
    s_near = float(soft_shadow_map(sf, model_pos, 1.0, light_sh, near_pts)[0])
    s_far = float(soft_shadow_map(sf, model_pos, 1.0, light_sh, far_pts)[0])
    assert s_near < s_far <= 1.0 + 1e-6


def test_ssdf_shadow_pipeline(insertor, tmp_path_factory):
    """SGShadow end to end with a synthetic PCA volume: self-shadow light
    decay + scene shadow factor + full composite."""
    tmp = tmp_path_factory.mktemp("ssdf")
    rng = np.random.default_rng(3)
    # plausible spherical-SDF PCA data: mean angle ~0.3rad, small variations
    np.savez(tmp / "pca.npz",
             coeff=rng.normal(0, 0.02, (20 * 20 * 20, 128)).astype(np.float32),
             component=rng.normal(0, 0.05, (128, 74, 148)).astype(np.float32),
             mean=np.full((1, 74, 148), 0.3, np.float32))
    insertor.set_sg_shadow(str(tmp / "pca.npz"))
    # override viewer-spec constructor args used by set_sg_shadow
    from arnerf_tpu.insert.envfit import trans_raw_sg
    sgs = trans_raw_sg(jnp.asarray(
        rng.normal(size=(8, 7)), jnp.float32) * jnp.asarray(
            [1, 1, 1, 20, 1, 1, 1.0]))
    sgs = jnp.abs(sgs).at[:, :3].set(sgs[:, :3])  # keep axes signed

    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (40, 3)), jnp.float32)
    model_pos = jnp.zeros(3)
    factor = insertor.sg_shadow.calc_shadow_factor(0.3, pts, model_pos, sgs)
    assert factor.shape == (40,)
    assert np.all((np.asarray(factor) >= 0) & (np.asarray(factor) <= 1))

    decayed = insertor.sg_shadow.calc_self_shadow_light_decay(
        0.3, pts, model_pos, sgs)
    assert decayed.shape == (40, 8, 7)
    # decay only reduces amplitudes
    assert np.all(np.asarray(decayed[..., -3:])
                  <= np.asarray(sgs[None, :, -3:]) + 1e-6)

    # full SG composite with shadows through render_insert_object
    H = W = 6
    bbox = [[8, 8], [8 + H, 8 + W]]
    normals = rng.normal(size=(H, W, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    depths = jnp.asarray(np.full((H, W), 1.0, np.float32))
    pose = jnp.asarray(insertor.dataset.poses[0])
    insertor.generate_probe(jnp.zeros(3), sh_probe=True)  # sets cubemap_rgb
    out = insertor.render_insert_object(
        jnp.asarray(normals), depths, pose, sgs, use_sg_base=True,
        sg_use_self_shadow=True, model_bbox=bbox, model_bbox_last=None,
        model_radius=0.3, model_pos=model_pos, gen_shadow=1)
    assert out.shape == (insertor.H, insertor.W, 3)
    assert np.isfinite(out).all()


def test_fused_frame_matches_multistage(insertor):
    """Round-5 one-dispatch serving frame (_try_render_insert_fused) vs
    the general multi-stage path: same field, same probe, same dirty
    rect. PBR shade and compositing math are identical; only the
    stochastic per-ray jitter streams differ (ray index layouts), so the
    frames agree to jitter noise. Also pins that the fused path updates
    the persistent last_rgb/last_depth buffers equivalently."""
    os.environ["ARNERF_INSERT_BAKE_RES"] = "32"
    insertor.use_baked = True
    try:
        H = W = 8
        bbox = [[4, 4], [4 + H, 4 + W]]
        bbox_last = [[2, 3], [2 + H, 3 + W]]
        rng = np.random.default_rng(7)
        normals = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        depths = jnp.full((H, W), 1.0, jnp.float32)
        pose = jnp.asarray(insertor.dataset.poses[0])
        sh = insertor.generate_probe(jnp.zeros(3), sh_probe=True)

        kw = dict(full_return=False, use_sg_base=False,
                  sg_use_self_shadow=False, model_bbox=bbox,
                  model_bbox_last=bbox_last)
        insertor.key = jax.random.PRNGKey(11)
        insertor.last_rgb = insertor.last_depth = None
        out_f = insertor.render_insert_object(normals, depths, pose, sh,
                                              **kw)
        lr_f = np.asarray(insertor.last_rgb)
        ld_f = np.asarray(insertor.last_depth)

        # force the fallback path with identical inputs/keys
        insertor.key = jax.random.PRNGKey(11)
        insertor.last_rgb = insertor.last_depth = None
        orig = insertor._try_render_insert_fused
        insertor._try_render_insert_fused = \
            lambda *a, **k2: None
        try:
            out_m = insertor.render_insert_object(normals, depths, pose,
                                                  sh, **kw)
        finally:
            insertor._try_render_insert_fused = orig
        lr_m = np.asarray(insertor.last_rgb)
        ld_m = np.asarray(insertor.last_depth)

        assert out_f.shape == out_m.shape
        assert np.isfinite(out_f).all()
        mse = float(np.mean((out_f - out_m) ** 2))
        assert mse < 2e-3, mse
        assert float(np.mean((lr_f - lr_m) ** 2)) < 2e-3
        # depth agrees on covered pixels (jitter-level differences only)
        assert float(np.median(np.abs(ld_f - ld_m))) < 0.05
        # pixels OUTSIDE the update rect must be bit-identical (untouched)
        un = np.ones(lr_f.shape[:2], bool)
        un[2:4 + H, 3:4 + W] = False
        assert np.array_equal(lr_f[un], lr_m[un])
        insertor.last_rgb = insertor.last_depth = None
    finally:
        insertor.use_baked = False
        insertor._baked = None
        del os.environ["ARNERF_INSERT_BAKE_RES"]


def test_fused_frame_sg_selfshadow_smoke(insertor):
    """SG shading + self-shadow decay + SSDF shadow inside the fused
    program: shape/finiteness (the SG quality math is pinned by
    tests/test_sg_shadow.py; here we pin that the fused routing accepts
    the full serving configuration)."""
    pca = os.path.join(os.path.dirname(__file__), "..", "arnerf_tpu",
                       "insert", "data")
    os.environ["ARNERF_INSERT_BAKE_RES"] = "32"
    insertor.use_baked = True
    try:
        H = W = 8
        bbox = [[4, 4], [4 + H, 4 + W]]
        rng = np.random.default_rng(9)
        normals = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        depths = jnp.full((H, W), 1.0, jnp.float32)
        pose = jnp.asarray(insertor.dataset.poses[0])
        l_sgs = jnp.concatenate([
            jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
            jnp.full((2, 1), 8.0), jnp.full((2, 3), 1.0)], axis=1)
        insertor.last_rgb = insertor.last_depth = None
        out = insertor.render_insert_object(
            normals, depths, pose, l_sgs, full_return=False,
            use_sg_base=True, sg_use_self_shadow=True, model_bbox=bbox,
            model_bbox_last=None, model_pos=jnp.zeros(3),
            model_radius=0.3)
        assert out.shape == (insertor.H, insertor.W, 3)
        assert np.isfinite(out).all()
        insertor.last_rgb = insertor.last_depth = None
    finally:
        insertor.use_baked = False
        insertor._baked = None
        del os.environ["ARNERF_INSERT_BAKE_RES"]
