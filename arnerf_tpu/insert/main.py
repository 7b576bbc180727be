"""AR object insertion: NGPInsertor (offline prep + per-frame relight and
composite) and NGPServer (TCP protocol with the external OpenGL viewer).
Rebuilt from reference insert/main.py.

Pipeline parity (reference line refs inline):
  * scene surface cache (rgb/points/normals per training pose) via
    depth + density-gradient normals ............ main.py:151-193
  * point-cloud / blender-transform export ....... main.py:221-249
  * global-SH inverse rendering driver ........... main.py:251-302
  * SH / SG light-probe generation ............... main.py:306-407
  * shadow application (shadow field / SG-SSDF /
    rasterized shadow map) ....................... main.py:419-519
  * object PBR render + dirty-rect NeRF
    recomposite .................................. main.py:521-684
  * TCP protocol: 14 actions ..................... main.py:687-1191
"""

import os
import struct
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ngp import NGPConfig, ngp_init, grid_state_init
from ..rendering import (render_test, render_surface_normal)
from ..datasets.ray_utils import get_ray_directions, get_rays
from ..training.ckpt import load_ckpt
from .sh_math import (get_sh_coeff, get_cubemap_rays, get_sphere_rays,
                      rotate_sh_by_recalc, normalize, write2ply, sh2envmap)
from .render_utils import (cubemap2env_map, sh_render_core, sg_render_core,
                           _gaussian_blur_3x3)
from .envfit import EnvOptim, trans_raw_sg, sg2envmap
from .insert_models import (get_embedder, mlp_skip_init, mlp_skip_apply,
                            train_global_env_prec)
from .global_light import GlobalLightEstimator
from .shadow_fields import ComplexSF, soft_shadow_map, transform_sf_txt
from .sg_shadow import SGShadow
from .tonemapping import tonemapping_simple, tonemapping_simple_gamma
from .server import Server

SH_ORDER = 3           # SH9 (reference main.py:36)
USE_STD_SF = True


def _blur_hw1(img, k=9):
    """Gaussian blur of an (H, W, 1) map by repeated 3x3 passes
    (approximates the reference's single (k,k) gaussian)."""
    n = max(1, k // 3 + 1)
    for _ in range(n):
        img = _gaussian_blur_3x3(img)
    return img


class NGPInsertor:
    """reference insert/main.py:49-684."""

    def __init__(self, hparams, key=None):
        self.hparams = hparams
        self.key = key if key is not None else jax.random.PRNGKey(0)
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
            # occupancy may come from a slim ckpt without grid -> rebuild
            if int(jnp.sum(self.grid_state.occ_flat)) == 0:
                occ = (self.grid_state.density_grid > 0.01).astype(jnp.uint8)
                self.grid_state = self.grid_state._replace(
                    occ_flat=occ.reshape(-1))

        self.gen_path = os.path.join('./insert/generate/', hparams.exp_name)
        self.has_pc = os.path.exists(os.path.join(self.gen_path, 'pc.ply'))
        self.has_sur = os.path.exists(
            os.path.join(self.gen_path, 'surface.npy'))
        read_meta = not (self.has_sur or os.path.exists(
            os.path.join(self.gen_path, 'mat_sh_000199.npz')))

        from ..datasets import dataset_dict
        kwargs = {'root_dir': hparams.root_dir,
                  'downsample': hparams.downsample, 'read_meta': read_meta}
        if hparams.use_EXR and hparams.dataset_name in (
                'colmap_exr', 'colmap_real_exr', 'myblender'):
            kwargs['use_EXR'] = True
        dataset = dataset_dict[hparams.dataset_name](**kwargs)

        l_resol = hparams.low_resolution
        self.K = np.array(dataset.K, np.float32)
        self.K[:2] = self.K[:2] / l_resol
        self.W = int(dataset.img_wh[0] / l_resol)
        self.H = int(dataset.img_wh[1] / l_resol)
        self.directions = jnp.asarray(
            get_ray_directions(self.H, self.W, self.K)).reshape(
                self.H, self.W, 3)
        self.screen_bound = [[0, 0], [self.H, self.W]]
        self.dataset = dataset
        self.sh_ray_dirs = None
        self.cubemap_rgb = None
        self.global_sh = jnp.zeros((1, SH_ORDER ** 2, 3))

        self.last_depth = None
        self.last_rgb = None

        # neural-BRDF glossy MLP (reference loads insert/data/model_brdf3.tar,
        # main.py:90-94; regenerate with scripts/train_brdf.py)
        embed_fn_v, input_ch_v = get_embedder(3)
        self.embed_fn_v = embed_fn_v
        brdf_path = os.path.join(os.path.dirname(__file__), 'data',
                                 f'model_brdf{SH_ORDER}.npz')
        self.model_brdf_params = self._load_or_init_brdf(
            brdf_path, input_ch_v * 2 + 1, 2 * SH_ORDER ** 2)

        self.sf = None
        self.sg_shadow = None
        self.env_opt = EnvOptim()
        os.makedirs(self.gen_path, exist_ok=True)
        os.makedirs(os.path.join(self.gen_path, 'results'), exist_ok=True)
        self.dt = 0.0

        # Baked-field probe acceleration (ARNERF_INSERT_BAKED=1): probe
        # generation is the serving hot loop — every object move renders
        # 1-6k probe rays through the network path (SURVEY §3.4; reference
        # main.py:306-407 does the same through its CUDA renderer). The
        # baked SH grid (rendering_baked.py) answers a probe ray with ~1
        # narrow gather per sample instead of 128, after a one-time bake.
        # LDR Sigmoid scenes only (HDR probes need output_radiance through
        # the tonemapper-free path — network fallback); multi-cascade
        # scenes bake per-cascade grids (rendering_baked.bake_field_mc).
        self._baked = None
        self.use_baked = (
            os.environ.get('ARNERF_INSERT_BAKED', '') == '1'
            and self.cfg.rgb_act == 'Sigmoid')

    def _load_or_init_brdf(self, path, input_ch, output_ch):
        params = mlp_skip_init(jax.random.PRNGKey(42), input_ch, output_ch,
                               D=2, W=128)
        if os.path.exists(path):
            blob = np.load(path)
            for i in range(len(params["layers"])):
                params["layers"][i] = {"w": jnp.asarray(blob[f"w_{i}"]),
                                       "b": jnp.asarray(blob[f"b_{i}"])}
            print(f'Loaded neural BRDF from {path}')
        else:
            print('WARNING: no pretrained neural BRDF found '
                  f'({path}); SH glossy shading will be uncalibrated. '
                  'Run scripts/train_brdf.py to fit one.')
        return params

    def model_brdf(self, x):
        return mlp_skip_apply(self.model_brdf_params, x)

    def set_sf(self, sf_path):
        self.sf = ComplexSF(sf_path, SH_ORDER ** 2)

    def set_sg_shadow(self, pca_path):
        self.sg_shadow = SGShadow(pca_path, 20, 128, 2, envH=74, envW=148)

    # -- NeRF rendering ----------------------------------------------------

    def render(self, rays_o, rays_d, **kwargs):
        """Interactive-quality test render (reference main.py:110-131):
        T_threshold 1e-2, max_samples 100."""
        exp_step_factor = 1 / 256 if self.hparams.dataset_name in (
            'colmap', 'nerfpp') else 0.0
        t = time.time()
        out = render_test(
            self.params, self.grid_state, rays_o, rays_d, self.cfg,
            exp_step_factor=exp_step_factor, T_threshold=1e-2,
            max_samples=96, samples_per_round=32,
            output_radiance=kwargs.get('output_radiance', False),
            sh_bkg=kwargs.get('SH_bkg'), im_bkg=kwargs.get('IM_bkg'),
            blend_bkg=kwargs.get('blend_bkg', True),
            mesh_depth_map=kwargs.get('mesh_depth_map'))
        self.dt = time.time() - t
        if kwargs.get('return_full_res', False):
            return out
        return out['rgb'], out['depth']

    def render_pose(self, pose, **kwargs):
        rays_o, rays_d = get_rays(self.directions.reshape(-1, 3),
                                  jnp.asarray(pose))
        rgb, depth = self.render(rays_o, rays_d, **kwargs)
        return (np.asarray(rgb).reshape(self.H, self.W, 3),
                np.asarray(depth).reshape(self.H, self.W),
                rays_o, rays_d)

    def _get_baked(self):
        if self._baked is None:
            from ..rendering_baked import bake_ngp
            res = int(os.environ.get('ARNERF_INSERT_BAKE_RES', '192'))
            t = time.time()
            self._baked = bake_ngp(self.params, self.grid_state, self.cfg,
                                   resolution=res, n_dirs=16)
            self._probe_fused = None     # fused probe closes over the bake
            self._rect_fused = None      # fused rect render too
            self._frame_fused = None     # and the whole-frame program
            print(f'insert: baked {res}^3 probe field in '
                  f'{time.time() - t:.1f}s')
        return self._baked

    def _rect_render_fused_fn(self, n_pad: int):
        """One-dispatch dirty-rect scene render (serving hot loop, part 2).

        Same rationale as _probe_fused_fn: the rect render through
        render_baked's host bucket path pays several tunnel roundtrips
        (readback + re-upload) per frame. This closes baked render +
        mesh-depth far clamp + im_bkg blend into a single jitted program
        per padded rect size; outputs stay device arrays (the .at[].set
        update into last_rgb is also a device op), so an object-move
        frame costs one dispatch chain and zero intermediate readbacks."""
        cache = getattr(self, '_rect_fused', None) or {}
        self._rect_fused = cache
        fn = cache.get(n_pad)
        if fn is not None:
            return fn
        from ..rendering_baked import render_baked_uniform
        baked = self._get_baked()

        # tables ride as ARGUMENTS, not closures: closed-over arrays embed
        # as program constants, and the axon runtime re-ships large
        # constants with the program
        @jax.jit
        def fused(rows, aabb_lo, aabb_hi, mip, sigma, row_index, rows_q,
                  ro, rd, im_bkg, mesh_depth, key):
            res = render_baked_uniform(
                rows, aabb_lo, aabb_hi, ro, rd, key,
                B=baked.resolution, scale=baked.scale, T_threshold=1e-2,
                n_steps=128, samples_per_round=16, color_window=8,
                mip=mip, sigma=sigma,
                row_index=row_index, rows_q=rows_q,
                t_far=mesh_depth)
            rgb = res['rgb'] + im_bkg * (1.0 - res['opacity'][:, None])
            return rgb, res['depth']

        def call(ro, rd, im_bkg, mesh_depth, key):
            return fused(baked.rows, baked.aabb_lo, baked.aabb_hi,
                         baked.mip, baked.sigma, baked.row_index,
                         baked.rows_q, ro, rd, im_bkg, mesh_depth, key)

        cache[n_pad] = call
        return call

    def _probe_fused_fn(self):
        """ONE-dispatch SH probe for serving (SURVEY §3.4 hot loop).

        The bench r4 device measurement showed the probe DISPATCH-bound:
        ~440 ms through render_baked's host-side bucket path (per-bucket
        readbacks + key splits, each a ~38 ms tunnel roundtrip) for a few
        thousand rays of actual work. This fuses baked render + SH-
        background blend + SH9 projection into a single jitted program
        over the STATIC probe direction set; only the (9, 3) coefficients
        (plus the cubemap rgb, consumed downstream by rotate/relight) come
        back per call."""
        if getattr(self, '_probe_fused', None) is not None:
            return self._probe_fused
        from ..rendering_baked import render_baked_uniform
        from .sh_math import get_sh_val, get_sh_coeff
        baked = self._get_baked()
        dirs = self.sh_ray_dirs.reshape(-1, 3)
        n = dirs.shape[0]
        pad = (-n) % 1024
        dirs_p = (jnp.concatenate([dirs, jnp.ones((pad, 3))])
                  if pad else dirs)

        @jax.jit
        def fused(pt, sh_bkg, key):
            ro = jnp.broadcast_to(jnp.asarray(pt)[None], dirs_p.shape)
            res = render_baked_uniform(
                baked.rows, baked.aabb_lo, baked.aabb_hi, ro, dirs_p, key,
                B=baked.resolution, scale=baked.scale, T_threshold=1e-2,
                mip=baked.mip, sigma=baked.sigma,
                row_index=baked.row_index, rows_q=baked.rows_q)
            rgb = res['rgb'][:n]
            rgb_bg = get_sh_val(sh_bkg, dirs, clamp_positive=True)
            rgb = rgb + rgb_bg * (1.0 - res['opacity'][:n, None])
            return rgb, get_sh_coeff(dirs[None], rgb[None])

        self._probe_fused = fused
        return fused

    def _probe_render(self, rays_o, ray_dirs, *, sh_bkg=None,
                      blend_bkg=True, output_radiance=False,
                      need_opacity=False):
        """Probe-ray render, routed to the baked field when enabled.

        Background blend matches render_test exactly:
        rgb + bkg(dir) * (1 - opacity) with the SH background clamped
        positive (reference rendering.py:240-250)."""
        if self.use_baked and not output_radiance:
            from ..rendering_baked import render_baked
            from .sh_math import get_sh_val
            baked = self._get_baked()
            self.key, k = jax.random.split(self.key)
            t = time.time()
            out = render_baked(baked, self.grid_state, rays_o, ray_dirs,
                               self.cfg, key=k, T_threshold=1e-2)
            rgb = out['rgb']
            if blend_bkg and sh_bkg is not None:
                rgb_bg = get_sh_val(sh_bkg, ray_dirs, clamp_positive=True)
                rgb = rgb + rgb_bg * (1.0 - out['opacity'][:, None])
            self.dt = time.time() - t
            return ({'rgb': rgb, 'opacity': out['opacity'],
                     'depth': out['depth']} if need_opacity else
                    (rgb, out['depth']))
        kwargs = {'blend_bkg': blend_bkg}
        if sh_bkg is not None:
            kwargs['SH_bkg'] = sh_bkg
        if output_radiance:
            kwargs['output_radiance'] = True
        if need_opacity:
            kwargs['return_full_res'] = True
        return self.render(rays_o, ray_dirs, **kwargs)

    def _render_scene_baked(self, rays_o, rays_d, im_bkg, mesh_depth_map):
        """Dirty-rect scene recomposite on the baked field: far bound
        clamped at the inserted mesh's depth, object pixels blended as the
        background (render_test's im_bkg semantics,
        reference rendering.py:38-44 + :240-250). Runs as ONE fused
        program per padded rect size (_rect_render_fused_fn); pad rays
        start far outside the AABB and die for free, pad t_far = 0 means
        no clamp."""
        n = rays_o.shape[0]
        n_pad = max(1024, 1 << max(n - 1, 1).bit_length())
        fused = self._rect_render_fused_fn(n_pad)
        self.key, k = jax.random.split(self.key)
        pad = n_pad - n
        if pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.full((pad, 3), 1e6, jnp.float32)])
            rays_d = jnp.concatenate(
                [rays_d, jnp.ones((pad, 3), jnp.float32)])
            im_bkg = jnp.concatenate(
                [im_bkg, jnp.zeros((pad, 3), im_bkg.dtype)])
            mesh_depth_map = jnp.concatenate(
                [jnp.asarray(mesh_depth_map, jnp.float32),
                 jnp.zeros((pad,), jnp.float32)])
        t = time.time()
        rgb, depth = fused(rays_o, rays_d, im_bkg, mesh_depth_map, k)
        self.dt = time.time() - t
        return rgb[:n], depth[:n]

    # -- whole-frame fused serving path (round 5) ---------------------------

    def _frame_fused_fn(self, key_tuple):
        """ONE-dispatch AR frame: PBR object shade + dirty-rect baked
        recomposite + persistent frame-buffer update + shadow + final
        frame, as a single jitted program (VERDICT r4 #3).

        Round 4 fused the two render stages individually (probe 451 ->
        ~20 ms), but a frame still ran the PBR shade, the .at[].set
        buffer updates and the shadow pass as EAGER jnp ops — each one a
        dispatch, ~28-38 ms of tunnel latency apiece, 371-968 ms/frame
        total. Here the whole per-frame chain is one program per static
        shape bucket; the only per-frame host traffic is the client's
        normals/depths upload and ONE full-frame readback. The reference
        serves this loop from insert/main.py:1113-1178.

        key_tuple (static): (Hbp, Wbp, Hrp, Wrp, use_sg, self_shadow,
        shadow_kind, has_rot, tex_size) — padded object-bbox and
        update-rect sizes (pow2 buckets; dynamic_slice offsets carry the
        true position), shading family, shadow family (0 none,
        1 ssdf/field by use_sg, 2 rasterized shadow map), rotation
        presence, shadow-map texture size (kind 2 only)."""
        cache = getattr(self, '_frame_fused', None) or {}
        self._frame_fused = cache
        fn = cache.get(key_tuple)
        if fn is not None:
            return fn
        (Hbp, Wbp, Hrp, Wrp, use_sg, self_sh, shadow_kind, has_rot,
         tex_size, has_refl) = key_tuple
        from ..rendering_baked import render_baked_uniform
        baked = self._get_baked()
        H, W = self.H, self.W
        dirs_full = self.directions                      # (H, W, 3) device
        clamp01 = not self.hparams.render_HDR_mapping

        @partial(jax.jit, donate_argnums=(16, 17))
        def fused(rows, aabb_lo, aabb_hi, mip, sigma, row_index, rows_q,
                  normals_p, depths_p, b_start, r_start, mask_r, pose,
                  sh_or_sg, metal, rough, last_rgb, last_depth,
                  cubemap_rgb, model_pos, model_r, rot_inv, vp, s_map,
                  key):
            # ---- 1. PBR shade of the object bbox ------------------------
            dirs_b = jax.lax.dynamic_slice(
                dirs_full, (b_start[0], b_start[1], 0), (Hbp, Wbp, 3))
            ro_b, rd_b = get_rays(dirs_b.reshape(-1, 3), pose)
            vdirs = normalize(rd_b)
            n_pix = Hbp * Wbp
            normal_px = normals_p.reshape(-1, 3)
            depths_px = depths_p.reshape(-1, 1)
            mask_b = depths_px > 1e-6                    # pad rows: 0
            albedo_px = jnp.ones((n_pix, 3))
            metal_px = jnp.broadcast_to(metal, (n_pix, 1))
            rough_px = jnp.broadcast_to(rough, (n_pix, 1))
            refl = cubemap_rgb if has_refl else None
            if use_sg:
                l = sh_or_sg
                if self_sh:
                    pts_b = ro_b + depths_px * vdirs
                    l = self.sg_shadow.calc_self_shadow_light_decay(
                        model_r, pts_b, model_pos, sh_or_sg,
                        rot_inv if has_rot else None)
                cols = sg_render_core(albedo_px, metal_px, rough_px,
                                      normal_px, vdirs, l, clamp01,
                                      self_sh, refl)
            else:
                sh9 = jnp.broadcast_to(sh_or_sg,
                                       (n_pix, SH_ORDER ** 2, 3))
                cols = sh_render_core(albedo_px, metal_px, rough_px,
                                      normal_px, vdirs, sh9,
                                      self.embed_fn_v, self.model_brdf,
                                      clamp01, refl)
            cols = (cols * mask_b).reshape(Hbp, Wbp, 3)
            frame_obj = jax.lax.dynamic_update_slice(
                jnp.zeros((H, W, 3)), cols, (b_start[0], b_start[1], 0))
            depth_obj = jax.lax.dynamic_update_slice(
                jnp.zeros((H, W)), depths_p, (b_start[0], b_start[1]))

            # ---- 2. dirty-rect baked scene recomposite ------------------
            dirs_r = jax.lax.dynamic_slice(
                dirs_full, (r_start[0], r_start[1], 0), (Hrp, Wrp, 3))
            ro_r, rd_r = get_rays(dirs_r.reshape(-1, 3), pose)
            mr = mask_r.reshape(-1)
            # pad rays start far outside the AABB: they die on the cull
            ro_r = jnp.where(mr[:, None], ro_r, 1e6)
            im_bkg = jax.lax.dynamic_slice(
                frame_obj, (r_start[0], r_start[1], 0),
                (Hrp, Wrp, 3)).reshape(-1, 3)
            mesh_depth = jax.lax.dynamic_slice(
                depth_obj, (r_start[0], r_start[1]),
                (Hrp, Wrp)).reshape(-1)
            res = render_baked_uniform(
                rows, aabb_lo, aabb_hi, ro_r, rd_r, key,
                B=baked.resolution, scale=baked.scale, T_threshold=1e-2,
                n_steps=128, samples_per_round=16, color_window=8,
                mip=mip, sigma=sigma, row_index=row_index, rows_q=rows_q,
                t_far=mesh_depth)
            rgb_r = (res['rgb'] + im_bkg * (1.0 - res['opacity'][:, None])) \
                .reshape(Hrp, Wrp, 3)
            dep_r = res['depth'].reshape(Hrp, Wrp, 1)

            # ---- 3. persistent frame-buffer update (donated) ------------
            old_rgb = jax.lax.dynamic_slice(
                last_rgb, (r_start[0], r_start[1], 0), (Hrp, Wrp, 3))
            old_dep = jax.lax.dynamic_slice(
                last_depth, (r_start[0], r_start[1], 0), (Hrp, Wrp, 1))
            m3 = mask_r[:, :, None]
            new_rgb = jax.lax.dynamic_update_slice(
                last_rgb, jnp.where(m3, rgb_r, old_rgb),
                (r_start[0], r_start[1], 0))
            new_dep = jax.lax.dynamic_update_slice(
                last_depth, jnp.where(m3, dep_r, old_dep),
                (r_start[0], r_start[1], 0))

            # ---- 4. shadow over the full frame --------------------------
            rgb_out = new_rgb
            if shadow_kind:
                ro_f, rd_f = get_rays(dirs_full.reshape(-1, 3), pose)
                pts = (ro_f.reshape(H, W, 3)
                       + rd_f.reshape(H, W, 3) * new_dep).reshape(-1, 3)
                if shadow_kind == 2:
                    pts_h = jnp.concatenate(
                        [pts, jnp.ones((pts.shape[0], 1))], -1)
                    ras = (vp @ pts_h.T).T
                    ras = ras.at[:, :3].divide(ras[:, 3:4])
                    rx = jnp.clip(((ras[:, 0] + 1) / 2 * tex_size)
                                  .astype(jnp.int32), 0, tex_size - 1)
                    ry = jnp.clip(((-ras[:, 1] + 1) / 2 * tex_size)
                                  .astype(jnp.int32), 0, tex_size - 1)
                    rz = 0.5 * (ras[:, 2] + 1)
                    sd = rz - s_map[ry, rx, 0]
                    sdc = jnp.clip((sd / (model_r * 50)) ** 2, 0.2, 1.0)
                    smap = jnp.where(sd < 0, 1.0, sdc).reshape(H, W, 1)
                    rgb_out = new_rgb * _blur_hw1(smap, 9)
                elif use_sg:
                    if has_rot:
                        l_rot = sh_or_sg.at[:, :3].set(
                            (rot_inv @ sh_or_sg[:, :3].T).T)
                        smap = self.sg_shadow.calc_shadow_factor(
                            model_r, pts, model_pos, l_rot, rot_inv)
                    else:
                        smap = self.sg_shadow.calc_shadow_factor(
                            model_r, pts, model_pos, sh_or_sg)
                    rgb_out = new_rgb * _blur_hw1(
                        smap.reshape(H, W, 1), 3)
                else:
                    if has_rot:
                        sh_l = rotate_sh_by_recalc(
                            self.sh_ray_dirs[0], cubemap_rgb, rot_inv)
                        smap = soft_shadow_map(self.sf, model_pos,
                                               model_r, sh_l, pts,
                                               rot_inv)
                    else:
                        smap = soft_shadow_map(self.sf, model_pos,
                                               model_r, sh_or_sg, pts)
                    rgb_out = new_rgb * smap.reshape(H, W, 1)
            if self.hparams.render_HDR_mapping:
                rgb_out = tonemapping_simple(rgb_out)
            return rgb_out, new_rgb, new_dep

        def call(normals_p, depths_p, b_start, r_start, mask_r, pose,
                 sh_or_sg, metal, rough, last_rgb, last_depth,
                 cubemap_rgb, model_pos, model_r, rot_inv, vp, s_map,
                 key):
            return fused(baked.rows, baked.aabb_lo, baked.aabb_hi,
                         baked.mip, baked.sigma, baked.row_index,
                         baked.rows_q, normals_p, depths_p, b_start,
                         r_start, mask_r, pose, sh_or_sg, metal, rough,
                         last_rgb, last_depth, cubemap_rgb, model_pos,
                         model_r, rot_inv, vp, s_map, key)

        cache[key_tuple] = call
        return call

    def _try_render_insert_fused(self, normals, depths, pose, sh_or_sg,
                                 metal, rough, albedo, use_sg_base,
                                 sg_use_self_shadow, kwargs):
        """Route an eligible serving frame through the one-dispatch fused
        program. Returns the final frame (np) or None when the
        configuration needs the general fallback path."""
        model_bbox = kwargs.get('model_bbox')
        gen_shadow = kwargs.get('gen_shadow', 0)
        if (not self.use_baked or self.hparams.use_EXR
                or albedo is not None or not np.isscalar(metal)
                or not np.isscalar(rough) or model_bbox is None):
            return None
        (hs, ws), (hl, wl) = model_bbox
        hb, wb = hl - hs, wl - ws
        H, W = self.H, self.W
        if hb <= 0 or wb <= 0 or hb > H or wb > W:
            return None
        rot_inv = kwargs.get('model_rot_inv')
        model_pos = kwargs.get('model_pos')
        model_r = kwargs.get('model_radius')
        if gen_shadow and (model_pos is None or model_r is None) \
                and gen_shadow != 2:
            return None
        if use_sg_base and sg_use_self_shadow \
                and (model_pos is None or model_r is None):
            return None
        if gen_shadow == 1 and not use_sg_base and (
                self.sf is None
                or (rot_inv is not None and self.cubemap_rgb is None)):
            return None
        if gen_shadow == 2 and (kwargs.get('s_VP') is None
                                or kwargs.get('s_im') is None
                                or model_r is None):
            return None

        def pow2(n, cap):
            return min(cap, 1 << max(int(n) - 1, 1).bit_length())

        Hbp, Wbp = pow2(hb, H), pow2(wb, W)
        (rhs, rws), (rhl, rwl) = self.get_update_range(
            model_bbox, kwargs.get('model_bbox_last'))
        hr, wr = rhl - rhs, rwl - rws
        Hrp, Wrp = pow2(hr, H), pow2(wr, W)
        tex_size = int(kwargs.get('s_texSize', 0) or 0)
        key_tuple = (Hbp, Wbp, Hrp, Wrp, bool(use_sg_base),
                     bool(use_sg_base and sg_use_self_shadow),
                     int(gen_shadow), rot_inv is not None, tex_size,
                     self.cubemap_rgb is not None)
        fusedc = self._frame_fused_fn(key_tuple)

        # host-side padding: place the true block at its offset inside the
        # padded slice window (clamped so the window stays on-screen)
        bs_h, bs_w = min(hs, H - Hbp), min(ws, W - Wbp)
        npd = np.zeros((Hbp, Wbp, 3), np.float32)
        dpd = np.zeros((Hbp, Wbp), np.float32)
        npd[hs - bs_h:hs - bs_h + hb, ws - bs_w:ws - bs_w + wb] = \
            np.asarray(normals, np.float32).reshape(hb, wb, 3)
        dpd[hs - bs_h:hs - bs_h + hb, ws - bs_w:ws - bs_w + wb] = \
            np.asarray(depths, np.float32).reshape(hb, wb)
        rs_h, rs_w = min(rhs, H - Hrp), min(rws, W - Wrp)
        mask_r = np.zeros((Hrp, Wrp), bool)
        mask_r[rhs - rs_h:rhs - rs_h + hr, rws - rs_w:rws - rs_w + wr] = True

        if self.last_rgb is None:
            self.last_rgb = jnp.zeros((H, W, 3))
            self.last_depth = jnp.zeros((H, W, 1))
        self.key, k = jax.random.split(self.key)
        dummy3 = jnp.zeros(3)
        t0 = time.time()
        rgb_final, self.last_rgb, self.last_depth = fusedc(
            jnp.asarray(npd), jnp.asarray(dpd),
            jnp.asarray([bs_h, bs_w], jnp.int32),
            jnp.asarray([rs_h, rs_w], jnp.int32), jnp.asarray(mask_r),
            jnp.asarray(pose), jnp.asarray(sh_or_sg),
            jnp.float32(metal),
            jnp.float32(np.clip(rough, 0.2, 1.0)),
            self.last_rgb, self.last_depth,
            jnp.asarray(self.cubemap_rgb) if self.cubemap_rgb is not None
            else jnp.zeros((1, 3)),
            jnp.asarray(model_pos) if model_pos is not None else dummy3,
            jnp.float32(model_r if model_r is not None else 1.0),
            jnp.asarray(rot_inv) if rot_inv is not None
            else jnp.eye(3),
            jnp.asarray(kwargs.get('s_VP')) if kwargs.get('s_VP')
            is not None else jnp.eye(4),
            jnp.asarray(kwargs.get('s_im')) if kwargs.get('s_im')
            is not None else jnp.zeros((1, 1, 1)),
            k)
        out = np.asarray(rgb_final)
        self.dt = time.time() - t0
        return out

    # -- offline prep ------------------------------------------------------

    def generate_surface(self, save=False):
        """Per-pose surface cache (reference main.py:151-193)."""
        save_path = os.path.join(self.gen_path, 'surface.npy')
        if self.has_sur:
            info = np.load(save_path, allow_pickle=True).item()
            self.rgbs, self.spts, self.normals = \
                info['rgbs'], info['spts'], info['normals']
            return
        rgbs, pts, normals = [], [], []
        kwargs = {'output_radiance': True} if self.hparams.use_EXR else {}
        for pose in self.dataset.poses:
            rgb, depth, rays_o, rays_d = self.render_pose(pose, **kwargs)
            ro = np.asarray(rays_o).reshape(self.H, self.W, 3)
            rd = np.asarray(rays_d).reshape(self.H, self.W, 3)
            surface_pts = ro + depth[..., None] * rd
            n = np.asarray(render_surface_normal(
                self.params, jnp.asarray(surface_pts), self.cfg))
            rgbs.append(rgb)
            pts.append(surface_pts)
            normals.append(n)
        self.rgbs = np.stack(rgbs, 0)
        self.spts = np.stack(pts, 0)
        self.normals = np.stack(normals, 0)
        self.has_sur = True
        if save:
            np.save(save_path, {'rgbs': self.rgbs, 'spts': self.spts,
                                'normals': self.normals})

    def generate_point_cloud(self):
        """reference main.py:221-249."""
        if self.has_pc:
            binfo = np.load(os.path.join(self.gen_path, 'btrans.npy'),
                            allow_pickle=True).item()
            self.blender_trans = binfo['trans']
            self.blender_scale = binfo['scale']
            return
        self.generate_surface(save=True)
        rgbs = self.rgbs.reshape(-1, 3)
        pts = self.spts.reshape(-1, 3)
        idx = np.random.default_rng(0).permutation(pts.shape[0])
        idx = idx[:self.hparams.max_pc_pts_num]
        rgbs, pts = rgbs[idx], pts[idx]
        if self.hparams.use_EXR:
            rgbs = np.asarray(tonemapping_simple_gamma(rgbs))
        write2ply(rgbs, pts, os.path.join(self.gen_path, 'pc.ply'))
        binfo = {
            'trans': np.asarray(getattr(self.dataset, 'blender_trans',
                                        np.eye(4)), np.float32),
            'scale': float(getattr(self.dataset, 'blender_scale', 1.0))}
        self.blender_trans = binfo['trans']
        self.blender_scale = binfo['scale']
        np.save(os.path.join(self.gen_path, 'btrans.npy'), binfo,
                allow_pickle=True)
        self.has_pc = True

    def generate_envmaps(self, env_num=512):
        """Env maps at random surface points for the amortized SG fitter
        (reference main.py:195-212)."""
        res_path = os.path.join(self.gen_path, 'envmaps.npy')
        if os.path.exists(res_path):
            return
        self.generate_surface(save=True)
        spts = self.spts.reshape(-1, 3)
        idx = np.random.default_rng(0).permutation(spts.shape[0])[:env_num]
        envmaps = [np.asarray(self.generate_probe(jnp.asarray(pt),
                                                  return_envmap=True))
                   for pt in spts[idx]]
        np.save(res_path, np.stack(envmaps, 0))

    def load_or_train_envmaps(self, epochs=200):
        """Amortized SG fitter over the scene's env maps
        (reference main.py:215-218; disabled by default upstream too)."""
        self.generate_envmaps()
        envmaps = np.load(os.path.join(self.gen_path, 'envmaps.npy'))
        from .envfit import EnvTrainer
        self.env_model = EnvTrainer(envmaps)
        self.env_model.train(epochs)
        return self.env_model

    def train_global_sh_light(self):
        """reference main.py:251-302."""
        self.generate_surface(save=True)
        gle = GlobalLightEstimator(self.gen_path)
        if not gle.calc_complete:
            gle.detect_planar_patch()
            gle.save_results(self)
        gsh = train_global_env_prec(
            gle.t_pts, gle.t_normal, gle.t_rgbs,
            getattr(gle, 't_rgb_shs', None), getattr(gle, 't_opc_shs', None),
            self.gen_path, SH_ORDER ** 2, iters=200, ckpt_save=199,
            batch=20480 * 16, mat_smooth_range=1e-2, mat_smooth_weight=0.2,
            lrate=1e-4, lrate_decay=2000,
            hdr_mapping=self.hparams.train_SH_HDR_mapping)
        self.global_sh = jnp.asarray(gsh)[None] if gsh.ndim == 2 \
            else jnp.asarray(gsh)

    # -- probes ------------------------------------------------------------

    def generate_probe(self, pt, sh_probe=True, return_envmap=False,
                       use_sphere_rays_sample=False):
        """Light probe at a point: render probe rays from the NeRF with the
        global SH as background; project to SH9 or fit SGs
        (reference main.py:306-352)."""
        if self.sh_ray_dirs is None:
            if use_sphere_rays_sample:
                self.key, k = jax.random.split(self.key)
                self.sh_ray_dirs = get_sphere_rays(k, 1, 2048)
            else:
                self.sh_ray_dirs = get_cubemap_rays(1, 32)
        ray_dirs = self.sh_ray_dirs.reshape(-1, 3)
        if (self.use_baked and sh_probe and not return_envmap
                and not self.hparams.use_EXR
                and not self.hparams.gen_probe_HDR_mapping):
            # serving fast path: one dispatch for render + blend + SH9
            fused = self._probe_fused_fn()
            self.key, k = jax.random.split(self.key)
            rgb, coeff = fused(jnp.asarray(pt), self.global_sh[0], k)
            self.cubemap_rgb = rgb
            return coeff
        rays_o = jnp.broadcast_to(jnp.asarray(pt)[None], ray_dirs.shape)
        rgb, _ = self._probe_render(
            rays_o, ray_dirs, sh_bkg=self.global_sh[0],
            output_radiance=self.hparams.use_EXR)
        if self.hparams.gen_probe_HDR_mapping:
            rgb = jnp.power(rgb / (1 + rgb), 1.0 / 2.2)
        self.cubemap_rgb = rgb

        if return_envmap:
            return np.asarray(cubemap2env_map(rgb, 32, 128, 128))
        if sh_probe:
            return get_sh_coeff(ray_dirs[None], rgb[None])
        envmap = cubemap2env_map(rgb, 32, 128, 128)
        return self.env_opt.eval(envmap)

    def generate_sh_probes(self, pts, return_raw_rgb=False):
        """Batched SH probes with global-SH background
        (reference main.py:355-379). pts: (x, 3)."""
        n = pts.shape[0]
        self.key, k = jax.random.split(self.key)
        ray_dirs = get_sphere_rays(k, n, 2048)
        rays_o = jnp.broadcast_to(jnp.asarray(pts)[:, None, :],
                                  ray_dirs.shape)
        rgb, _ = self._probe_render(
            rays_o.reshape(-1, 3), ray_dirs.reshape(-1, 3),
            sh_bkg=self.global_sh[0],
            output_radiance=self.hparams.use_EXR)
        if self.hparams.gen_probe_HDR_mapping:
            rgb = jnp.power(rgb / (1 + rgb), 1.0 / 2.2)
        rgb = rgb.reshape(n, -1, 3)
        if return_raw_rgb:
            return rgb, ray_dirs
        return get_sh_coeff(ray_dirs, rgb)

    def generate_sh_probes_for_precompute(self, pts):
        """rgb + opacity SH probes with NO background blend — inputs to the
        triple-product light composition (reference main.py:382-407)."""
        n = pts.shape[0]
        self.key, k = jax.random.split(self.key)
        ray_dirs = get_sphere_rays(k, n, 2048)
        rays_o = jnp.broadcast_to(jnp.asarray(pts)[:, None, :],
                                  ray_dirs.shape)
        res = self._probe_render(
            rays_o.reshape(-1, 3), ray_dirs.reshape(-1, 3),
            blend_bkg=False, need_opacity=True,
            output_radiance=self.hparams.use_EXR)
        rgb = res['rgb'].reshape(n, -1, 3)
        trans = 1.0 - res['opacity'].reshape(n, -1, 1)
        return (get_sh_coeff(ray_dirs, rgb),
                get_sh_coeff(ray_dirs, trans))

    # -- shadows (reference main.py:419-519) -------------------------------

    def enlarge_range(self, bbox, scale):
        dH = bbox[1][0] - bbox[0][0]
        dW = bbox[1][1] - bbox[0][1]
        return [[int(max(0, bbox[0][0] - scale * dH)),
                 int(max(0, bbox[0][1] - scale * dW))],
                [int(min(self.H, bbox[1][0] + scale * dH)),
                 int(min(self.W, bbox[1][1] + scale * dW))]]

    def shadow_field(self, rays_o, rays_d, rgb, depth_sur, model_sh9,
                     **kwargs):
        model_r = kwargs.get('model_radius')
        model_pos = kwargs.get('model_pos')
        if model_r is None or model_pos is None:
            print('Use shadow field, but infos not complete!')
            return rgb
        ro = rays_o.reshape(rgb.shape)
        rd = rays_d.reshape(rgb.shape)
        pts = (ro + rd * depth_sur).reshape(-1, 3)
        rot_inv = kwargs.get('model_rot_inv')
        if rot_inv is not None:
            sh = rotate_sh_by_recalc(self.sh_ray_dirs[0], self.cubemap_rgb,
                                     rot_inv)
            smap = soft_shadow_map(self.sf, model_pos, model_r, sh, pts,
                                   rot_inv)
        else:
            smap = soft_shadow_map(self.sf, model_pos, model_r, model_sh9,
                                   pts)
        return rgb * smap.reshape(rgb.shape[0], rgb.shape[1], 1)

    def shadow_cast(self, rays_o, rays_d, rgb, depth_sur, VP, tex_size,
                    s_map, model_r):
        """Rasterized shadow-map projection (reference main.py:450-474)."""
        ro = rays_o.reshape(rgb.shape)
        rd = rays_d.reshape(rgb.shape)
        pts = (ro + rd * depth_sur).reshape(-1, 3)
        pts_h = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], -1)
        ras = (VP @ pts_h.T).T
        ras = ras.at[:, :3].divide(ras[:, 3:4])
        rx = jnp.clip(((ras[:, 0] + 1) / 2 * tex_size).astype(jnp.int32),
                      0, tex_size - 1)
        ry = jnp.clip(((-ras[:, 1] + 1) / 2 * tex_size).astype(jnp.int32),
                      0, tex_size - 1)
        rz = 0.5 * (ras[:, 2] + 1)
        shadow_dis = rz - s_map[ry, rx, 0]
        shadow_d = jnp.clip((shadow_dis / (model_r * 50)) ** 2, 0.2, 1.0)
        smap = jnp.where(shadow_dis < 0, 1.0, shadow_d)
        smap = smap.reshape(rgb.shape[0], rgb.shape[1], 1)
        return rgb * _blur_hw1(smap, 9)

    def ssdf_shadow(self, rays_o, rays_d, rgb, depth_sur, l_sgs, **kwargs):
        model_r = kwargs.get('model_radius')
        model_pos = kwargs.get('model_pos')
        if model_r is None or model_pos is None:
            print('Use ssdf shadow, but infos not complete!')
            return rgb
        ro = rays_o.reshape(rgb.shape)
        rd = rays_d.reshape(rgb.shape)
        pts = (ro + rd * depth_sur).reshape(-1, 3)
        rot_inv = kwargs.get('model_rot_inv')
        if rot_inv is not None:
            l_rot = l_sgs.at[:, :3].set((rot_inv @ l_sgs[:, :3].T).T)
            smap = self.sg_shadow.calc_shadow_factor(
                model_r, pts, model_pos, l_rot, rot_inv)
        else:
            smap = self.sg_shadow.calc_shadow_factor(
                model_r, pts, model_pos, l_sgs)
        smap = smap.reshape(rgb.shape[0], rgb.shape[1], 1)
        return rgb * _blur_hw1(smap, 3)

    # -- object render + composite (reference main.py:521-684) -------------

    def render_object(self, model_bbox_cur, normals, depths, sh_or_sg, pose,
                      metal=0.9, rough=0.2, albedo=None, use_sg_base=True,
                      sg_use_self_shadow=True, **kwargs):
        """PBR-shade the inserted object's pixels inside its screen bbox.
        The reference masks pixels with boolean indexing; here shading runs
        on the full bbox and the depth mask multiplies at the end (fixed
        shapes per bbox)."""
        mask = (depths > 1e-6).reshape(-1, 1)
        n_pix = mask.shape[0]
        normal_px = normals.reshape(-1, 3)
        if albedo is None:
            albedo_px = jnp.ones((n_pix, 3))
        elif np.shape(albedo)[0] == 1:
            albedo_px = jnp.broadcast_to(jnp.asarray(albedo), (n_pix, 3))
        else:
            albedo_px = jnp.asarray(albedo).reshape(-1, 3)
        metal_px = jnp.full((n_pix, 1), metal) if np.isscalar(metal) \
            else jnp.asarray(metal).reshape(-1, 1)
        rough_px = jnp.full((n_pix, 1), rough) if np.isscalar(rough) \
            else jnp.clip(jnp.asarray(rough).reshape(-1, 1), 0.2, 1.0)

        (hs, ws), (hl, wl) = model_bbox_cur
        height, width = hl - hs, wl - ws
        rays_o, rays_d = get_rays(
            self.directions[hs:hl, ws:wl].reshape(-1, 3), jnp.asarray(pose))
        vdirs = normalize(rays_d)

        clamp01 = not self.hparams.render_HDR_mapping
        if use_sg_base:
            l_sgs = sh_or_sg
            if sg_use_self_shadow:
                pts = rays_o + depths.reshape(-1, 1) * vdirs
                l_sgs = self.sg_shadow.calc_self_shadow_light_decay(
                    kwargs.get('model_radius'), pts, kwargs.get('model_pos'),
                    sh_or_sg, kwargs.get('model_rot_inv'))
            cols = sg_render_core(albedo_px, metal_px, rough_px, normal_px,
                                  vdirs, l_sgs, clamp01, sg_use_self_shadow,
                                  self.cubemap_rgb)
        else:
            sh9 = jnp.broadcast_to(sh_or_sg, (n_pix, SH_ORDER ** 2, 3))
            cols = sh_render_core(albedo_px, metal_px, rough_px, normal_px,
                                  vdirs, sh9, self.embed_fn_v,
                                  self.model_brdf, clamp01, self.cubemap_rgb)
        cols = cols * mask

        render_res = jnp.zeros((self.H, self.W, 3))
        render_res = render_res.at[hs:hl, ws:wl].set(
            cols.reshape(height, width, 3))
        depth_t = jnp.zeros((self.H, self.W))
        depth_t = depth_t.at[hs:hl, ws:wl].set(
            depths.reshape(height, width))
        return render_res, depth_t

    def get_update_range(self, bbox_cur, bbox_last):
        if bbox_last is None or bbox_cur is None:
            return self.screen_bound
        return [[min(bbox_cur[0][0], bbox_last[0][0]),
                 min(bbox_cur[0][1], bbox_last[0][1])],
                [max(bbox_cur[1][0], bbox_last[1][0]),
                 max(bbox_cur[1][1], bbox_last[1][1])]]

    def render_insert_object(self, normals, depths, pose, sh_or_sg,
                             metal=0.9, rough=0.2, albedo=None,
                             full_return=False, use_sg_base=True,
                             sg_use_self_shadow=True, **kwargs):
        """Object render + incremental (dirty-rect) NeRF recomposite +
        shadow application (reference main.py:620-684).

        Serving frames (baked field, LDR, scalar material) run as ONE
        fused program (_try_render_insert_fused, VERDICT r4 #3); every
        other configuration keeps this general multi-stage path."""
        if not full_return:
            out = self._try_render_insert_fused(
                normals, depths, pose, sh_or_sg, metal, rough, albedo,
                use_sg_base, sg_use_self_shadow, kwargs)
            if out is not None:
                return out
        model_bbox = kwargs.get('model_bbox')
        model_bbox_last = kwargs.get('model_bbox_last')
        render_res, depth_t = self.render_object(
            model_bbox, normals, depths, sh_or_sg, pose, metal, rough,
            albedo, use_sg_base, sg_use_self_shadow, **kwargs)

        (hs, ws), (hl, wl) = self.get_update_range(model_bbox,
                                                   model_bbox_last)
        height, width = hl - hs, wl - ws
        rays_o, rays_d = get_rays(
            self.directions[hs:hl, ws:wl].reshape(-1, 3), jnp.asarray(pose))
        im_bkg = render_res[hs:hl, ws:wl].reshape(-1, 3)
        mesh_depth = depth_t[hs:hl, ws:wl].reshape(-1)
        if self.use_baked and not self.hparams.use_EXR:
            # per-frame serving render on the baked field (same gates as
            # probe acceleration; the network path below stays the
            # reference-exact fallback)
            rgb, depth_sur = self._render_scene_baked(rays_o, rays_d,
                                                      im_bkg, mesh_depth)
        else:
            kwargs_r = {'IM_bkg': im_bkg, 'mesh_depth_map': mesh_depth}
            if self.hparams.use_EXR:
                kwargs_r['output_radiance'] = True
            rgb, depth_sur = self.render(rays_o, rays_d, **kwargs_r)
        rgb = rgb.reshape(height, width, 3)
        depth_sur = depth_sur.reshape(height, width, 1)
        if self.last_rgb is not None:
            self.last_rgb = self.last_rgb.at[hs:hl, ws:wl].set(rgb)
            self.last_depth = self.last_depth.at[hs:hl, ws:wl].set(depth_sur)
        else:
            self.last_rgb = jnp.zeros((self.H, self.W, 3)).at[
                hs:hl, ws:wl].set(rgb)
            self.last_depth = jnp.zeros((self.H, self.W, 1)).at[
                hs:hl, ws:wl].set(depth_sur)
        rgb = self.last_rgb
        depth_sur = self.last_depth

        gen_shadow = kwargs.get('gen_shadow', 0)
        if gen_shadow:
            rays_o, rays_d = get_rays(self.directions.reshape(-1, 3),
                                      jnp.asarray(pose))
            if gen_shadow == 2:
                rgb = self.shadow_cast(rays_o, rays_d, rgb, depth_sur,
                                       kwargs.get('s_VP'),
                                       kwargs.get('s_texSize'),
                                       kwargs.get('s_im'),
                                       kwargs.get('model_radius'))
            elif use_sg_base:
                rgb = self.ssdf_shadow(rays_o, rays_d, rgb, depth_sur,
                                       sh_or_sg, **kwargs)
            else:
                rgb = self.shadow_field(rays_o, rays_d, rgb, depth_sur,
                                        sh_or_sg, **kwargs)

        rgb_final = rgb
        if self.hparams.render_HDR_mapping:
            rgb_final = tonemapping_simple(rgb_final)
        rgb_final = np.asarray(rgb_final)
        if full_return:
            return rgb_final, rgb, depth_t, render_res
        return rgb_final


class NGPServer:
    """TCP protocol with the external viewer — 14 actions
    (reference insert/main.py:687-1191)."""

    def __init__(self, insertor: NGPInsertor, record=False):
        self.insertor = insertor
        self.use_sg_base = True
        self.sg_use_self_shadow = True
        self.server = Server('127.0.0.1', 5001)
        HWF = [insertor.H, insertor.W, float(insertor.K[0, 0])]
        self.server.send(struct.pack('iif', *HWF))
        self.server.send(np.asarray(insertor.blender_trans,
                                    np.float32).tobytes())
        self.server.send(struct.pack('f', insertor.blender_scale))
        print('H,W,F for current scene is:', HWF)
        self.act_dict = {
            1: self.probe_pos_decoder,
            2: self.cam_pose_decoder,
            3: self.map_decoder,
            4: self.material_decoder,
            5: self.shadow_field_decoder,
            6: self.render,
            7: self.shadow_map_decoder,
            8: self.shadow_path_decoder,
            9: self.ssdf_path_decoder,
            10: self.sg_use_sshadow,
            11: self.cmp_methods_decoder,
            12: self.run_decomposition_cmp_decoder,
            13: self.update_save_index_decoder,
            14: self.sg_shadow_facs_decoder,
        }
        self.cam_pose = None
        self.normal = None
        self.depth = None
        self.sh = None
        self.sg = None
        self.fixed_lighting = False
        self.shadow_mode = 0
        self.model_pos = None
        self.model_radius = None
        self.model_rot_inv = None
        self.model_bbox = None
        self.model_bbox_last = None
        self.pose_last = None
        self.s_texSize = None
        self.s_VP = None
        self.s_im = None
        self.render_num = 0
        self.last_render_num = -1
        self.save_idx = 0
        self.metal = 0.9
        self.rough = 0.2
        self.albedo = None
        self.dt = 0
        self.vw = None
        self.display = os.environ.get('DISPLAY') is not None
        if record:
            import cv2
            video_path = os.path.join(insertor.gen_path, 'video.avi')
            fourcc = cv2.VideoWriter_fourcc(*'XVID')
            self.vw = cv2.VideoWriter(video_path, fourcc, 10.0,
                                      (insertor.W, insertor.H), True)

    # -- decoders ----------------------------------------------------------

    def main_direction_light_sender(self):
        """reference main.py:758-768 (hard-codes a light anchor point)."""
        t = jnp.asarray([0.194, -0.165, -0.270]) - self.model_pos
        self.main_light = normalize(t.reshape(1, 3))
        self.server.send(np.asarray(self.main_light,
                                    np.float32).tobytes())

    def sg_light_sender(self):
        self.server.send(np.asarray(self.sg, np.float32).tobytes())

    def probe_pos_decoder(self, buf):
        """Action 1: object moved -> regenerate the light probe
        (reference main.py:774-801)."""
        if self.last_render_num < self.render_num:
            self.last_render_num = self.render_num
        else:
            self.model_bbox_last = None
        self.shadow_mode, px, py, pz = struct.unpack('ifff', buf[:16])
        self.model_rot_inv = jnp.asarray(
            np.frombuffer(buf[16:], np.float32).reshape(3, 3).T.copy())
        self.model_pos = jnp.asarray([px, py, pz])
        if self.use_sg_base:
            if not self.fixed_lighting:
                self.sg = trans_raw_sg(
                    self.insertor.generate_probe(self.model_pos, False))
        else:
            if not self.fixed_lighting:
                self.sh = self.insertor.generate_probe(self.model_pos, True)
        if self.shadow_mode == 2:
            self.main_direction_light_sender()

    def cam_pose_decoder(self, buf):
        """Action 2: GL camera pose -> NeRF convention flip
        (reference main.py:803-807)."""
        pose = np.array(struct.unpack('f' * 16, buf),
                        np.float32).reshape(4, 4)[:3]
        pose = np.stack([pose[:, 0], -pose[:, 1], -pose[:, 2], pose[:, 3]],
                        -1)
        self.cam_pose = jnp.asarray(pose)

    def map_decoder(self, buf):
        """Action 3: object raster maps (normal/depth [+SV-BRDF]) + bbox
        (reference main.py:817-846)."""
        self.model_radius, hs, ws, hl, wl = struct.unpack('fiiii', buf[:20])
        self.model_bbox_last = self.model_bbox
        self.model_bbox = [[hs, ws], [hl, wl]]
        H, W = hl - hs, wl - ws
        im = np.frombuffer(buf[20:], np.float32)
        if im.shape[0] > H * W * 4:  # SV-BRDF maps
            px = H * W * 3
            normal = im[:px].reshape(H, W, 3)
            albedo = im[px:2 * px].reshape(H, W, 3)
            dmr = im[2 * px:].reshape(H, W, 3)
            self.normal = jnp.asarray(normal[::-1].copy())
            self.depth = jnp.asarray(dmr[::-1, :, 0].copy())
            self.albedo = jnp.asarray(albedo[::-1].copy())
            self.metal = jnp.asarray(dmr[::-1, :, 1].copy())
            self.rough = jnp.asarray(dmr[::-1, :, 2].copy())
        else:
            im = im.reshape(H, W, 4)
            self.normal = jnp.asarray(im[::-1, :, :3].copy())
            self.depth = jnp.asarray(im[::-1, :, 3].copy())

    def material_decoder(self, buf):
        """Action 4 (reference main.py:848-850)."""
        self.rough, self.metal, r, g, b = struct.unpack('fffff', buf)
        self.albedo = jnp.asarray([[r, g, b]])

    def shadow_field_decoder(self, buf):
        """Action 5 (reference main.py:852-855)."""
        r, hmin, wmin, hmax, wmax = struct.unpack('fiiii', buf)
        self.model_radius = r
        self.model_bbox = [[hmin, wmin], [hmax, wmax]]

    def shadow_map_decoder(self, buf):
        """Action 7: rasterized shadow map (reference main.py:857-867)."""
        tex_size = struct.unpack('i', buf[:4])[0]
        s_vp = np.array(struct.unpack('f' * 16, buf[4:68]),
                        np.float32).reshape(4, 4)
        s_im = np.frombuffer(buf[68:], np.float32).reshape(
            tex_size, tex_size, 1)
        self.s_texSize = tex_size
        self.s_VP = jnp.asarray(s_vp)
        self.s_im = jnp.asarray(s_im[::-1].copy())

    def shadow_path_decoder(self, buf):
        """Action 8: load a mesh's shadow-field volume; switches to the SH
        pipeline (reference main.py:869-879)."""
        model_name = buf.decode()
        sf_dir = os.path.join(self.insertor.gen_path, 'model_data')
        os.makedirs(sf_dir, exist_ok=True)
        sf_path = os.path.join(sf_dir, model_name + '.npz')
        if not os.path.exists(sf_path):
            raw = os.path.join(os.environ.get('VIEWER_SF_PATH', '.'),
                               model_name + '.txt')
            transform_sf_txt(raw, sf_path)
        self.insertor.set_sf(sf_path)
        self.use_sg_base = False

    def ssdf_path_decoder(self, buf):
        """Action 9: load the mesh's SG-SSDF PCA volume; switches to the SG
        pipeline (reference main.py:881-888)."""
        model_name = buf.decode()
        sg_path = os.path.join(os.environ.get('VIEWER_SG_PATH', '.'),
                               model_name + '.tar')
        self.insertor.set_sg_shadow(sg_path)
        self.use_sg_base = True

    def sg_use_sshadow(self, buf):
        """Action 10 (reference main.py:989-995)."""
        self.sg_use_self_shadow = struct.unpack('i', buf)[0] == 1

    def sg_shadow_facs_decoder(self, buf):
        """Action 14 (reference main.py:1106-1110)."""
        ins = self.insertor.sg_shadow
        (ins.delta_angle_decay_fac, ins.delta_shadow_fac,
         ins.delta_self_shadow_fac) = struct.unpack('fff', buf)

    def update_save_index_decoder(self, buf):
        """Action 13 (reference main.py:1097-1104)."""
        import glob as _glob
        import shutil
        results = os.path.join(self.insertor.gen_path, 'results')
        cmp_path = os.path.join(results, f'cmp{self.save_idx}')
        try:
            os.mkdir(cmp_path)
            for f in _glob.glob(os.path.join(results,
                                             f'{self.save_idx}_*')):
                shutil.move(f, cmp_path)
        except OSError:
            print(f'{cmp_path} exists, auto organize close')
        self.save_idx = struct.unpack('i', buf)[0]

    def cmp_methods_decoder(self, buf):
        """Action 11: comparisons against external lighting estimators —
        requires their result files (reference main.py:933-986); gated."""
        print('cmp_methods: external IRAdobe/EMLight results not available '
              'in this environment; skipping')

    # -- rendering actions -------------------------------------------------

    def _render_kwargs(self):
        kwargs = {}
        if self.model_radius is not None:
            kwargs = {'model_radius': self.model_radius,
                      'model_pos': self.model_pos,
                      'model_bbox': self.model_bbox,
                      'model_bbox_last': self.model_bbox_last,
                      'gen_shadow': self.shadow_mode}
        if self.s_texSize is not None:
            kwargs.update({'s_texSize': self.s_texSize, 's_VP': self.s_VP,
                           's_im': self.s_im})
        if USE_STD_SF:
            kwargs['model_rot_inv'] = self.model_rot_inv
        return kwargs

    def save_results(self, buf, **kwargs):
        """reference main.py:997-1024."""
        import cv2
        is_save_infos = struct.unpack('i', buf[:4])[0]
        save_prefix = buf[4:].decode()
        results_path = os.path.join(self.insertor.gen_path, 'results')
        rgb, rgb_hdr, obj_depth, obj_render = \
            self.insertor.render_insert_object(
                self.normal, self.depth, self.cam_pose,
                self.sg if self.use_sg_base else self.sh,
                self.metal, self.rough, self.albedo, True,
                self.use_sg_base, self.sg_use_self_shadow, **kwargs)
        res = (np.clip(rgb, 0, 1) * 255).astype('uint8')
        cv2.imwrite(os.path.join(results_path,
                                 f'{self.save_idx}_{save_prefix}.png'),
                    cv2.cvtColor(res, cv2.COLOR_RGB2BGR))
        try:
            ok = cv2.imwrite(os.path.join(
                results_path, f'{self.save_idx}_{save_prefix}.exr'),
                np.asarray(rgb_hdr)[..., ::-1])
        except cv2.error:
            ok = False
        if not ok:  # this image's cv2 lacks an EXR writer -> native OpenEXR
            from ..native import write_exr
            write_exr(os.path.join(
                results_path, f'{self.save_idx}_{save_prefix}.exr'),
                np.asarray(rgb_hdr))
        if is_save_infos == 1:
            np.savez(os.path.join(results_path,
                                  f'{self.save_idx}_info.npz'),
                     rgb_HDR=np.asarray(rgb_hdr),
                     obj_depth=np.asarray(obj_depth),
                     obj_render=np.asarray(obj_render))
            print(f'Current render result saved with id: {self.save_idx}')
        return rgb

    def run_decomposition_cmp_decoder(self, buf):
        """Action 12: decomposition ablations (reference main.py:1027-1095)."""
        import cv2
        results_path = os.path.join(self.insertor.gen_path, 'results')

        def to_im(im):
            im = tonemapping_simple(im)
            return cv2.cvtColor(
                (np.clip(np.asarray(im), 0, 1) * 255).astype(np.uint8),
                cv2.COLOR_RGB2BGR)

        sg_map = to_im(sg2envmap(self.sg, 256, 512)[::-1, ::-1])
        cv2.imwrite(os.path.join(results_path,
                                 f'{self.save_idx}_nerf_SG.png'), sg_map)

        sd, ssd = self.shadow_mode, self.sg_use_self_shadow
        self.shadow_mode = 0
        self.sg_use_self_shadow = False
        self.render(struct.pack('i', 0) + b'nerf_no_any_shadow')
        self.shadow_mode = 1
        self.render(struct.pack('i', 0) + b'nerf_no_self_shadow')
        self.sg_use_self_shadow = True

        if self.insertor.global_sh is not None:
            gsh = self.insertor.global_sh
            n_iter = self.insertor.env_opt.n_iter
            self.insertor.env_opt.n_iter = 450
            self.insertor.global_sh = jnp.zeros_like(gsh)
            self.sg = trans_raw_sg(
                self.insertor.generate_probe(self.model_pos, False))
            self.render(struct.pack('i', 0) + b'nerf_no_globalSH')
            self.insertor.global_sh = gsh
            self.insertor.env_opt.n_iter = n_iter
            sh_env = to_im(sh2envmap(gsh[0], 256, 512)[::-1, ::-1])
            cv2.imwrite(os.path.join(results_path,
                                     f'{self.save_idx}_globalSH.png'),
                        sh_env)
        self.shadow_mode, self.sg_use_self_shadow = sd, ssd

    def render(self, buf):
        """Action 6 (reference main.py:1113-1178)."""
        t_s = time.time()
        if self.pose_last is not None and self.cam_pose is not None:
            if float(jnp.sum(jnp.abs(self.cam_pose - self.pose_last))) > 1e-6:
                self.model_bbox_last = None
        self.pose_last = self.cam_pose

        if self.normal is None or self.depth is None or \
                (self.sh is None and self.sg is None):
            if self.cam_pose is None:
                print('Error: render info not complete')
                rgb = None
            else:
                rgb, _, _, _ = self.insertor.render_pose(self.cam_pose)
        else:
            kwargs = self._render_kwargs()
            if len(buf) != 0:
                rgb = self.save_results(buf, **kwargs)
            else:
                rgb = self.insertor.render_insert_object(
                    self.normal, self.depth, self.cam_pose,
                    self.sg if self.use_sg_base else self.sh,
                    self.metal, self.rough, self.albedo, False,
                    self.use_sg_base, self.sg_use_self_shadow, **kwargs)
        if rgb is not None:
            self._display(rgb)
        self.dt = time.time() - t_s
        self.render_num += 1
        try:
            self.server.send(struct.pack('i', 0))  # render complete
        except Exception:
            pass

    def _display(self, rgb):
        if self.vw is not None:
            import cv2
            self.vw.write(cv2.cvtColor((np.clip(rgb, 0, 1) * 255)
                                       .astype('uint8'), cv2.COLOR_RGB2BGR))
        if self.display:
            try:
                import cv2
                cv2.imshow('render', cv2.cvtColor(
                    np.asarray(rgb, np.float32), cv2.COLOR_RGB2BGR))
                cv2.waitKey(1)
            except Exception:
                self.display = False

    def run(self):
        while True:
            buf = self.server.receive()
            if buf == b'':
                break
            action = int.from_bytes(buf[:4], 'little')
            if action == 0:
                break
            self.act_dict[action](buf[4:])

    def __del__(self):
        if self.vw is not None:
            self.vw.release()


def main():
    from ..opt import get_opts
    hparams = get_opts()
    insertor = NGPInsertor(hparams)
    insertor.generate_point_cloud()
    if not hparams.no_global_SH:
        insertor.train_global_sh_light()
    NGPServer(insertor, False).run()


if __name__ == '__main__':
    main()
