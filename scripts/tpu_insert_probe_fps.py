"""AR serving hot-loop timing on the real chip: probe generation and the
dirty-rect frame render, network path vs baked path (ARNERF_INSERT_BAKED).

The reference publishes no AR-stage numbers (SURVEY §6); probe generation
is its serving hot loop — every object move renders 1-6k rays through the
renderer (reference insert/main.py:306-407, §3.4). This script measures
probes/s and dirty-rect frames/s both ways on the procedural scene, using
the quality-run checkpoint when present (else a random-init field with a
sphere occupancy — timing-valid either way, the row counts don't depend
on the values).

Usage: python scripts/tpu_insert_probe_fps.py [ckpt] [bake_res]
"""

import os
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_hparams(ckpt):
    return types.SimpleNamespace(
        root_dir="", dataset_name="synthetic", split="train", downsample=1.0,
        scale=0.5, use_exposure=False, use_EXR=False,
        distortion_loss_w=0, depth_loss_w=0, loss_func="raw",
        batch_size=8192, ray_sampling_strategy="all_images", num_epochs=1,
        num_gpus=1, lr=1e-2, optimize_ext=False, random_bg=False,
        val_batch_size=2 ** 20, eval_lpips=False, val_only=False,
        no_save_test=True, exp_name="probe_fps", ckpt_path=ckpt,
        weight_path=None, low_resolution=2.0, max_pc_pts_num=int(1e4),
        no_global_SH=False, train_SH_HDR_mapping=False,
        gen_probe_HDR_mapping=False, render_HDR_mapping=False)


def device_sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.max(jnp.abs(jnp.asarray(leaf))).astype(jnp.float32))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quality_run_ckpt.npz"
    bake_res = sys.argv[2] if len(sys.argv) > 2 else "192"
    if not os.path.exists(ckpt):
        print(f"no ckpt at {ckpt}; using random-init field")
        ckpt = None
    os.environ["ARNERF_INSERT_BAKE_RES"] = bake_res

    from arnerf_tpu.datasets.synthetic import SyntheticConfig
    import arnerf_tpu.datasets as dsets
    orig = dsets.dataset_dict["synthetic"]
    dsets.dataset_dict["synthetic"] = lambda **kw: orig(
        config=SyntheticConfig(img_wh=(256, 256), n_train=2, n_test=1,
                               gt_samples=32), **kw)
    from arnerf_tpu.insert.main import NGPInsertor
    ins = NGPInsertor(make_hparams(ckpt))
    dsets.dataset_dict["synthetic"] = orig
    if ckpt is None:
        from arnerf_tpu.models import grid_state_init
        gs = grid_state_init(ins.cfg)
        G = ins.cfg.grid_size
        g = (np.arange(G) + 0.5) / G * 2 - 1
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        occ = (np.sqrt(X**2 + Y**2 + Z**2) < 0.6).astype(np.uint8)
        ins.grid_state = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))

    pt = jnp.asarray([0.0, 0.0, 0.1])
    H = W = 32
    bbox = [[40, 40], [40 + H, 40 + W]]
    rng = np.random.default_rng(1)
    normals = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    depths = jnp.full((H, W), 1.0, jnp.float32)
    pose = jnp.asarray(ins.dataset.poses[0])

    def time_mode(label):
        # probes (action 1): one SH probe per object move
        sh = ins.generate_probe(pt, sh_probe=True)       # compile/bake
        device_sync(sh)
        t0 = time.time()
        n = 5
        for i in range(n):
            sh = ins.generate_probe(pt + 0.01 * i, sh_probe=True)
        device_sync(sh)
        dt_probe = (time.time() - t0) / n
        # dirty-rect frame (action 6)
        ins.last_rgb = ins.last_depth = None
        out = ins.render_insert_object(
            normals, depths, pose, sh, full_return=False, use_sg_base=False,
            sg_use_self_shadow=False, model_bbox=bbox, model_bbox_last=None)
        # warm the TIMED rect shape too (the first call's full-frame rect
        # compiles a different program size)
        out = ins.render_insert_object(
            normals, depths, pose, sh, full_return=False, use_sg_base=False,
            sg_use_self_shadow=False, model_bbox=bbox, model_bbox_last=bbox)
        t0 = time.time()
        for _ in range(n):
            out = ins.render_insert_object(
                normals, depths, pose, sh, full_return=False,
                use_sg_base=False, sg_use_self_shadow=False,
                model_bbox=bbox, model_bbox_last=bbox)
        dt_frame = (time.time() - t0) / n
        print(f"{label}: probe {dt_probe*1e3:.0f} ms ({1/dt_probe:.2f}/s), "
              f"dirty-rect frame {dt_frame*1e3:.0f} ms "
              f"({1/dt_frame:.2f}/s)", flush=True)
        return dt_probe, dt_frame

    ins.use_baked = False
    p_net, f_net = time_mode("network")
    ins.use_baked = (ins.cfg.cascades == 1 and ins.cfg.rgb_act == "Sigmoid")
    t0 = time.time()
    ins._get_baked()
    print(f"bake ({bake_res}^3): {time.time()-t0:.1f}s", flush=True)
    p_bk, f_bk = time_mode("baked")
    print(f"speedup: probe {p_net/p_bk:.1f}x, frame {f_net/f_bk:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
