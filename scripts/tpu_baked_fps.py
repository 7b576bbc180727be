#!/usr/bin/env python
"""TPU probe: interactive FPS of the baked-field renderer at the GUI spec.

Trains briefly (or resumes /tmp/quality_run_ckpt.npz if present), bakes the
field at the requested resolution, then times 800x800 frames with the
reference's GUI settings (T=1e-2; reference show_gui.py:86-88).

Usage: python scripts/tpu_baked_fps.py [bake_resolution] [frames]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.training.ckpt import load_ckpt
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.rendering_baked import bake_ngp, render_baked
    from arnerf_tpu.rendering import render_test
    from arnerf_tpu.utils.sync import device_sync

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    cache = f"/tmp/arnerf_bench_data_{wh}.npz"
    blob = np.load(cache)
    train_ds = SyntheticDataset(split="train", config=scfg, read_meta=False)
    test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
    train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16")
    tc = TrainConfig(batch_size=8192, loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    ck = "/tmp/quality_run_ckpt.npz"
    if os.path.exists(ck):
        print("probe: resuming quality ckpt", file=sys.stderr, flush=True)
        tr.load(ck)
    else:
        print("probe: training 512 steps", file=sys.stderr, flush=True)
        tr.fit(n_steps=512, log_every=256)

    t0 = time.time()
    print("probe: baking...", file=sys.stderr, flush=True)
    baked = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=B)
    device_sync(baked.rows)
    bake_s = time.time() - t0
    occ_frac = float((np.abs(np.asarray(
        baked.rows[:, 0], np.float32)) > 0).mean())
    print(f"probe: baked {B}^3 in {bake_s:.1f}s (occ {occ_frac:.3f})",
          file=sys.stderr, flush=True)

    # 800x800 GUI-spec rays
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    pose = jnp.asarray(test_ds.poses[0])
    rays_o, rays_d = get_rays(dirs800, pose)

    out = {"bake_s": round(bake_s, 1), "resolution": B, "occ_frac": occ_frac}
    # frame anatomy (DESIGN.md table): rays, buckets, prelude survivors,
    # rounds per bucket -> gather-row account
    stats = {}
    res = render_baked(baked, tr.grid_state, rays_o, rays_d, cfg,
                       interp="stochastic", T_threshold=1e-2, stats=stats,
                       img_wh=(800, 800))
    device_sync(res["rgb"])
    S = stats.get("samples_per_round", 16)
    fine_rows = sum(r * stats["bucket"] * S for r in stats["rounds"])
    out["anatomy"] = {
        "n_rays": stats["n_rays"], "n_aabb_hit": stats["n_aabb_hit"],
        "n_prelude_alive": stats["n_prelude_alive"],
        "dispatches": stats["dispatches"], "rounds": stats["rounds"],
        "fine_rows_upper_M": round(fine_rows / 1e6, 1)}
    print(f"probe: anatomy {out['anatomy']}", file=sys.stderr, flush=True)

    for interp in ("stochastic", "trilinear"):
        res = render_baked(baked, tr.grid_state, rays_o, rays_d, cfg,
                           interp=interp, T_threshold=1e-2,
                           img_wh=(800, 800))  # compile+warm
        device_sync(res["rgb"])
        t0 = time.time()
        for i in range(n_frames):
            res = render_baked(baked, tr.grid_state, rays_o, rays_d, cfg,
                               key=jax.random.PRNGKey(i), interp=interp,
                               T_threshold=1e-2, img_wh=(800, 800))
            device_sync(res["rgb"])
        fps = n_frames / (time.time() - t0)
        out[f"fps_{interp}"] = round(fps, 2)
        print(f"probe: {interp} {fps:.2f} FPS @800x800 (end-to-end)",
              file=sys.stderr, flush=True)

    # device-side FPS: bucket dispatches + one scalar sync (no tunnel
    # frame readback — see baked_frame_device_fn)
    from arnerf_tpu.rendering_baked import baked_frame_device_fn
    import jax.numpy as jnp
    frame = baked_frame_device_fn(baked, rays_o, rays_d, T_threshold=1e-2,
                                  img_wh=(800, 800))
    fkeys = list(jax.random.split(jax.random.PRNGKey(7), n_frames + 1))
    device_sync(frame(fkeys[0]))
    t0 = time.time()
    acc = jnp.float32(0.0)
    for k in fkeys[1:]:
        acc = acc + frame(k)
    device_sync(acc)
    out["fps_device"] = round(n_frames / (time.time() - t0), 2)
    print(f"probe: {out['fps_device']:.2f} FPS device-side",
          file=sys.stderr, flush=True)

    # quality cross-check vs the network renderer on a 256x256 test view
    dirs_t = jnp.asarray(test_ds.directions)
    ro_t, rd_t = get_rays(dirs_t, jnp.asarray(test_ds.poses[0]))
    net = render_test(tr.model_params, tr.grid_state, ro_t, rd_t, cfg,
                      T_threshold=1e-2, fast=True)
    bk = render_baked(baked, tr.grid_state, ro_t, rd_t, cfg,
                      interp="trilinear", T_threshold=1e-2)
    a = np.asarray(net["rgb"]) + (1 - np.asarray(net["opacity"]))[:, None]
    b = np.asarray(bk["rgb"]) + (1 - np.asarray(bk["opacity"]))[:, None]
    mse = float(np.mean((a - b) ** 2))
    out["baked_vs_network_psnr"] = round(-10 * np.log10(max(mse, 1e-10)), 2)
    gt = np.asarray(test_ds.rays[0][:, :3])
    mse_gt = float(np.mean((np.clip(b, 0, 1) - gt) ** 2))
    out["baked_vs_gt_psnr"] = round(-10 * np.log10(max(mse_gt, 1e-10)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
