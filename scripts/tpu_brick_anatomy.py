#!/usr/bin/env python
"""Round-5 chip probe: brick-marching frame anatomy + knob sweep.

Loads the bench race checkpoint (/tmp/bench_ar_ckpt.npz), bakes once
(cached to /tmp/r5_baked_cache.npz across runs), then measures the
800x800 slab frame on device:

  1. dist_skip OFF vs ON (the round-5 empty-space skip riding lane 512)
  2. phase-compaction knobs (phase_ratio / phase_floor / phase_max)
  3. per-phase rounds + survivor counts (where the gather rows go)

Usage: python scripts/tpu_brick_anatomy.py [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CACHE = "/tmp/r5_baked_cache.npz"
CKPT = "/tmp/bench_ar_ckpt.npz"


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import (SyntheticDataset,
                                               SyntheticConfig)
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.rendering_baked import (
        BakedField, bake_ngp, cull_and_buckets, render_baked_bricks,
        brick_render_args)

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)

    scfg = SyntheticConfig(img_wh=(256, 256), n_train=100, n_test=2,
                           gt_samples=512)

    if os.path.exists(CACHE):
        print("probe: loading cached bake", flush=True)
        z = np.load(CACHE)
        baked = BakedField(
            rows=jnp.zeros((1, 32), jnp.float32),   # unused with rows_q
            resolution=int(z["resolution"]), scale=float(z["scale"]),
            aabb_lo=jnp.asarray(z["aabb_lo"]), aabb_hi=jnp.asarray(z["aabb_hi"]),
            mip=jnp.asarray(z["mip"]), mip_dist=jnp.asarray(z["mip_dist"]),
            sigma_bricks=jnp.asarray(z["sigma_bricks"]),
            row_index=jnp.asarray(z["row_index"]),
            rows_q=jnp.asarray(z["rows_q"]))
    else:
        blob = np.load("/tmp/arnerf_bench_data_256_100.npz")
        train_ds = SyntheticDataset(split="train", config=scfg,
                                    read_meta=False)
        test_ds = SyntheticDataset(split="test", config=scfg,
                                   read_meta=False)
        train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]
        cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16",
                        stoch_corners=True)
        tc = TrainConfig(batch_size=8192,
                         loss=NeRFLossConfig(grid_scale=0.5))
        tr = NeRFTrainer(cfg, tc, train_ds, test_ds,
                         key=jax.random.PRNGKey(0))
        tr.load(CKPT)
        print("probe: baking 256^3...", flush=True)
        t0 = time.time()
        baked = bake_ngp(tr.model_params, tr.grid_state, cfg,
                         resolution=256, n_dirs=16)
        float(jnp.sum(baked.mip.astype(jnp.float32)))
        print(f"probe: bake {time.time() - t0:.1f}s", flush=True)
        np.savez(CACHE, resolution=baked.resolution, scale=baked.scale,
                 aabb_lo=np.asarray(baked.aabb_lo),
                 aabb_hi=np.asarray(baked.aabb_hi),
                 mip=np.asarray(baked.mip),
                 mip_dist=np.asarray(baked.mip_dist),
                 sigma_bricks=np.asarray(baked.sigma_bricks),
                 row_index=np.asarray(baked.row_index),
                 rows_q=np.asarray(baked.rows_q))

    # 800x800 GUI-spec rays at the bench camera (test pose 0)
    test_ds = SyntheticDataset(split="test", config=scfg, read_meta=True)
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    rays_o, rays_d = get_rays(dirs800, jnp.asarray(test_ds.poses[0]))

    buckets, _, blocked = cull_and_buckets(baked, rays_o, rays_d, 1 << 18,
                                           img_wh=(800, 800))
    print("buckets:", [(n, ro.shape[0]) for _, ro, rd, n in buckets],
          "blocked:", blocked, flush=True)
    dt_b, K_b = brick_render_args(baked, 128)
    print(f"dt={dt_b} K={K_b}", flush=True)

    def frame_fn(key, **kw):
        outs = []
        for sl, ro, rd, n in buckets:
            res = render_baked_bricks(
                baked.sigma_bricks, baked.rows, baked.row_index,
                baked.rows_q, baked.mip, baked.aabb_lo, baked.aabb_hi,
                ro, rd, key, B=baked.resolution, scale=baked.scale,
                dt=dt_b, K=K_b, T_threshold=1e-2, color_window=4,
                block4=blocked, **kw)
            outs.append(res)
        return outs

    def sync(outs):
        return float(sum(jnp.sum(o["rgb"]) for o in outs))

    configs = [
        ("skip_off", dict(dist_skip=False)),
        ("skip_on", dict(dist_skip=True)),
        ("skip_on r1.5", dict(dist_skip=True, phase_ratio=1.5,
                              phase_max=10)),
        ("skip_on r1.5 fl1024", dict(dist_skip=True, phase_ratio=1.5,
                                     phase_max=12, phase_floor=1024)),
        ("skip_on fl1024", dict(dist_skip=True, phase_max=9,
                                phase_floor=1024)),
    ]
    keys = list(jax.random.split(jax.random.PRNGKey(3), n_frames + 1))
    for name, kw in configs:
        outs = frame_fn(keys[0], **kw)
        sync(outs)
        t0 = time.time()
        for k in keys[1:]:
            outs = frame_fn(k, **kw)
        sync(outs)
        dtm = (time.time() - t0) / n_frames
        diag = [(np.asarray(o["phase_sizes"]).tolist(),
                 np.asarray(o["phase_rounds"]).tolist(),
                 np.asarray(o["phase_alive"]).tolist(),
                 int(o["n_prelude_alive"])) for o in outs]
        rows_m = sum(
            sum(s * r for s, r in zip(d[0], d[1])) for d in diag) / 1e6
        print(f"{name}: {dtm * 1e3:.0f} ms/frame ({1.0 / dtm:.2f} FPS), "
              f"gather rows {rows_m:.1f}M", flush=True)
        for d in diag:
            print(f"   sizes {d[0]} rounds {d[1]} alive {d[2]} "
                  f"prelude {d[3]}", flush=True)


if __name__ == "__main__":
    main()
