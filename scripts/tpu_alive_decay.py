"""Round-4 probe: per-round alive decay of the baked fine loop, and WHY
survivors survive (low opacity vs un-exhausted span) — distinguishes the
'skimmer' hypothesis (rays grazing the dilated apron above the slab with
sigma=0 all the way: alive until t_end) from slow opacity saturation.

Runs bucket-0 of the slab frame with return_state at increasing
max_rounds and reports: n_alive, median remaining span (te - t_cur) of
the alive set, their opacity quantiles.

Usage: python scripts/tpu_alive_decay.py [bake_res]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.rendering_baked import (bake_ngp, cull_and_buckets,
                                            render_baked_uniform)
    from arnerf_tpu.utils.sync import device_sync

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    blob = np.load(f"/tmp/arnerf_bench_data_{wh}.npz")
    train_ds = SyntheticDataset(split="train", config=scfg, read_meta=False)
    test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
    train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    tc = TrainConfig(batch_size=8192, loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    tr.fit(n_steps=512, log_every=256)
    baked = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=B)
    device_sync(baked.rows)

    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    pose = jnp.asarray(test_ds.poses[0])
    rays_o, rays_d = get_rays(dirs800, pose)
    buckets, _, blocked = cull_and_buckets(baked, rays_o, rays_d, 1 << 18,
                                           img_wh=(800, 800))
    sl, ro, rd, n = buckets[0]
    print(f"bucket0: {ro.shape[0]} rays ({n} valid)", flush=True)

    kw = dict(B=baked.resolution, scale=baked.scale, T_threshold=1e-2,
              mip=baked.mip, sigma=baked.sigma, block4=blocked,
              row_index=baked.row_index, rows_q=baked.rows_q,
              mip_dist=baked.mip_dist, compact=False, return_state=True)
    for mr in (1, 2, 3, 4, 6, 8):
        res = render_baked_uniform(baked.rows, baked.aabb_lo, baked.aabb_hi,
                                   ro, rd, jax.random.PRNGKey(0),
                                   max_rounds=mr, **kw)
        t_cur, opa, dep, rgb, alive, sd = [np.asarray(x)
                                           for x in res["state"]]
        na = int(alive.sum())
        if na:
            # remaining span uses the state's t2 clamp implicitly: report
            # t_cur and opacity of the alive set
            o_alive = opa[alive]
            print(f"rounds {mr}: alive {na} "
                  f"({100 * na / max(n, 1):.1f}% of valid) | alive opacity "
                  f"q50/q90 {np.quantile(o_alive, .5):.3f}/"
                  f"{np.quantile(o_alive, .9):.3f} | "
                  f"opaque(>=0.99) {int((opa >= 0.99).sum())}", flush=True)
        else:
            print(f"rounds {mr}: alive 0", flush=True)


if __name__ == "__main__":
    main()
