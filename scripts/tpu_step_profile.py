"""Round-3 TPU profile: full production train_block throughput with
stochastic-corner gathers, across sample budgets, plus the baked-path
bake/render timings — the two VERDICT-r2 perf targets (>=5 steps/s,
>=5 FPS baked, 256^3 bake <=60 s).

Timing discipline per DESIGN.md / utils/sync.py: scalar-fetch sync (no-op
block_until_ready through the tunnel), warmup iterations, mean over
chained dispatches.

Usage: python scripts/tpu_step_profile.py [--budgets 32,16,8] [--skip_baked]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def sync(x):
    """Scalar-reduce sync (utils/sync.py): fetching a whole leaf times the
    ~30 MB/s tunnel instead of the device."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def stream_gbps(iters=24):
    x = jax.random.normal(jax.random.PRNGKey(0), (1 << 15, 2048))
    f = jax.jit(lambda s: s * 2.0 + 1.0)
    sync(f(x))
    t0 = time.time()
    out = x
    for _ in range(iters):
        out = f(out)
    sync(out)
    dt = (time.time() - t0) / iters
    return (x.size * 4 * 2) / dt / 1e9


def main():
    budgets = [32, 16, 8]
    if "--budgets" in sys.argv:
        budgets = [int(v) for v in
                   sys.argv[sys.argv.index("--budgets") + 1].split(",")]
    print("devices:", jax.devices(), flush=True)
    print(f"window: {stream_gbps():.0f} GB/s", flush=True)

    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    import os

    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    cache = f"/tmp/arnerf_bench_data_{wh}.npz"
    if os.path.exists(cache):
        blob = np.load(cache)
        train_ds = SyntheticDataset(split="train", config=scfg,
                                    read_meta=False)
        test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
        train_ds.rays = blob["train_rays"]
        test_ds.rays = blob["test_rays"]
    else:
        train_ds = SyntheticDataset(split="train", config=scfg)
        test_ds = SyntheticDataset(split="test", config=scfg)
        np.savez(cache, train_rays=train_ds.rays, test_rays=test_ds.rays)

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    tc = TrainConfig(batch_size=8192, lr=1e-2, num_epochs=30,
                     steps_per_epoch=1000, warmup_steps=256,
                     adaptive_budget=False,
                     loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    tr.on_train_start()

    bs = tc.update_interval
    t0 = time.time()
    tr.train_block()
    sync(tr.params["hash_table"])
    print(f"first block (compile): {time.time() - t0:.1f} s", flush=True)
    # carve the grid: run to past warmup so steady state is representative
    while tr.step < tc.warmup_steps + bs:
        tr.train_block()
    sync(tr.params["hash_table"])

    from dataclasses import replace
    # marching A/B at each budget: per-ray path at the uncarved-worst-case
    # seg_cap 64 (round-2 production) vs the shared segment pool at mean
    # capacities 32 and 16 (march_rays_train_pooled — the round-3 path)
    variants = [("flat64", dict(seg_pool=False, seg_cap=64)),
                ("pool32", dict(seg_pool=True, seg_cap=32)),
                ("pool16", dict(seg_pool=True, seg_cap=16))]
    for budget in budgets:
        for vname, vkw in variants:
            tr.tc = replace(tr.tc, samples_per_ray_budget=budget, **vkw)
            tr._build_steps()
            tr.train_block()
            sync(tr.params["hash_table"])  # compile+warm
            best = 0.0
            for _ in range(3):
                t0 = time.time()
                for _ in range(4):
                    m = tr.train_block()
                sync(tr.params["hash_table"])
                best = max(best, 4 * bs / (time.time() - t0))
            print(f"budget {budget} {vname}: {best:.2f} steps/s "
                  f"({1e3 / best:.0f} ms/step) rm_s={float(m['rm_s']):.1f} "
                  f"nseg_avg={float(m.get('nseg_avg', 0)):.1f} "
                  f"psnr={float(m['psnr']):.1f}", flush=True)

    print(f"window now: {stream_gbps():.0f} GB/s", flush=True)

    if "--skip_baked" in sys.argv:
        return

    # ---- baked path: bake (stoch auto->on) + GUI-spec frames -------------
    from arnerf_tpu.rendering_baked import bake_ngp, render_baked
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions

    for B in (192, 256):
        t0 = time.time()
        baked = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=B,
                         n_dirs=16)
        sync(baked.rows)
        occ_frac = float(jnp.mean((baked.rows[:, 0] > 0).astype(jnp.float32)))
        print(f"bake {B}^3 stoch: {time.time() - t0:.1f} s "
              f"(occ {occ_frac:.2%})", flush=True)

    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    rays_o, rays_d = get_rays(dirs800, jnp.asarray(test_ds.poses[0]))
    res = render_baked(baked, tr.grid_state, rays_o, rays_d, cfg,
                       T_threshold=1e-2)
    sync(res["rgb"])
    t0 = time.time()
    nf = 4
    for i in range(nf):
        res = render_baked(baked, tr.grid_state, rays_o, rays_d, cfg,
                           key=jax.random.PRNGKey(i), T_threshold=1e-2)
        sync(res["rgb"])
    print(f"baked 800x800 (mip prelude): {nf / (time.time() - t0):.2f} FPS",
          flush=True)


if __name__ == "__main__":
    main()
