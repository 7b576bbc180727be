#!/usr/bin/env python
"""Round-5 chip A/B: hoisted block march vs in-step marching.

Marching is parameter-independent, so the fused 16-step block can march
every step in ONE batched pass before the scan (TrainConfig.march_hoist).
The selection sorts are pass-latency-bound at per-step sizes (a 262k-row
sort costs ~tens of ms while a 33.5M-row sort costs 156 ms — DESIGN.md),
so a (16, n)-batched sort should amortize them ~16x; gathers stay linear.
This measures the real block wall both ways at the bench shape.

Usage: python scripts/tpu_hoist_ab.py [n_blocks]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, \
        SyntheticConfig
    from arnerf_tpu.utils.sync import device_sync

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=1,
                           gt_samples=256)
    cache = f"/tmp/arnerf_hoist_data_{wh}.npz"
    import os
    if os.path.exists(cache):
        blob = np.load(cache)
        train_ds = SyntheticDataset(split="train", config=scfg,
                                    read_meta=False)
        train_ds.rays = blob["train_rays"]
    else:
        train_ds = SyntheticDataset(split="train", config=scfg)
        np.savez(cache, train_rays=train_ds.rays)

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    base_tc = TrainConfig(batch_size=8192, lr=1e-2, num_epochs=2,
                          steps_per_epoch=480, warmup_steps=256,
                          seg_cap=32, seg_pool=True,
                          samples_per_ray_budget=32,
                          adaptive_budget=False, stoch_anneal_frac=1.0,
                          loss=NeRFLossConfig(grid_scale=0.5,
                                              lambda_distortion=1e-3))

    results = {}
    for hoist in (False, True):
        tc = dataclasses.replace(base_tc, march_hoist=hoist)
        tr = NeRFTrainer(cfg, tc, train_ds, None,
                         key=jax.random.PRNGKey(0))
        tr.on_train_start()
        # carve the grid: warmup + some steps so shapes match production
        for _ in range(20):
            tr.train_block()
        device_sync(tr.params["hash_table"])
        t0 = time.time()
        for _ in range(n_blocks):
            m = tr.train_block()
        device_sync(tr.params["hash_table"])
        dt = (time.time() - t0) / (n_blocks * tc.update_interval)
        results[hoist] = dt
        print(f"hoist={hoist}: {dt * 1e3:.1f} ms/step "
              f"({1.0 / dt:.2f} steps/s), psnr {float(m['psnr']):.2f}, "
              f"rm_s {float(m['rm_s']):.1f}", flush=True)

    print(f"speedup: {results[False] / results[True]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
