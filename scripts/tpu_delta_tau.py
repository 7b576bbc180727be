#!/usr/bin/env python
"""Round-5 probe: calibrate the delta-bake change threshold tau.

BENCH_r05-dev measured the delta bake re-evaluating 100% of voxels after
ONE 16-step block — tau=0.05 sits below the noise floor of a single EMA
update with stochastic single-corner density draws (EMA moves by
0.05 * |draw - old|, and the draw spread is O(100%) of the mean).

This probe: full bake -> N consecutive [16-step block -> delta bake]
cycles, printing (a) the host-side moved-fraction at a tau grid before
each delta, (b) the actual delta cost at the configured tau. Genuine
drift still accumulates: snapshots advance only for re-baked cells, so
sub-tau changes pile up until they cross tau (bake_ngp_delta docstring).

Usage: python scripts/tpu_delta_tau.py [tau] [blocks]
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
    from arnerf_tpu.datasets.synthetic import (SyntheticDataset,
                                               SyntheticConfig)
    from arnerf_tpu.rendering_baked import bake_ngp, bake_ngp_delta

    tau = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("devices:", jax.devices(), flush=True)

    scfg = SyntheticConfig(img_wh=(256, 256), n_train=100, n_test=2,
                           gt_samples=512)
    blob = np.load("/tmp/arnerf_bench_data_256_100.npz")
    train_ds = SyntheticDataset(split="train", config=scfg, read_meta=False)
    test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
    train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]
    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    tc = TrainConfig(batch_size=8192, loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    tr.load("/tmp/bench_ar_ckpt.npz")

    print("full bake...", flush=True)
    t0 = time.time()
    baked = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=256,
                     n_dirs=16)
    float(jnp.sum(baked.mip.astype(jnp.float32)))
    print(f"full bake {time.time() - t0:.1f}s", flush=True)

    for it in range(n_blocks):
        tr.train_block()
        float(jnp.sum(jnp.abs(tr.params["hash_table"][:64])))
        dens_new = np.asarray(tr.grid_state.density_grid, np.float32)
        d_old = baked.src_density
        for t in (0.05, 0.1, 0.2, 0.4, 0.8):
            moved = np.abs(dens_new - d_old) > t * np.maximum(
                np.maximum(np.abs(d_old), np.abs(dens_new)), 1e-2)
            print(f"  block {it}: tau={t} moved_frac="
                  f"{moved.mean():.3f}", flush=True)
        dstats = {}
        t0 = time.time()
        baked = bake_ngp_delta(tr.model_params, tr.grid_state, cfg, baked,
                               tau=tau, n_dirs=16, stats=dstats)
        if baked.rows is not None:
            float(jnp.sum(jnp.abs(baked.rows[:256, 0])))
        print(f"block {it}: delta bake {time.time() - t0:.1f}s at "
              f"tau={tau}: frac={dstats.get('frac', 0):.3f} "
              f"n={dstats.get('n_changed', 0)}", flush=True)


if __name__ == "__main__":
    main()
