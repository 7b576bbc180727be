"""Bisect the TPU block-program fault: grid update alone, scanned steps
alone, then the fused block, each executed twice and synced."""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    """Scalar-reduce sync (utils/sync.py): fetching a whole leaf times the
    ~30 MB/s tunnel, not the device (round-3 finding; numbers recorded
    from earlier runs of this script may carry that readback)."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.models.ngp import update_density_grid
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.trainer import train_step_impl
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    from functools import partial

    print("devices:", jax.devices(), flush=True)
    scfg = SyntheticConfig(img_wh=(64, 64), n_train=4, n_test=1,
                           gt_samples=64)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5)
    tc = TrainConfig(batch_size=8192, num_epochs=30, warmup_steps=256,
                     samples_per_ray_budget=48,
                     loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0))
    tr.on_train_start()
    sync(tr.grid_state.density_grid)
    print("A: mark_invisible ok", flush=True)

    # A) grid update alone, twice
    gs = tr.grid_state
    for i in range(2):
        gs = update_density_grid(tr.params, gs, jax.random.PRNGKey(i), cfg,
                                 density_threshold=5.9, warmup=True)
        sync(gs.density_grid)
        print(f"B{i}: grid update ok", flush=True)

    # B) plain steps, several
    tr.grid_state = gs
    for i in range(3):
        m = tr.train_step()
        sync(m["loss"])
        print(f"C{i}: step ok loss={float(m['loss']):.4f}", flush=True)

    # C) scan-of-steps WITHOUT grid update
    kw = dict(cfg=cfg, tc=tc, tx=tr.tx, exp_step_factor=0.0, axis_name=None)

    def scan_steps(params, opt_state, grid_state, keys):
        def body(carry, k):
            p, o = carry
            p, o, metrics = train_step_impl(
                p, o, grid_state, tr.images, tr.poses, tr.directions, k, 0,
                **kw)
            return (p, o), metrics
        (params, opt_state), ms = jax.lax.scan(body, (params, opt_state),
                                               keys)
        return params, opt_state, ms

    jf = jax.jit(scan_steps)
    for i in range(2):
        keys = jax.random.split(jax.random.PRNGKey(100 + i), n_steps)
        tr.params, tr.opt_state, ms = jf(tr.params, tr.opt_state,
                                         tr.grid_state, keys)
        sync(ms["loss"])
        print(f"D{i}: scan({n_steps}) ok loss={float(ms['loss'][-1]):.4f}",
              flush=True)

    # D) scan(16) without grid update
    for i in range(2):
        keys = jax.random.split(jax.random.PRNGKey(200 + i), 16)
        tr.params, tr.opt_state, ms = jf(tr.params, tr.opt_state,
                                         tr.grid_state, keys)
        sync(ms["loss"])
        print(f"D16_{i}: scan(16) ok loss={float(ms['loss'][-1]):.4f}",
              flush=True)

    # E) fused block with a 2-step interval (fuse_grid_update=True: the
    # single [update+scan] program under suspicion)
    from dataclasses import replace as dreplace
    tr.tc = dreplace(tc, update_interval=2, fuse_grid_update=True)
    tr._build_steps()
    tr.step = 0
    for i in range(3):
        tr.train_block()
        sync(tr.params["hash_table"])
        print(f"E2_{i}: block(2) ok", flush=True)

    # F) the full fused block (interval 16)
    tr.tc = dreplace(tc, fuse_grid_update=True)
    tr._build_steps()
    tr.step = 0  # re-align to block cadence
    for i in range(3):
        tr.train_block()
        sync(tr.params["hash_table"])
        print(f"F{i}: block(16) ok", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
