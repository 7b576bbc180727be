"""Round-4 training-step anatomy: attribute the production train_block's
wall clock to components and A/B backward-segment-sum variants.

VERDICT r3 weak #2 names the backward sort pipeline's byte volume as the
throughput lever (`bytes_per_step_GB_xla` 18.8 vs model 1.0); this script
measures what the step actually spends where, at the bench shapes
(batch 8192, stoch corners, budget 32/16, pool 32), and times candidate
segment-sum changes in isolation:

  * sort1 value packing: two bf16 columns bitcast into ONE int32 column
    (3 -> 2 sort operands) — bf16 rounding of individual corner updates is
    ~0.4% relative, noise-level next to the stochastic-corner estimator.
  * is_stable=False on both sorts (neither needs stability: updates within
    a row commute, the query flag/row composite key is a total order).
  * per-level loop vs batched (r2 measured batched better; re-check).
  * native scatter (the 40-90 ns/row trap; baseline).

Usage: python scripts/tpu_step_anatomy_r4.py [--budgets 32,16]
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


def timeit(fn, *args, warm=2, iters=6, **kw):
    """Mean seconds per call, scalar-fetch synced, chained dispatches."""
    out = None
    for _ in range(warm):
        out = fn(*args, **kw)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.time() - t0) / iters


# ---------------------------------------------------------------------------
# segment-sum variants (candidates for ops/segments.py)
# ---------------------------------------------------------------------------

def seg_batched(idx, cols, sizes, stable=True, pack=False):
    """dense_segment_sum_batched with stability/packing knobs."""
    F = len(cols)
    L, M = cols[0].shape
    T_max = max(sizes)
    qk = (jnp.arange(T_max, dtype=jnp.int32) << 1) | 1
    sizes_a = jnp.asarray(sizes, jnp.int32)[:, None]
    qkeys = jnp.where(jnp.arange(T_max)[None, :] < sizes_a,
                      qk[None, :], jnp.int32(0x7FFFFFFF))
    keys = jnp.concatenate([idx.astype(jnp.int32) << 1, qkeys], axis=1)
    if pack and F == 2:
        b0 = jax.lax.bitcast_convert_type(
            cols[0].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        b1 = jax.lax.bitcast_convert_type(
            cols[1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        packed = jnp.concatenate(
            [(b0 | (b1 << 16)).astype(jnp.int32),
             jnp.zeros((L, T_max), jnp.int32)], axis=1)
        s_key, s_packed = jax.lax.sort((keys, packed), num_keys=1,
                                       dimension=1, is_stable=stable)
        up = s_packed.astype(jnp.uint32)
        v0 = jax.lax.bitcast_convert_type(
            (up & 0xFFFF).astype(jnp.uint16), jnp.bfloat16) \
            .astype(jnp.float32)
        v1 = jax.lax.bitcast_convert_type(
            (up >> 16).astype(jnp.uint16), jnp.bfloat16) \
            .astype(jnp.float32)
        cs = [jnp.cumsum(v0, axis=1), jnp.cumsum(v1, axis=1)]
    else:
        scols = [jnp.concatenate(
            [c.astype(jnp.float32), jnp.zeros((L, T_max))], axis=1)
            for c in cols]
        s = jax.lax.sort((keys, *scols), num_keys=1, dimension=1,
                         is_stable=stable)
        s_key, s_cols = s[0], s[1:]
        cs = [jnp.cumsum(c, axis=1) for c in s_cols]
    # partition: needs a total order when unstable — compose flag with the
    # row so query order is preserved regardless of stability
    pkey = (((s_key & 1) ^ 1) << 30) | (s_key >> 1)
    part = jax.lax.sort((pkey, *cs), num_keys=1, dimension=1,
                        is_stable=stable)
    outs = []
    for j in range(F):
        C = part[1 + j][:, :T_max]
        outs.append(jnp.diff(C, axis=1, prepend=jnp.zeros((L, 1), C.dtype)))
    flat = [jnp.concatenate([o[l, :sizes[l]] for l in range(L)])
            for o in outs]
    return jnp.stack(flat, axis=1)


def seg_scatter(idx, cols, sizes):
    F = len(cols)
    L, M = cols[0].shape
    outs = [jnp.zeros((sizes[l], F), jnp.float32).at[idx[l]].add(
        jnp.stack([c[l] for c in cols], axis=1)) for l in range(L)]
    return jnp.concatenate(outs, axis=0)


def main():
    budgets = [32, 16]
    if "--budgets" in sys.argv:
        budgets = [int(v) for v in
                   sys.argv[sys.argv.index("--budgets") + 1].split(",")]
    print("devices:", jax.devices(), flush=True)
    print(f"window: {stream_gbps():.0f} GB/s", flush=True)

    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import (SyntheticDataset,
                                               SyntheticConfig)
    import os

    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    cache = f"/tmp/arnerf_bench_data_{wh}.npz"
    if os.path.exists(cache):
        blob = np.load(cache)
        train_ds = SyntheticDataset(split="train", config=scfg,
                                    read_meta=False)
        test_ds = SyntheticDataset(split="test", config=scfg,
                                   read_meta=False)
        train_ds.rays = blob["train_rays"]
        test_ds.rays = blob["test_rays"]
    else:
        train_ds = SyntheticDataset(split="train", config=scfg)
        test_ds = SyntheticDataset(split="test", config=scfg)
        np.savez(cache, train_rays=train_ds.rays, test_rays=test_ds.rays)

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    hc = cfg.hash_cfg
    L = hc.n_levels
    sizes = hc.level_sizes

    for budget in budgets:
        tc = TrainConfig(batch_size=8192, lr=1e-2, num_epochs=30,
                         steps_per_epoch=480, warmup_steps=256,
                         adaptive_budget=False, seg_cap=32,
                         samples_per_ray_budget=budget,
                         loss=NeRFLossConfig(grid_scale=0.5,
                                             lambda_distortion=1e-3))
        tr = NeRFTrainer(cfg, tc, train_ds, test_ds,
                         key=jax.random.PRNGKey(0))
        tr.on_train_start()
        bs = tc.update_interval
        t0 = time.time()
        tr.train_block()
        sync(tr.params["hash_table"])
        print(f"[b{budget}] first block (compile): {time.time() - t0:.1f} s",
              flush=True)
        while tr.step < tc.warmup_steps + bs:
            tr.train_block()
        sync(tr.params["hash_table"])

        dt = timeit(lambda: tr.train_block(), warm=1, iters=4)
        print(f"[b{budget}] train_block: {dt * 1e3:.0f} ms "
              f"({bs / dt:.2f} steps/s)", flush=True)

        # ---- forward-only vs grad: what the backward really costs --------
        from arnerf_tpu.training.trainer import (train_step_impl,
                                                 sample_rays)
        from arnerf_tpu.rendering import render_train
        from arnerf_tpu.training.losses import nerf_loss, total_loss
        m_cap = tc.batch_size * budget

        def loss_fn(p, key):
            k_s, k_r = jax.random.split(key)
            ro, rd, gt, _ = sample_rays(tr.images, tr.poses, tr.directions,
                                        k_s, tc)
            res = render_train(p, tr.grid_state, ro, rd, k_r, cfg,
                               m_cap=m_cap, s_cap=tc.s_cap,
                               max_samples=tc.max_samples, seg_cap=32,
                               stoch=True,
                               seg_pool=tc.batch_size * 32)
            return total_loss(nerf_loss(res, gt, tc.loss))

        fwd = jax.jit(loss_fn)
        gradf = jax.jit(jax.grad(loss_fn))
        k = jax.random.PRNGKey(3)
        t_f = timeit(fwd, tr.model_params, k)
        t_g = timeit(gradf, tr.model_params, k)
        print(f"[b{budget}] forward-only: {t_f * 1e3:.0f} ms | "
              f"grad: {t_g * 1e3:.0f} ms | bwd = "
              f"{(t_g - t_f) * 1e3:.0f} ms", flush=True)

        # ---- segment-sum variants at this budget's shapes -----------------
        M = tc.batch_size * budget
        kk = jax.random.PRNGKey(1)
        idx = jax.random.randint(
            kk, (L, M), 0,
            jnp.asarray(sizes, jnp.int32)[:, None], dtype=jnp.int32)
        cols = tuple(jax.random.normal(jax.random.fold_in(kk, j), (L, M))
                     for j in range(2))

        from arnerf_tpu.ops.segments import dense_segment_sum_batched
        cur = jax.jit(lambda i, c0, c1: dense_segment_sum_batched(
            i, (c0, c1), sizes, method="sort"))
        variants = [
            ("current", cur),
            ("stable+pack", jax.jit(lambda i, c0, c1: seg_batched(
                i, (c0, c1), sizes, stable=True, pack=True))),
            ("unstable", jax.jit(lambda i, c0, c1: seg_batched(
                i, (c0, c1), sizes, stable=False, pack=False))),
            ("unstable+pack", jax.jit(lambda i, c0, c1: seg_batched(
                i, (c0, c1), sizes, stable=False, pack=True))),
            ("scatter", jax.jit(lambda i, c0, c1: seg_scatter(
                i, (c0, c1), sizes))),
        ]
        ref = None
        for name, fn in variants:
            try:
                out = fn(idx, *cols)
                if ref is None:
                    ref = np.asarray(out)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(out) - ref)))
                dt = timeit(fn, idx, *cols)
                print(f"[b{budget}] segsum {name}: {dt * 1e3:.1f} ms "
                      f"(max|err| {err:.2e})", flush=True)
            except Exception as e:
                print(f"[b{budget}] segsum {name}: FAILED "
                      f"({type(e).__name__}: {e})", flush=True)

        # ---- render_train forward alone (marching + encode + MLP +
        # composite, no loss/grad) ------------------------------------------
        def render_only(p, key):
            k_s, k_r = jax.random.split(key)
            ro, rd, gt, _ = sample_rays(tr.images, tr.poses, tr.directions,
                                        k_s, tc)
            res = render_train(p, tr.grid_state, ro, rd, k_r, cfg,
                               m_cap=m_cap, s_cap=tc.s_cap,
                               max_samples=tc.max_samples, seg_cap=32,
                               stoch=True, seg_pool=tc.batch_size * 32)
            return res["rgb"]

        t_r = timeit(jax.jit(render_only), tr.model_params, k)
        print(f"[b{budget}] render_train fwd: {t_r * 1e3:.0f} ms",
              flush=True)

        # ---- forward stage anatomy: marching | encode+MLP | composite ----
        from arnerf_tpu.rendering import scene_hits, default_candidates
        from arnerf_tpu.ops.marching import (march_rays_train_pooled,
                                             build_coarse_occupancy,
                                             coarse_dilation_radius)
        from arnerf_tpu.models.ngp import ngp_forward
        from arnerf_tpu.ops.composite import composite_train

        ro, rd, gt, _ = jax.jit(lambda k: sample_rays(
            tr.images, tr.poses, tr.directions, k, tc))(k)

        def march_only(ro, rd, key):
            k_n, _ = jax.random.split(key)
            hits = scene_hits(ro, rd, cfg)
            noise = jax.random.uniform(k_n, (ro.shape[0],))
            occ_coarse = build_coarse_occupancy(
                tr.grid_state.occ_flat, cfg.cascades, cfg.grid_size,
                dilate=coarse_dilation_radius(
                    scale=cfg.scale, exp_step_factor=0.0,
                    grid_size=cfg.grid_size, max_samples=tc.max_samples))
            return march_rays_train_pooled(
                ro, rd, hits, tr.grid_state.occ_flat, noise,
                scale=cfg.scale, cascades=1, exp_step_factor=0.0,
                grid_size=cfg.grid_size, max_samples=tc.max_samples,
                n_candidates=default_candidates(cfg, 0.0, tc.max_samples),
                m_cap=m_cap, s_cap=tc.s_cap, occ_coarse=occ_coarse,
                seg_pool_cap=tc.batch_size * 32)

        jm = jax.jit(march_only)
        mr = jm(ro, rd, k)
        t_m = timeit(jm, ro, rd, k)
        print(f"[b{budget}] march_pooled: {t_m * 1e3:.0f} ms", flush=True)

        seed = jax.random.bits(k, dtype=jnp.uint32)
        jf = jax.jit(lambda p, x, d: ngp_forward(p, x, d + 1e-12, cfg,
                                                 seed=seed))
        t_e = timeit(jf, tr.model_params, mr.xyzs, mr.dirs)
        print(f"[b{budget}] ngp_forward (encode+MLP, {m_cap} rows): "
              f"{t_e * 1e3:.0f} ms", flush=True)

        sig, rgbs = jf(tr.model_params, mr.xyzs, mr.dirs)
        jc = jax.jit(lambda s, c: composite_train(
            s, c, mr.deltas, mr.ts, mr.ray_idx, mr.valid, mr.ray_start,
            mr.counts, 1e-4).rgb)
        t_c = timeit(jc, sig, rgbs)
        print(f"[b{budget}] composite_train: {t_c * 1e3:.0f} ms", flush=True)

        t_s = timeit(jax.jit(lambda kk: sample_rays(
            tr.images, tr.poses, tr.directions, kk, tc)[2]), k)
        print(f"[b{budget}] sample_rays: {t_s * 1e3:.0f} ms | stages sum "
              f"{(t_m + t_e + t_c + t_s) * 1e3:.0f} vs fwd {t_r * 1e3:.0f}",
              flush=True)

        del tr


if __name__ == "__main__":
    main()
