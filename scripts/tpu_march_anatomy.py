"""Round-4 marching anatomy: attribute march_rays_train_pooled's wall
clock (163 ms of the 199 ms forward at the b32 bench shape,
scripts/tpu_step_anatomy_r4.py) to its internal stages, on the chip.

Stages mirror ops/marching.py:299-431 exactly, cut at materialized
boundaries so each is timeable in isolation:

  S1 coarse     lattice + occ_coarse gather + row cumsum        (N, K1)
  S2 segsel     pool compaction searches (upper+lower bound)    (Sp,)
  S3 fine       lattice + occupancy_lookup on pooled segments   (Sp, F)
  S4 counts     global cumsum + per-ray demand/alloc            (N,)
  S5 select     sample searches (upper_bound + lower_bound_var) (M,)
  S6 attrs      gather rays + closed-form t/dt/xyz              (M, 3)

plus micro A/Bs for candidate fixes:
  * occupancy_lookup generic vs cascades==1-specialized (no mip math)
  * raw byte-gather floor at the S3 shape (what S3 could cost)
  * f32 vs bf16 candidate positions

Usage: python scripts/tpu_march_anatomy.py
"""

import os
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


def timeit(fn, *args, warm=2, iters=8, **kw):
    out = None
    for _ in range(warm):
        out = fn(*args, **kw)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    print(f"window: {stream_gbps():.0f} GB/s", flush=True)

    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.training.trainer import sample_rays
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    from arnerf_tpu.rendering import scene_hits, default_candidates
    from arnerf_tpu.ops.marching import (
        march_rays_train_pooled, build_coarse_occupancy,
        coarse_dilation_radius, occupancy_lookup, pl_cdiv,
        _upper_bound, _lower_bound_rows, _lower_bound_var, COARSE_FACTOR)
    from arnerf_tpu.ops.stepping import calc_dt, lattice_t

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
    budget = 32
    tc = TrainConfig(batch_size=8192, lr=1e-2, num_epochs=30,
                     steps_per_epoch=480, warmup_steps=256,
                     adaptive_budget=False, seg_cap=32,
                     samples_per_ray_budget=budget,
                     loss=NeRFLossConfig(grid_scale=0.5,
                                         lambda_distortion=1e-3))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    tr.on_train_start()
    # warm to a carved grid (realistic occupancy sparsity)
    while tr.step < tc.warmup_steps + tc.update_interval:
        tr.train_block()
    sync(tr.params["hash_table"])
    occ_flat = tr.grid_state.occ_flat
    print(f"occupied frac: {float(jnp.mean(occ_flat.astype(jnp.float32))):.4f}",
          flush=True)

    # ---- static config mirrors render_train's pooled call -----------------
    N = tc.batch_size
    F = COARSE_FACTOR
    G = cfg.grid_size
    CG = G // F
    scale = cfg.scale
    max_samples = tc.max_samples
    K = default_candidates(cfg, 0.0, max_samples)
    K1 = pl_cdiv(K, F)
    Sp = N * 32
    m_cap = N * budget
    s_cap = tc.s_cap
    print(f"N={N} K={K} K1={K1} Sp={Sp} m_cap={m_cap} s_cap={s_cap}",
          flush=True)

    occ_coarse = jax.jit(lambda o: build_coarse_occupancy(
        o, cfg.cascades, G,
        dilate=coarse_dilation_radius(
            scale=scale, exp_step_factor=0.0, grid_size=G,
            max_samples=max_samples)))(occ_flat)

    k = jax.random.PRNGKey(3)
    ro, rd, gt, _ = jax.jit(lambda kk: sample_rays(
        tr.images, tr.poses, tr.directions, kk, tc))(k)
    hits = jax.jit(lambda a, b: scene_hits(a, b, cfg))(ro, rd)
    noise = jax.random.uniform(jax.random.fold_in(k, 7), (N,))

    cd = lambda t: calc_dt(t, exp_step_factor=0.0, max_samples=max_samples,
                           grid_size=G, scale=scale)
    lt = lambda t1, kk: lattice_t(t1, kk, exp_step_factor=0.0,
                                  max_samples=max_samples, grid_size=G,
                                  scale=scale)

    # ---- full marcher (cross-check) ----------------------------------------
    full = jax.jit(lambda ro, rd, hits, occ, noise, oc:
                   march_rays_train_pooled(
                       ro, rd, hits, occ, noise, scale=scale, cascades=1,
                       exp_step_factor=0.0, grid_size=G,
                       max_samples=max_samples, n_candidates=K,
                       m_cap=m_cap, s_cap=s_cap, occ_coarse=oc,
                       seg_pool_cap=Sp))
    t_full = timeit(full, ro, rd, hits, occ_flat, noise, occ_coarse)
    print(f"march_pooled FULL: {t_full * 1e3:.1f} ms", flush=True)

    # ---- S1: coarse pass ----------------------------------------------------
    def s1(ro, rd, hits, noise, oc):
        hits = jax.lax.stop_gradient(hits)
        t1, t2 = hits[:, 0], hits[:, 1]
        ray_ok = t1 >= 0
        t1 = jnp.where(ray_ok, t1 + cd(t1) * noise, t1)
        jj = (jnp.arange(K1, dtype=jnp.int32) * F)[None, :]
        t_seg = lt(t1[:, None], jj)
        pos_s = ro[:, None, :] + t_seg[..., None] * rd[:, None, :]
        mb = min(0.5, scale)
        nc = jnp.clip(0.5 * (pos_s / mb + 1.0) * CG, 0.0, CG - 1.0)
        nc = nc.astype(jnp.int32)
        cflat = (nc[..., 0] * CG + nc[..., 1]) * CG + nc[..., 2]
        seg_elig = (oc[cflat] > 0) & (t_seg < t2[:, None]) & ray_ok[:, None]
        c1 = jnp.cumsum(seg_elig.astype(jnp.int32), axis=1)
        return c1, t1, t2

    js1 = jax.jit(s1)
    c1, t1p, t2p = js1(ro, rd, hits, noise, occ_coarse)
    t_s1 = timeit(js1, ro, rd, hits, noise, occ_coarse)
    print(f"S1 coarse (N,K1): {t_s1 * 1e3:.1f} ms", flush=True)

    # ---- S2: segment pool compaction ---------------------------------------
    def s2(c1):
        dseg = c1[:, -1]
        total_nseg = jnp.sum(dseg)
        ratio_s = jnp.minimum(
            1.0, Sp / jnp.maximum(total_nseg, 1).astype(jnp.float32))
        alloc_s = jnp.floor(
            dseg.astype(jnp.float32) * ratio_s).astype(jnp.int32)
        stride_s = dseg.astype(jnp.float32) \
            / jnp.maximum(alloc_s, 1).astype(jnp.float32)
        seg_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(alloc_s)[:-1].astype(jnp.int32)])
        p = jnp.arange(Sp, dtype=jnp.int32)
        r_p = jnp.clip(_upper_bound(seg_start, p), 0, N - 1)
        s_p = p - seg_start[r_p]
        valid_p = s_p < alloc_s[r_p]
        j_p = jnp.floor(
            s_p.astype(jnp.float32) * stride_s[r_p]).astype(jnp.int32)
        j_p = jnp.minimum(j_p, jnp.maximum(dseg[r_p] - 1, 0))
        sel = _lower_bound_rows(c1.reshape(-1), r_p, j_p + 1, K1)
        k_base = jnp.minimum(sel, K1 - 1) * F
        return r_p, valid_p, k_base, seg_start, alloc_s, stride_s

    js2 = jax.jit(s2)
    r_p, valid_p, k_base, seg_start, alloc_s, stride_s = js2(c1)
    t_s2 = timeit(js2, c1)
    print(f"S2 segsel (Sp,): {t_s2 * 1e3:.1f} ms", flush=True)

    # ---- S3: fine pass -------------------------------------------------------
    def s3(ro, rd, t1, t2, r_p, valid_p, k_base, occ):
        ks_f = k_base[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]
        t_cand = lt(t1[r_p][:, None], ks_f)
        dt_cand = cd(t_cand)
        pos = ro[r_p][:, None, :] + t_cand[..., None] * rd[r_p][:, None, :]
        occb = occupancy_lookup(occ, pos, dt_cand, scale=scale,
                                cascades=1, grid_size=G)
        return occb & (t_cand < t2[r_p][:, None]) & valid_p[:, None]

    js3 = jax.jit(s3)
    elig = js3(ro, rd, t1p, t2p, r_p, valid_p, k_base, occ_flat)
    t_s3 = timeit(js3, ro, rd, t1p, t2p, r_p, valid_p, k_base, occ_flat)
    print(f"S3 fine (Sp,F): {t_s3 * 1e3:.1f} ms", flush=True)

    # S3b: cascades==1-specialized occupancy test (no mip/log2/exp2 math)
    def s3b(ro, rd, t1, t2, r_p, valid_p, k_base, occ):
        ks_f = k_base[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]
        t_cand = lt(t1[r_p][:, None], ks_f)
        pos = ro[r_p][:, None, :] + t_cand[..., None] * rd[r_p][:, None, :]
        mb = min(0.5, scale)
        n = jnp.clip(0.5 * (pos / mb + 1.0) * G, 0.0, G - 1.0).astype(jnp.int32)
        flat = (n[..., 0] * G + n[..., 1]) * G + n[..., 2]
        return (occ[flat] > 0) & (t_cand < t2[r_p][:, None]) & valid_p[:, None]

    js3b = jax.jit(s3b)
    elig_b = js3b(ro, rd, t1p, t2p, r_p, valid_p, k_base, occ_flat)
    agree = float(jnp.mean((elig_b == elig).astype(jnp.float32)))
    t_s3b = timeit(js3b, ro, rd, t1p, t2p, r_p, valid_p, k_base, occ_flat)
    print(f"S3b fine specialized: {t_s3b * 1e3:.1f} ms (agree {agree:.6f})",
          flush=True)

    # ---- S4: counts ----------------------------------------------------------
    def s4(elig, seg_start, alloc_s):
        cg = jnp.cumsum(elig.reshape(-1).astype(jnp.int32))
        cg0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cg])
        fine_base = seg_start * F
        fine_len = alloc_s * F
        cnt = cg0[jnp.minimum(fine_base + fine_len, Sp * F)] - cg0[fine_base]
        demand = jnp.minimum(cnt, s_cap)
        total_demand = jnp.sum(demand)
        ratio = jnp.minimum(
            1.0, m_cap / jnp.maximum(total_demand, 1).astype(jnp.float32))
        alloc = jnp.floor(
            demand.astype(jnp.float32) * ratio).astype(jnp.int32)
        stride = demand.astype(jnp.float32) \
            / jnp.maximum(alloc, 1).astype(jnp.float32)
        ray_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(alloc)[:-1].astype(jnp.int32)])
        return cg, cg0, fine_base, fine_len, demand, alloc, stride, ray_start

    js4 = jax.jit(s4)
    cg, cg0, fine_base, fine_len, demand, alloc, stride, ray_start = \
        js4(elig, seg_start, alloc_s)
    t_s4 = timeit(js4, elig, seg_start, alloc_s)
    print(f"S4 counts: {t_s4 * 1e3:.1f} ms", flush=True)

    # ---- S5: sample selection searches --------------------------------------
    def s5(cg, cg0, fine_base, fine_len, demand, alloc, stride, ray_start,
           k_base):
        ks_f = k_base[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]
        m = jnp.arange(m_cap, dtype=jnp.int32)
        r = jnp.clip(_upper_bound(ray_start, m), 0, N - 1)
        s = m - ray_start[r]
        valid = s < alloc[r]
        j = jnp.floor(s.astype(jnp.float32) * stride[r]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(demand[r] - 1, 0))
        q = cg0[fine_base[r]] + j + 1
        x = _lower_bound_var(cg, fine_base[r], fine_len[r], q, k_max=K1 * F)
        flat_idx = fine_base[r] \
            + jnp.minimum(x, jnp.maximum(fine_len[r] - 1, 0))
        k_sel = ks_f.reshape(-1)[flat_idx]
        return r, valid, k_sel

    js5 = jax.jit(s5)
    r, valid, k_sel = js5(cg, cg0, fine_base, fine_len, demand, alloc,
                          stride, ray_start, k_base)
    t_s5 = timeit(js5, cg, cg0, fine_base, fine_len, demand, alloc,
                  stride, ray_start, k_base)
    print(f"S5 select (M,): {t_s5 * 1e3:.1f} ms", flush=True)

    # ---- S6: attribute reconstruction ---------------------------------------
    def s6(ro, rd, t1, r, valid, k_sel, stride, stride_s):
        t_m = lt(t1[r], k_sel)
        dt_m = cd(t_m) * stride[r] * stride_s[r]
        dirs = rd[r]
        xyzs = ro[r] + t_m[:, None] * dirs
        fv = valid.astype(t_m.dtype)
        return xyzs * fv[:, None], dirs * fv[:, None], dt_m * fv

    js6 = jax.jit(s6)
    t_s6 = timeit(js6, ro, rd, t1p, r, valid, k_sel, stride, stride_s)
    print(f"S6 attrs (M,3): {t_s6 * 1e3:.1f} ms", flush=True)

    total = t_s1 + t_s2 + t_s3 + t_s4 + t_s5 + t_s6
    print(f"stages sum {total * 1e3:.1f} ms vs full {t_full * 1e3:.1f} ms",
          flush=True)

    # ---- selection A/B: search (binary-search gathers) vs sort ------------
    fsort = jax.jit(lambda ro, rd, hits, occ, noise, oc:
                    march_rays_train_pooled(
                        ro, rd, hits, occ, noise, scale=scale, cascades=1,
                        exp_step_factor=0.0, grid_size=G,
                        max_samples=max_samples, n_candidates=K,
                        m_cap=m_cap, s_cap=s_cap, occ_coarse=oc,
                        seg_pool_cap=Sp, selection="sort"))
    t_sort = timeit(fsort, ro, rd, hits, occ_flat, noise, occ_coarse)
    print(f"march_pooled SORT-selection: {t_sort * 1e3:.1f} ms "
          f"(search {t_full * 1e3:.1f})", flush=True)

    # end-to-end: training loss grad with each selection
    from arnerf_tpu.rendering import render_train
    from arnerf_tpu.training.losses import nerf_loss, total_loss

    def make_loss(selection):
        def loss_fn(p, key):
            k_s, k_r = jax.random.split(key)
            ro2, rd2, gt2, _ = sample_rays(tr.images, tr.poses,
                                           tr.directions, k_s, tc)
            res = render_train(p, tr.grid_state, ro2, rd2, k_r, cfg,
                               m_cap=m_cap, s_cap=tc.s_cap,
                               max_samples=max_samples, seg_cap=32,
                               stoch=True, seg_pool=Sp,
                               selection=selection)
            return total_loss(nerf_loss(res, gt2, tc.loss))
        return loss_fn

    for sel in ("search", "sort"):
        gradf = jax.jit(jax.grad(make_loss(sel)))
        t_g = timeit(gradf, tr.model_params, k, warm=2, iters=5)
        print(f"grad step ({sel}): {t_g * 1e3:.0f} ms", flush=True)

    # ---- micro floors --------------------------------------------------------
    kk = jax.random.PRNGKey(9)
    gidx = jax.random.randint(kk, (Sp * F,), 0, G ** 3, dtype=jnp.int32)
    jg = jax.jit(lambda occ, i: jnp.sum(occ[i].astype(jnp.int32)))
    sync(jg(occ_flat, gidx))
    t_g = timeit(jg, occ_flat, gidx)
    print(f"raw byte-gather ({Sp * F} rows): {t_g * 1e3:.1f} ms", flush=True)

    # one binary-search iteration shape: gather M rows from (Sp*F,) int32
    jbs = jax.jit(lambda c, i: jnp.sum(c[i]))
    bidx = jax.random.randint(kk, (m_cap,), 0, Sp * F, dtype=jnp.int32)
    sync(jbs(cg, bidx))
    t_bs = timeit(jbs, cg, bidx)
    print(f"one search-iter gather ({m_cap} of {Sp * F}): "
          f"{t_bs * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
