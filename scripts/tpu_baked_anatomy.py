#!/usr/bin/env python
"""Frame anatomy of the baked interactive renderer (VERDICT r2 weak #2:
"explain the 15-20x gap between measured FPS and the row-count floor").

Times each component of render_baked_uniform as its own jitted program at
the real 800x800 GUI spec, then reads the in-program phase counters
(phase_rounds / phase_alive / phase_sizes) from a full frame and assembles
the row-count model:

    expected_ms = prelude + sum_p d_rounds_p * round_cost(sizes_p)

against the measured per-bucket wall time. Whatever the model does NOT
explain is dispatch overhead / while_loop sequencing / XLA fusion loss —
i.e. the thing to fix next.

Usage: python scripts/tpu_baked_anatomy.py [bake_res] [n_steps] [S]
Resumes /tmp/quality_run_ckpt.npz if present (else trains 512 steps).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.rendering_baked import (
        bake_ngp, cull_and_buckets, render_baked_uniform, sample_baked,
        MIP_FACTOR)
    from arnerf_tpu.ops.rng import hash_uniform
    from arnerf_tpu.ops.composite import composite_test_step
    from arnerf_tpu.insert.sh_math import sh9_basis

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)
                                                .astype(jnp.float32)))))

    def timeit(fn, n=6, warmup=2, name=""):
        for _ in range(warmup):
            out = fn()
        sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        sync(out)
        ms = (time.time() - t0) / n * 1e3
        print(f"{name}: {ms:.1f} ms", flush=True)
        return ms

    bake_res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    print(f"devices: {jax.devices()}", flush=True)

    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    cache = f"/tmp/arnerf_bench_data_{wh}.npz"
    if os.path.exists(cache):
        blob = np.load(cache)
        train_ds = SyntheticDataset(split="train", config=scfg,
                                    read_meta=False)
        test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
        train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]
    else:
        train_ds = SyntheticDataset(split="train", config=scfg)
        test_ds = SyntheticDataset(split="test", config=scfg)

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    tc = TrainConfig(batch_size=8192, loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    ck = "/tmp/quality_run_ckpt.npz"
    if os.path.exists(ck):
        print("anatomy: resuming quality ckpt", flush=True)
        tr.load(ck)
    else:
        print("anatomy: training 512 steps", flush=True)
        tr.on_train_start()
        tr.fit(n_steps=512, log_every=256)

    t0 = time.time()
    baked = bake_ngp(tr.model_params, tr.grid_state, cfg,
                     resolution=bake_res, n_dirs=16)
    sync(baked.rows)
    print(f"bake_s: {time.time() - t0:.1f} "
          f"(res {bake_res})", flush=True)

    # GUI rays
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    rays_o, rays_d = get_rays(dirs800, jnp.asarray(test_ds.poses[0]))

    blk_flag = len(sys.argv) > 5 and sys.argv[5] == "block"
    noq = "noq" in sys.argv[1:]
    buckets, N_total, blocked = cull_and_buckets(
        baked, rays_o, rays_d, 1 << 18,
        img_wh=(800, 800) if blk_flag else None)
    n_hit = sum(n for *_, n in buckets)
    print(f"rays: {N_total} total, {n_hit} aabb-hit, "
          f"{len(buckets)} buckets x {buckets[0][1].shape[0]} "
          f"blocked={blocked}", flush=True)

    B = baked.resolution
    scale = baked.scale
    rows = baked.rows
    mip = baked.mip
    Np = buckets[0][1].shape[0]
    ro, rd = buckets[0][1], buckets[0][2]
    key = jax.random.PRNGKey(0)
    seed = jnp.uint32(1234)

    # ---- component probes at bucket size ----------------------------------
    M = Np * S
    # random in-box positions as fetch targets
    kx = jax.random.uniform(key, (M, 3), minval=-scale * 0.7,
                            maxval=scale * 0.7)
    sh_d = sh9_basis(rd / jnp.linalg.norm(rd, -1, keepdims=True).clip(1e-12))

    # NOTE: every jitted probe takes the big arrays (rows/mip/sh_d) as
    # ARGUMENTS — closures embed them as constants and the remote compile
    # rejects the program body (HTTP 413; round-2 measurement rule).
    @jax.jit
    def rng_only(seed):
        ctr = jnp.arange(M, dtype=jnp.uint32)
        return sum(hash_uniform(ctr, seed, stream=d + 1).sum()
                   for d in range(3))

    @jax.jit
    def fetch_only(rows, x):
        u = (x + scale) / (2 * scale) * B - 0.5
        ii = (jnp.clip(u[:, 0].astype(jnp.int32), 0, B - 1) * (B * B)
              + jnp.clip(u[:, 1].astype(jnp.int32), 0, B - 1) * B
              + jnp.clip(u[:, 2].astype(jnp.int32), 0, B - 1))
        return rows[ii].astype(jnp.float32).sum()

    @jax.jit
    def fetch_quant(row_index, rows_q, x):
        """v3 color fetch: narrow index gather + 32 B int8 row + dequant."""
        u = (x + scale) / (2 * scale) * B - 0.5
        ii = (jnp.clip(u[:, 0].astype(jnp.int32), 0, B - 1) * (B * B)
              + jnp.clip(u[:, 1].astype(jnp.int32), 0, B - 1) * B
              + jnp.clip(u[:, 2].astype(jnp.int32), 0, B - 1))
        fq = rows_q[row_index[ii]]
        sc = jax.lax.bitcast_convert_type(fq[:, -4:], jnp.float32)
        return (fq[:, :27].astype(jnp.float32) * sc[:, None]).sum()

    @jax.jit
    def fetch_decode(rows, sh_d, x, seed):
        ctr = jnp.arange(M, dtype=jnp.uint32)
        jit3 = tuple(hash_uniform(ctr, seed, stream=d + 1) for d in range(3))
        sig, col = sample_baked(rows, x, sh_d, B, scale, "stochastic", jit3)
        return sig.sum() + col.sum()

    @jax.jit
    def full_round(rows, sh_d, lo, hi, x, seed, t_cur):
        """One marching round exactly as the body does it: RNG + fetch +
        decode + composite."""
        ctr = jnp.arange(M, dtype=jnp.uint32)
        jit3 = tuple(hash_uniform(ctr, seed, stream=d + 1) for d in range(3))
        sig, col = sample_baked(rows, x, sh_d, B, scale, "stochastic", jit3)
        dt = jnp.linalg.norm(hi - lo) / n_steps
        ts = t_cur[:, None] + (jnp.arange(S) + 0.5) * dt
        n_eff = jnp.full((Np,), S, jnp.int32)
        opacity, depth, rgb, still = composite_test_step(
            sig.reshape(Np, S), col.reshape(Np, S, 3),
            jnp.full((Np, S), dt), ts, n_eff,
            jnp.zeros(Np), jnp.zeros(Np), jnp.zeros((Np, 3)), 1e-2)
        return rgb.sum() + still.sum()

    F = MIP_FACTOR
    Bc = -(-B // F)
    step_c = F * 2 * scale / B
    Kc = int(np.ceil(2 * np.sqrt(3.0) * scale / step_c)) + 2

    @jax.jit
    def prelude_only(mip, lo, hi, ro, rd):
        from arnerf_tpu.ops.intersection import ray_aabb_intersect_single
        hits = ray_aabb_intersect_single(ro, rd, (lo + hi) / 2, (hi - lo) / 2)
        t1 = jnp.maximum(hits[:, 0], 0.0)
        t2 = hits[:, 1]
        t_c = t1[:, None] + (jnp.arange(Kc) + 0.5) * step_c
        parts = []
        for d in range(3):
            p_d = ro[:, d:d + 1] + t_c * rd[:, d:d + 1]
            parts.append(jnp.clip(jnp.floor((p_d + scale) / (2 * scale) * B),
                                  0, B - 1).astype(jnp.int32) // F)
        cix = (parts[0] * Bc + parts[1]) * Bc + parts[2]
        occ_c = (mip[cix] > 0) & (t_c < t2[:, None])
        return jnp.sum(occ_c)

    print(f"--- components at bucket {Np} x S={S} "
          f"({M / 1e6:.1f}M rows/round) ---", flush=True)
    t_rng = timeit(lambda: rng_only(seed), name="rng_only (3 streams)")
    t_fetch = timeit(lambda: fetch_only(rows, kx), name="fetch_only")
    if baked.rows_q is not None:
        nq = baked.rows_q.shape[0]
        timeit(lambda: fetch_quant(baked.row_index, baked.rows_q, kx),
               name=f"fetch_quant (compact {nq * 32 / 1e6:.0f} MB)")
    t_fd = timeit(lambda: fetch_decode(rows, sh_d, kx, seed),
                  name="fetch+decode")
    tc0 = jnp.full((Np,), 0.1)
    t_round = timeit(
        lambda: full_round(rows, sh_d, baked.aabb_lo, baked.aabb_hi,
                           kx, seed, tc0),
        name="full_round (rng+fetch+decode+composite)")
    t_prelude = timeit(
        lambda: prelude_only(mip, baked.aabb_lo, baked.aabb_hi, ro, rd),
        name=f"prelude_only (Kc={Kc}, {Np * Kc / 1e6:.1f}M coarse rows)")

    # ---- full frame with counters ------------------------------------------
    print("--- full frame ---", flush=True)
    keys = jax.random.split(key, len(buckets))
    frame_ms = []
    model_ms = []
    cw = int(sys.argv[4]) if len(sys.argv) > 4 else 8   # 0 = unsplit v1
    print(f"color_window={cw}", flush=True)
    for bi, ((sl, rob, rdb, n), k) in enumerate(zip(buckets, keys)):
        fn = lambda: render_baked_uniform(
            rows, baked.aabb_lo, baked.aabb_hi, rob, rdb, k,
            B=B, scale=scale, interp="stochastic", T_threshold=1e-2,
            n_steps=n_steps, samples_per_round=S, mip=mip,
            sigma=baked.sigma, color_window=cw, block4=blocked,
            row_index=None if noq else baked.row_index,
            rows_q=None if noq else baked.rows_q)
        res = fn()          # compile + counters
        pr = np.asarray(res["phase_rounds"])
        pa = np.asarray(res["phase_alive"])
        ps = np.asarray(res["phase_sizes"])
        npa = int(res["n_prelude_alive"])
        ms = timeit(fn, n=4, warmup=1, name=f"bucket{bi} e2e")
        frame_ms.append(ms)
        d_rounds = np.diff(np.concatenate([[0], pr]))
        # model: prelude + per-phase rounds * per-row round cost scaled to
        # the phase prefix size
        exp = t_prelude + sum(
            dr * t_round * (sz / Np) for dr, sz in zip(d_rounds, ps))
        model_ms.append(exp)
        print(f"  bucket{bi}: prelude_alive={npa}/{n} "
              f"phases={list(ps)} rounds={list(pr)} alive_exit={list(pa)} "
              f"model={exp:.1f} ms measured={ms:.1f} ms", flush=True)

    tot = sum(frame_ms)
    print(f"frame total: {tot:.1f} ms ({1000 / tot:.2f} FPS device) "
          f"model {sum(model_ms):.1f} ms "
          f"unexplained {tot - sum(model_ms):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
