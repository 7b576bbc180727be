#!/usr/bin/env python
"""Round-5 design probe: brick-packed sigma fetch vs narrow per-sample rows.

The baked renderer's slab-scene floor is ~24M per-sample sigma gather ROWS
per frame at the measured ~8-11 ns/row issue rate (DESIGN.md round-4
survivor forensics) — scheduling can't beat that; only fetching FEWER rows
can. The candidate: bake sigma into 8^3-voxel BRICKS (one table row per
brick; 512 int8/bf16 lanes), fetch one row per brick-CROSSING (~9.4 voxels
of chord ≈ 2.7 samples at dt = 3.46 voxels — and the ratio grows as dt
shrinks, decoupling quadrature from row count), then extract the K
per-sample values from the gathered (R, 512) lanes on the VPU.

This probe measures, on the real chip:
  1. wide-row gather cost vs row width (is a 512 B row still ~issue-bound?)
  2. per-row extraction cost for several strategies (take_along_axis,
     fused one-hot mask-reduce, factorized 3-axis, int32-view bit trick)
  3. the combined brick pipeline vs the narrow per-sample baseline at the
     frame's shape (R = 262144 rays/phase, K = 6 samples/brick-crossing)

Run: python scripts/tpu_brick_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def timeit(fn, *args, n=6, warmup=2, name="", rows=None):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / n
    per = f", {dt / rows * 1e9:.2f} ns/row" if rows else ""
    print(f"{name}: {dt * 1e3:.2f} ms{per}", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # ---- 1. row-width scan: (Nb, W) tables, random row gather ----------
    R = 1 << 18                       # 262144 rows (one frame phase)
    print(f"\n== wide-row gather, R={R} random rows ==", flush=True)
    base = None
    for W, dt_ in [(1, jnp.float32), (8, jnp.float32), (32, jnp.int8),
                   (64, jnp.int8), (128, jnp.int8), (512, jnp.int8),
                   (512, jnp.bfloat16), (512, jnp.float32)]:
        Nb = 32768                     # (256/8)^3 bricks
        if dt_ == jnp.int8:
            t = jax.random.randint(key, (Nb, W), -127, 127, jnp.int8)
        else:
            t = jax.random.normal(key, (Nb, W), dt_)
        idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, Nb,
                                 jnp.int32)
        g = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum(axis=-1))
        d = timeit(g, t, idx, name=f"gather (R,)->({W},{dt_.__name__})",
                   rows=R)
        if W == 1:
            base = d

    # ---- 2. extraction strategies from gathered bricks -----------------
    print(f"\n== extraction (R,512)->(R,K), R={R} ==", flush=True)
    for K in (4, 8):
        bricks = jax.random.normal(key, (R, 512), jnp.bfloat16)
        bricks8 = jax.random.randint(key, (R, 512), -127, 127, jnp.int8)
        eidx = jax.random.randint(jax.random.PRNGKey(2), (R, K), 0, 512,
                                  jnp.int32)

        def x_taa(b, i):
            return jnp.take_along_axis(
                b.astype(jnp.float32), i, axis=1)
        timeit(jax.jit(x_taa), bricks, eidx,
               name=f"take_along_axis K={K}", rows=R * K)

        def x_onehot(b, i):
            io = jnp.arange(512, dtype=jnp.int32)
            m = (i[:, :, None] == io).astype(jnp.bfloat16)  # (R,K,512)
            return jnp.einsum("rkv,rv->rk", m, b).astype(jnp.float32)
        timeit(jax.jit(x_onehot), bricks, eidx,
               name=f"onehot mask-reduce K={K}", rows=R * K)

        def x_fact(b, i):
            ix, iy, iz = i // 64, (i // 8) % 8, i % 8
            # factorized: gather the x-plane via take_along_axis on a
            # (R, 8, 64) view -> (R, K, 64), then narrow per axis
            p = jnp.take_along_axis(
                b.reshape(R, 8, 64),
                ix[..., None].astype(jnp.int32), axis=1)  # (R,K,64)
            p = jnp.take_along_axis(
                p.reshape(R, K, 8, 8),
                iy[..., None, None], axis=2).reshape(R, K, 8)
            p = jnp.take_along_axis(p, iz[..., None], axis=2)
            return p.reshape(R, K).astype(jnp.float32)
        timeit(jax.jit(x_fact), bricks, eidx,
               name=f"factorized 3-axis K={K}", rows=R * K)

        def x_bits(b8, i):
            w = jax.lax.bitcast_convert_type(
                b8.reshape(R, 128, 4), jnp.int32)            # (R,128)
            grp = jnp.take_along_axis(w, i // 4, axis=1)     # (R,K) int32
            sh = (i % 4) * 8
            v = (grp >> sh) & 0xFF
            return jnp.where(v >= 128, v - 256, v).astype(jnp.float32)
        timeit(jax.jit(x_bits), bricks8, eidx,
               name=f"int32-view bit extract K={K}", rows=R * K)

    # ---- 3. combined pipeline at frame shape ---------------------------
    # narrow baseline: R*K random rows from the 67 MB (B^3,) sigma table
    print("\n== combined: brick fetch+extract vs narrow per-sample ==",
          flush=True)
    B3 = 256 ** 3
    sigma = jax.random.normal(key, (B3,), jnp.float32)
    K = 6
    sidx = jax.random.randint(jax.random.PRNGKey(3), (R * K,), 0, B3,
                              jnp.int32)
    timeit(jax.jit(lambda s, i: s[i].sum()), sigma, sidx,
           name=f"narrow per-sample R*K={R * K}", rows=R * K)

    Nb = 32768
    btab8 = jax.random.randint(key, (Nb, 512), -127, 127, jnp.int8)
    btab16 = jax.random.normal(key, (Nb, 512), jnp.bfloat16)
    bidx = jax.random.randint(jax.random.PRNGKey(4), (R,), 0, Nb, jnp.int32)
    eidx = jax.random.randint(jax.random.PRNGKey(5), (R, K), 0, 512,
                              jnp.int32)

    def pipe_taa(t, bi, ei):
        rows = t[bi].astype(jnp.float32)                    # (R,512)
        return jnp.take_along_axis(rows, ei, axis=1).sum()
    timeit(jax.jit(pipe_taa), btab16, bidx, eidx,
           name="brick bf16 + take_along_axis", rows=R)

    def pipe_bits(t, bi, ei):
        w = jax.lax.bitcast_convert_type(
            t[bi].reshape(R, 128, 4), jnp.int32)
        grp = jnp.take_along_axis(w, ei // 4, axis=1)
        v = (grp >> ((ei % 4) * 8)) & 0xFF
        return jnp.where(v >= 128, v - 256, v).astype(jnp.float32).sum()
    timeit(jax.jit(pipe_bits), btab8, bidx, eidx,
           name="brick int8 + bit extract", rows=R)

    def pipe_onehot(t, bi, ei):
        rows = t[bi]                                        # (R,512) bf16
        io = jnp.arange(512, dtype=jnp.int32)
        m = (ei[:, :, None] == io).astype(jnp.bfloat16)
        return jnp.einsum("rkv,rv->rk", m, rows) \
            .astype(jnp.float32).sum()
    timeit(jax.jit(pipe_onehot), btab16, bidx, eidx,
           name="brick bf16 + onehot", rows=R)

    # 4^3 bricks for comparison (64 B rows, chord ~4.7 vox ≈ 1.4 samples)
    Nb4 = (256 // 4) ** 3
    btab4 = jax.random.randint(key, (Nb4, 64), -127, 127, jnp.int8)
    bidx4 = jax.random.randint(jax.random.PRNGKey(6), (R,), 0, Nb4,
                               jnp.int32)
    eidx4 = jax.random.randint(jax.random.PRNGKey(7), (R, 2), 0, 64,
                               jnp.int32)

    def pipe4(t, bi, ei):
        w = jax.lax.bitcast_convert_type(
            t[bi].reshape(R, 16, 4), jnp.int32)
        grp = jnp.take_along_axis(w, ei // 4, axis=1)
        v = (grp >> ((ei % 4) * 8)) & 0xFF
        return jnp.where(v >= 128, v - 256, v).astype(jnp.float32).sum()
    timeit(jax.jit(pipe4), btab4, bidx4, eidx4,
           name="4^3 brick int8 + bit extract (K=2)", rows=R)


if __name__ == "__main__":
    main()
