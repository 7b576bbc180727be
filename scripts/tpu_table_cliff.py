#!/usr/bin/env python
"""Where does the wide-row gather rate cliff with table size?

The baked renderer's 32-float-row fetch from a 2.1 GB (256^3, 32) table
measured ~38 ns/row while the 32 KB mip gathers ran at ~8.6 ns/row and the
round-2 model says ~6.3 ns/row for small tables (DESIGN.md). This probe
maps ns/row against (a) table bytes, (b) element dtype (f32 vs bf16),
(c) index locality (pure random vs ray-local blocks vs sorted), and (d) a
split sigma-table fetch ((B^3,) f32) — the candidate fixes.

Run on the TPU: python scripts/tpu_table_cliff.py
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def timeit(fn, *args, n=6, warmup=2, name=""):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / n
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    M = 1 << 22                      # 4.2M rows/round, the frame shape
    key = jax.random.PRNGKey(0)

    g = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    g_nocast = jax.jit(lambda t, i: t[i].sum())

    print(f"M = {M/1e6:.1f}M gathered rows per call", flush=True)
    print("table_MB  width dtype  idx      ns/row", flush=True)

    for B in (96, 128, 160, 192, 224, 256):
        V = B ** 3
        idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, V,
                                 jnp.int32)
        # ray-local: blocks of 16 samples stepping ~2 voxels diagonally
        # from random bases (the renderer's actual access pattern)
        base = np.random.default_rng(2).integers(
            0, max(1, V - 40 * (B * B + B + 1)), M // 16)
        loc = jnp.asarray(
            (base[:, None] + (np.arange(16) * (B * B + B + 1) * 2)[None, :])
            .reshape(-1).astype(np.int32))

        table = jax.random.normal(key, (V, 32), jnp.float32)
        tb = table.astype(jnp.bfloat16)
        mb = V * 32 * 4 / 1e6
        t_f32 = timeit(g_nocast, table, idx) / M * 1e9
        print(f"{mb:8.0f}  32    f32    random   {t_f32:6.1f}", flush=True)
        t_bf = timeit(g, tb, idx) / M * 1e9
        print(f"{mb/2:8.0f}  32    bf16   random   {t_bf:6.1f}", flush=True)
        idx_s = jnp.sort(idx)
        t_srt = timeit(g_nocast, table, idx_s) / M * 1e9
        print(f"{mb:8.0f}  32    f32    sorted   {t_srt:6.1f}", flush=True)
        t_loc = timeit(g_nocast, table, loc) / M * 1e9
        print(f"{mb:8.0f}  32    f32    raylocal {t_loc:6.1f}", flush=True)
        # sigma-only narrow fetch from a (V,) table
        sig = table[:, 0]
        gs = jax.jit(lambda t, i: t[i].sum())
        t_sig = timeit(gs, sig, idx) / M * 1e9
        print(f"{V*4/1e6:8.0f}   1    f32    random   {t_sig:6.1f}",
              flush=True)
        del table, tb, sig


if __name__ == "__main__":
    main()
