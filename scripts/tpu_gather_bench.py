"""Isolate raw gather / scatter-add costs on the TPU for hash-table shapes."""

import time
from functools import partial

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


def timeit(fn, *args, n=6, warmup=2, name=""):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    E = 7_340_032            # ~ total hash entries
    M = 1 << 25              # 33.5M index ops (262k samples x 16 x 8)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (E, 2), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, E, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(2), (M, 2), jnp.float32)

    # reference point: contiguous stream of the same byte volume
    stream = jax.random.normal(key, (M, 2))
    timeit(jax.jit(lambda s: s * 2.0 + 1.0), stream,
           name="elementwise 33.5Mx2 f32 (stream bound)")

    g1 = jax.jit(lambda t, i: t[i])
    timeit(g1, table, idx, name="gather rows (M,) -> (M,2)")

    tb = table.astype(jnp.bfloat16)
    timeit(g1, tb, idx, name="gather rows bf16")

    g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0, unique_indices=False,
                                       indices_are_sorted=False))
    timeit(g2, table, idx, name="jnp.take rows")

    idx_sorted = jnp.sort(idx)
    g3 = jax.jit(lambda t, i: jnp.take(t, i, axis=0,
                                       indices_are_sorted=True))
    timeit(g3, table, idx_sorted, name="take rows (sorted indices)")

    s1 = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(v))
    timeit(s1, table, idx, vals, n=3, name="scatter-add (M,2)")

    def sort_segsum(i, v):
        order = jnp.argsort(i)
        si = i[order]
        sv = v[order]
        return jax.ops.segment_sum(sv, si, num_segments=E)
    timeit(jax.jit(sort_segsum), idx, vals, n=3,
           name="argsort+segment_sum (M,2)")

    # smaller scatter (single level: 2^19 table, 2M updates)
    M2 = 1 << 21
    idx2 = idx[:M2] & ((1 << 19) - 1)
    vals2 = vals[:M2]
    t2 = table[:1 << 19]
    timeit(s1, t2, idx2, vals2, n=3, name="scatter-add 2M -> 2^19")

    # one fused program doing gather+trilerp-ish math (checks fusion overhead)
    def fused(t, i):
        f = t[i]
        return jnp.sum(f * 0.5, axis=-1)
    timeit(jax.jit(fused), table, idx, name="gather+reduce fused")


if __name__ == "__main__":
    main()
