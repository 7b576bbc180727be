"""Quick chip A/B: dense_segment_sum_batched level-grouping (round 4).

One batch mixing 4k-row and 512k-row levels pads every query block to
T_max — grouping levels into two contiguous runs removes ~17% of sorted
rows at the bench shape (5 small + 11 big levels, M=262144). This times
the shipped (auto-grouping) implementation against a forced single-batch
variant at b32 and b16 shapes.

Usage: python scripts/tpu_segsum_group.py
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
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(jax.tree.leaves(x)[0])))
                            .astype(jnp.float32)))


def timeit(fn, *args, warm=2, iters=8):
    out = None
    for _ in range(warm):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    from arnerf_tpu.models import NGPConfig
    import arnerf_tpu.ops.segments as seg

    hc = NGPConfig().hash_cfg
    sizes = hc.level_sizes
    L = len(sizes)
    print("devices:", jax.devices(), flush=True)
    for M in (262144, 131072):
        kk = jax.random.PRNGKey(1)
        idx = jax.random.randint(kk, (L, M), 0,
                                 jnp.asarray(sizes, jnp.int32)[:, None],
                                 dtype=jnp.int32)
        cols = tuple(jax.random.normal(jax.random.fold_in(kk, j), (L, M))
                     for j in range(2))
        grouped = jax.jit(lambda i, a, b: seg.dense_segment_sum_batched(
            i, (a, b), sizes, method="sort"))

        jsingle = jax.jit(lambda i, a, b: seg.dense_segment_sum_batched(
            i, (a, b), sizes, method="sort", group=False))
        g = grouped(idx, *cols)
        s = jsingle(idx, *cols)
        err = float(jnp.max(jnp.abs(g - s)))
        tg = timeit(grouped, idx, *cols)
        ts = timeit(jsingle, idx, *cols)
        print(f"M={M}: grouped {tg * 1e3:.1f} ms | single-batch "
              f"{ts * 1e3:.1f} ms (max|err| {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
