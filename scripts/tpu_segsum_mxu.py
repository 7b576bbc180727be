#!/usr/bin/env python
"""Round-5 probe: MXU one-hot histogram peel vs full batched sort for the
stochastic hash-grid backward segment sum.

In the stochastic-corner regime each level's sorted rows are M=262k updates
+ T_max=524k query pad; the small dense levels (4k-120k tables) waste ~all
of that pad. ops/segments.py's round-5 peel computes those levels' dense
cotangent as one-hot MXU matmuls (Pallas, VMEM-tiled A). This measures, at
the b32 training shape, the batched segment sum with the peel threshold at
0 (off) / 16k / 64k / 128k / 256k, plus kernel-vs-sort agreement.

Run: python scripts/tpu_segsum_mxu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from arnerf_tpu.ops.hashgrid import HashGridConfig, ngp_growth_factor
    from arnerf_tpu.ops import segments

    print("devices:", jax.devices(), flush=True)
    cfg = HashGridConfig(per_level_scale=ngp_growth_factor(0.5))
    sizes = cfg.level_sizes
    print("level sizes:", sizes, flush=True)

    L = cfg.n_levels
    M = 262144                      # 8192 rays x 32 samples, stoch corners
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, sizes[l], M).astype(np.int32)
                    for l in range(L)])
    g0 = rng.normal(size=(L, M)).astype(np.float32) * 1e-2
    g1 = rng.normal(size=(L, M)).astype(np.float32) * 1e-2
    idx_d = jnp.asarray(idx)
    g_d = (jnp.asarray(g0), jnp.asarray(g1))

    def run(thresh):
        os.environ["ARNERF_MXU_HIST"] = str(thresh)

        @jax.jit
        def f(i, a, b):
            return segments.dense_segment_sum_batched(
                i, (a, b), sizes, method="sort")

        out = f(idx_d, *g_d)
        out.block_until_ready()
        # sync via scalar fetch (tunnel-safe)
        float(jnp.sum(jnp.abs(out[:100])))
        t0 = time.time()
        n = 8
        for _ in range(n):
            out = f(idx_d, *g_d)
        float(jnp.sum(jnp.abs(out[:100])))
        dt = (time.time() - t0) / n
        return out, dt

    ref, dt0 = run(0)
    print(f"peel off (full sort): {dt0 * 1e3:.1f} ms", flush=True)
    for thresh in (16384, 65536, 131072, 262144):
        out, dt = run(thresh)
        n_peel = sum(1 for s in sizes if s <= thresh)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"peel<= {thresh:>6} ({n_peel} levels): {dt * 1e3:.1f} ms, "
              f"max|diff|={err:.2e} (ref max {scale:.2e})", flush=True)


if __name__ == "__main__":
    main()
