"""TPU A/B: exact 8-corner vs stochastic single-corner training step.

Measures render_train fwd+bwd (the full training-step compute minus Adam)
and the non-warmup grid update, at production shapes (batch 8192, bf16,
budget 32 and 16), with stoch_corners off/on. Timing discipline per
utils/sync.py / DESIGN.md: scalar-fetch sync, warmup, mean over chained
iterations.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
from arnerf_tpu.models.ngp import update_density_grid
from arnerf_tpu.ops.intersection import ray_aabb_intersect_single
from arnerf_tpu.rendering import render_train


def sync(x):
    """Scalar-reduce sync (utils/sync.py): fetching a whole leaf times the
    ~30 MB/s tunnel, not the device (round-3 finding; numbers recorded
    from earlier runs of this script may carry that readback)."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def timeit(fn, n=6, warmup=2, name=""):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    cfg_ex = NGPConfig(scale=0.5, compute_dtype="bfloat16")
    cfg_st = NGPConfig(scale=0.5, compute_dtype="bfloat16",
                       stoch_corners=True)
    params = ngp_init(jax.random.PRNGKey(0), cfg_ex)

    N = 8192
    gs = grid_state_init(cfg_ex)
    occ = (jax.random.uniform(jax.random.PRNGKey(2),
                              gs.occ_flat.shape) < 0.1).astype(jnp.uint8)
    gs = gs._replace(occ_flat=occ)
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.2], (N, 1)), jnp.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    dv = tgt - np.asarray(rays_o)
    rays_d = jnp.asarray(dv / np.linalg.norm(dv, axis=1, keepdims=True))

    for budget in (32, 16):
        m_cap = N * budget
        for label, cfg, st in (("exact", cfg_ex, False),
                               ("stoch", cfg_st, True)):
            def loss(p, key):
                out = render_train(p, gs, rays_o, rays_d, key, cfg,
                                   m_cap=m_cap, stoch=st)
                return jnp.mean(out["rgb"] ** 2)
            vg = jax.jit(jax.value_and_grad(loss))
            k = jax.random.PRNGKey(3)
            timeit(lambda: vg(params, k),
                   name=f"render_train fwd+bwd b{budget} {label}")

    for label, cfg in (("exact", cfg_ex), ("stoch", cfg_st)):
        u = jax.jit(partial(update_density_grid, cfg=cfg,
                            density_threshold=5.9, warmup=False))
        timeit(lambda: u(params, gs, jax.random.PRNGKey(4)),
               n=4, name=f"grid update non-warmup {label}")


if __name__ == "__main__":
    main()
