"""Focused TPU timing with forced readback sync: separates per-dispatch
tunnel latency from actual kernel time."""

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


def timeit(fn, *args, n=8, warmup=2, name=""):
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

    # 0) dispatch latency: trivial program
    f0 = jax.jit(lambda x: x + 1.0)
    x0 = jnp.ones((8, 128))
    timeit(f0, x0, n=20, name="trivial dispatch")

    # 0b) medium matmul: 4096^2 @ 4096^2 (~137 GFLOP)
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    fm = jax.jit(lambda a: a @ a)
    timeit(fm, a, n=8, name="bf16 matmul 4096^3 (~137 GFLOP)")

    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.models.ngp import update_density_grid, ngp_forward
    from arnerf_tpu.ops.hashgrid import hashgrid_encode
    from arnerf_tpu.ops.marching import march_rays_train
    from arnerf_tpu.ops.intersection import ray_aabb_intersect_single
    from arnerf_tpu.rendering import render_train
    from functools import partial

    cfg = NGPConfig(scale=0.5)
    params = ngp_init(jax.random.PRNGKey(0), cfg)

    # 1) hash encode fwd/bwd, 256k samples
    n = 1 << 18
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    fh = jax.jit(lambda t, xx: hashgrid_encode(t, xx, cfg.hash_cfg))
    timeit(fh, params["hash_table"], x, name=f"hash fwd {n}")
    gh = jax.jit(jax.grad(
        lambda t, xx: jnp.sum(hashgrid_encode(t, xx, cfg.hash_cfg) ** 2)))
    timeit(gh, params["hash_table"], x, name=f"hash fwd+bwd {n}")

    # 1b) full field fwd 256k
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    ff = jax.jit(lambda p: ngp_forward(p, x, d, cfg))
    timeit(ff, params, name=f"field fwd {n}")

    # 2) marching, batch 8192, 10% occupancy
    N = 8192
    gs = grid_state_init(cfg)
    occ = (jax.random.uniform(jax.random.PRNGKey(2),
                              gs.occ_flat.shape) < 0.1).astype(jnp.uint8)
    gs = gs._replace(occ_flat=occ)
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.2], (N, 1)), jnp.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    dv = tgt - np.asarray(rays_o)
    rays_d = jnp.asarray(dv / np.linalg.norm(dv, axis=1, keepdims=True))
    hits = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                     jnp.full(3, cfg.scale))
    march = jax.jit(partial(
        march_rays_train, scale=cfg.scale, cascades=cfg.cascades,
        exp_step_factor=0.0, grid_size=cfg.grid_size, max_samples=1024,
        n_candidates=1024, m_cap=N * 48, s_cap=1024))
    timeit(lambda: march(rays_o, rays_d, hits, occ, jnp.zeros(N)),
           name="march 8192x1024")

    # 3) render_train fwd+bwd (one training-step-equivalent compute)
    def loss(p):
        out = render_train(p, gs, rays_o, rays_d, jax.random.PRNGKey(3),
                           cfg, m_cap=N * 48)
        return jnp.mean(out["rgb"] ** 2)
    vg = jax.jit(jax.value_and_grad(loss))
    timeit(lambda: vg(params), name="render_train fwd+bwd 8192 (m_cap 393k)")

    # 4) non-warmup grid update
    gs2 = update_density_grid(params, gs, jax.random.PRNGKey(4), cfg,
                              density_threshold=5.9, warmup=False)
    sync(gs2.density_grid)
    timeit(lambda: update_density_grid(params, gs, jax.random.PRNGKey(4),
                                       cfg, density_threshold=5.9,
                                       warmup=False),
           n=4, name="grid update (non-warmup, 1M cells)")


if __name__ == "__main__":
    main()
