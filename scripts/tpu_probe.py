"""TPU microbenchmark probe: where does the training step time go?

Run on the real chip:  python scripts/tpu_probe.py
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    """Force a real device->host readback (block_until_ready can be a no-op
    through the remote tunnel)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n


def section(name, fn):
    try:
        fn()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.ops.hashgrid import hashgrid_encode
    from arnerf_tpu.rendering import render_train
    from arnerf_tpu.ops.marching import march_rays_train
    from arnerf_tpu.ops.intersection import ray_aabb_intersect_single

    cfg = NGPConfig(scale=0.5)
    key = jax.random.PRNGKey(0)
    params = ngp_init(key, cfg)

    # 1) hash encode fwd / bwd at typical sample counts
    for n in (1 << 17, 1 << 18, 1 << 19):
      try:
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

        f = jax.jit(lambda t, xx: hashgrid_encode(t, xx, cfg.hash_cfg))
        t_fwd = timeit(f, params["hash_table"], x)

        g = jax.jit(jax.grad(
            lambda t, xx: jnp.sum(hashgrid_encode(t, xx, cfg.hash_cfg) ** 2)))
        t_bwd = timeit(g, params["hash_table"], x)
        print(f"hash_encode n={n}: fwd {t_fwd*1e3:.2f} ms, "
              f"fwd+bwd(scatter) {t_bwd*1e3:.2f} ms", flush=True)
      except Exception as e:
        print(f"hash_encode n={n}: FAILED {str(e)[:160]}", flush=True)

    # 2) marching alone, batch 8192, carved grid (10% occupancy)
    N = 8192
    gs = grid_state_init(cfg)
    occ = (jax.random.uniform(jax.random.PRNGKey(2),
                              gs.occ_flat.shape) < 0.1).astype(jnp.uint8)
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.2], (N, 1)), jnp.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - np.asarray(rays_o)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hits = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                     jnp.full(3, cfg.scale))
    noise = jnp.zeros(N)

    from functools import partial
    march = partial(march_rays_train, scale=cfg.scale, cascades=cfg.cascades,
                    exp_step_factor=0.0, grid_size=cfg.grid_size,
                    max_samples=1024, n_candidates=1024,
                    m_cap=N * 48, s_cap=1024)
    try:
        t_march = timeit(lambda: march(rays_o, rays_d, hits, occ, noise))
        print(f"march_rays_train 8192x1024cand: {t_march*1e3:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"march: FAILED {str(e)[:160]}", flush=True)

    # 3) full differentiable render + grad at batch 8192
    gs = gs._replace(occ_flat=occ)

    def loss(p):
        out = render_train(p, gs, rays_o, rays_d, jax.random.PRNGKey(3), cfg,
                           m_cap=N * 48)
        return jnp.mean(out["rgb"] ** 2)

    try:
        vg = jax.jit(jax.value_and_grad(loss))
        t_step = timeit(lambda: vg(params))
        print(f"render_train fwd+bwd 8192 rays (m_cap 393k): "
              f"{t_step*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"render_train 393k: FAILED {str(e)[:160]}", flush=True)

    # 4) same with m_cap 16/ray
    def loss16(p):
        out = render_train(p, gs, rays_o, rays_d, jax.random.PRNGKey(3), cfg,
                           m_cap=N * 16)
        return jnp.mean(out["rgb"] ** 2)
    try:
        vg16 = jax.jit(jax.value_and_grad(loss16))
        t16 = timeit(lambda: vg16(params))
        print(f"render_train fwd+bwd 8192 rays (m_cap 131k): "
              f"{t16*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"render_train 131k: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
