"""Round-3 step anatomy: where the stochastic-corner training step spends
its time, component by component, at production shapes (batch 8192, bf16,
budget 16/32). Produces the DESIGN.md anatomy table.

Components timed separately (each its own jitted program, scalar-sync):
  march      - march_rays_train (candidates + two-level prune + compaction)
  enc_fwd    - stochastic hash encode forward (N*budget samples)
  enc_fb     - encode fwd+bwd through trunc_exp (table cotangent segsum)
  field_fb   - full field (encode+MLPs+SH) fwd+bwd
  rt_fwd     - render_train forward
  rt_fb      - render_train fwd+bwd (the step minus sampling/Adam)
  adam       - optax adam update on the full param pytree
  block/16   - full production train_block amortized per step
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
from arnerf_tpu.ops.hashgrid import hashgrid_encode
from arnerf_tpu.ops.marching import march_rays_train
from arnerf_tpu.rendering import render_train


def sync(x):
    """Scalar-reduce sync (utils/sync.py): fetching a whole leaf would time
    the ~30 MB/s tunnel, not the device — the round-3 anatomy's first run
    did exactly that and measured readback, not compute."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.max(jnp.abs(jnp.ravel(leaf)))
                            .astype(jnp.float32)))


def timeit(fn, n=8, warmup=2, name=""):
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


def stream_gbps(iters=24):
    x = jax.random.normal(jax.random.PRNGKey(0), (1 << 15, 2048))
    f = jax.jit(lambda s: s * 2.0 + 1.0)
    sync(f(x))
    t0 = time.time()
    out = x
    for _ in range(iters):
        out = f(out)
    sync(out)
    return (x.size * 4 * 2) / ((time.time() - t0) / iters) / 1e9


def main():
    print("devices:", jax.devices(), flush=True)
    # window hunt: starved-window numbers are not comparable
    for attempt in range(12):
        w = stream_gbps()
        print(f"window probe {attempt}: {w:.0f} GB/s", flush=True)
        if w >= 100.0 or "--any_window" in sys.argv:
            break
        time.sleep(45)

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    N = 8192
    gs = grid_state_init(cfg)
    occ = (jax.random.uniform(jax.random.PRNGKey(2),
                              gs.occ_flat.shape) < 0.1).astype(jnp.uint8)
    from arnerf_tpu.ops.packbits import packbits
    gs = gs._replace(occ_flat=occ,
                     bitfield=packbits(occ.astype(jnp.float32), 0.5))
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.2], (N, 1)), jnp.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    dv = tgt - np.asarray(rays_o)
    rays_d = jnp.asarray(dv / np.linalg.norm(dv, axis=1, keepdims=True))
    key = jax.random.PRNGKey(3)

    for budget in (16, 32):
        m_cap = N * budget
        print(f"--- budget {budget} (m_cap {m_cap}) ---", flush=True)

        # marching alone (the exact render_train call pattern)
        from arnerf_tpu.ops.intersection import ray_aabb_intersect_single
        from arnerf_tpu.ops.marching import (build_coarse_occupancy,
                                             coarse_dilation_radius)
        from arnerf_tpu.rendering import default_candidates, MAX_SAMPLES

        def march_only(ro, rd, nz):
            hits = ray_aabb_intersect_single(ro, rd, jnp.zeros(3),
                                             jnp.full(3, cfg.scale))
            occ_coarse = build_coarse_occupancy(
                gs.occ_flat, cfg.cascades, cfg.grid_size,
                dilate=coarse_dilation_radius(
                    scale=cfg.scale, exp_step_factor=0.0,
                    grid_size=cfg.grid_size, max_samples=MAX_SAMPLES))
            mr = march_rays_train(
                ro, rd, hits, gs.occ_flat, nz, scale=cfg.scale,
                cascades=cfg.cascades, exp_step_factor=0.0,
                grid_size=cfg.grid_size, max_samples=MAX_SAMPLES,
                n_candidates=default_candidates(cfg, 0.0, MAX_SAMPLES),
                m_cap=m_cap, s_cap=MAX_SAMPLES, occ_coarse=occ_coarse,
                seg_cap=64)
            return mr.xyzs
        mfj = jax.jit(march_only)
        noise = jax.random.uniform(jax.random.PRNGKey(9), (N,))
        timeit(lambda: mfj(rays_o, rays_d, noise), name="march")

        # encode forward / fwd+bwd at the compact-buffer volume
        x = jax.random.uniform(jax.random.PRNGKey(1), (m_cap, 3))
        seed = jnp.uint32(7)
        ef = jax.jit(lambda t, xx: hashgrid_encode(t, xx, cfg.hash_cfg,
                                                   seed=seed))
        tbl = params["hash_table"].astype(jnp.bfloat16)
        timeit(lambda: ef(tbl, x), name="enc_fwd")
        gf = jax.jit(jax.grad(
            lambda t, xx: jnp.sum(jnp.tanh(
                hashgrid_encode(t, xx, cfg.hash_cfg, seed=seed)))))
        timeit(lambda: gf(tbl, x), name="enc_fb")

        # full field fwd+bwd (encode + MLPs + SH)
        from arnerf_tpu.models.ngp import ngp_forward
        d = jax.random.normal(jax.random.PRNGKey(4), (m_cap, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def field_loss(p):
            sig, rgb = ngp_forward(p, x, d, cfg, seed=seed)
            return jnp.mean(rgb ** 2) + jnp.mean(jnp.tanh(sig))
        ffb = jax.jit(jax.grad(field_loss))
        timeit(lambda: ffb(params), name="field_fb")

        # render_train forward and fwd+bwd
        rf = jax.jit(lambda p, k: render_train(
            p, gs, rays_o, rays_d, k, cfg, m_cap=m_cap, stoch=True)["rgb"])
        timeit(lambda: rf(params, key), name="rt_fwd")

        def rt_loss(p, k):
            out = render_train(p, gs, rays_o, rays_d, k, cfg,
                               m_cap=m_cap, stoch=True)
            return jnp.mean(out["rgb"] ** 2)
        rfb = jax.jit(jax.value_and_grad(rt_loss))
        timeit(lambda: rfb(params, key), name="rt_fb")

    # Adam alone
    import optax
    tx = optax.adam(1e-2, eps=1e-15)
    ost = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def adam_step(p, o, g):
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o
    timeit(lambda: adam_step(params, ost, grads), name="adam")

    # grid update (non-warmup)
    u = jax.jit(partial(update_density_grid, cfg=cfg,
                        density_threshold=5.9, warmup=False))
    timeit(lambda: u(params, gs, jax.random.PRNGKey(4)), n=4,
           name="grid_update (/16 per step)")

    print(f"window now: {stream_gbps():.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
