"""Find a TPU-compilable configuration of the test renderer: single round
program vs while_loop, various sizes."""

import sys
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


def main():
    print("devices:", jax.devices(), flush=True)
    from arnerf_tpu.models import NGPConfig, ngp_init, grid_state_init
    from arnerf_tpu.rendering import render_test_chunk
    from arnerf_tpu.ops.marching import march_rays_test
    from arnerf_tpu.models.ngp import ngp_forward

    cfg = NGPConfig(scale=0.5)
    params = ngp_init(jax.random.PRNGKey(0), cfg)
    gs = grid_state_init(cfg)
    occ = (jax.random.uniform(jax.random.PRNGKey(2),
                              gs.occ_flat.shape) < 0.1).astype(jnp.uint8)
    gs = gs._replace(occ_flat=occ)
    N = 1 << 14
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, -1.2], (N, 1)), jnp.float32)
    tgt = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = tgt - np.asarray(rays_o)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    # A) single marching round alone
    try:
        t0 = time.time()
        out = march_rays_test(rays_o, rays_d, jnp.full(N, 0.7),
                              jnp.full(N, 1.7), occ, scale=0.5, cascades=1,
                              exp_step_factor=0.0, grid_size=128,
                              max_samples=128, n_candidates=512,
                              n_samples=32)
        sync(out)
        print(f"A march_rays_test round: ok ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"A march round FAILED: {str(e)[:120]}", flush=True)

    # B) field eval at render batch size
    try:
        x = jax.random.uniform(jax.random.PRNGKey(1), (N * 32, 3))
        dd = jax.random.normal(jax.random.PRNGKey(2), (N * 32, 3))
        t0 = time.time()
        sync(ngp_forward(params, x, dd, cfg))
        print(f"B field eval {N*32}: ok ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"B field FAILED: {str(e)[:120]}", flush=True)

    # C) full while_loop chunk
    try:
        t0 = time.time()
        out = render_test_chunk(params, gs, rays_o, rays_d, cfg,
                                T_threshold=1e-2, max_samples=128)
        sync(out["rgb"])
        print(f"C while_loop chunk: ok ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"C while_loop FAILED: {str(e)[:160]}", flush=True)

    # D) bounded-round variant (max_rounds static -> still while_loop but
    # maybe the cond shape differs)
    try:
        t0 = time.time()
        out = render_test_chunk(params, gs, rays_o, rays_d, cfg,
                                T_threshold=1e-2, max_samples=128,
                                max_rounds=2, return_state=True)
        sync(out["rgb"])
        print(f"D bounded rounds: ok ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"D bounded FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
