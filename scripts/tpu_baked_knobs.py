"""Round-4 baked-renderer knob sweep on the chip: phase ladder
granularity (phase_floor / phase_max), samples_per_round, n_steps.

The slab-scene frame is FINE-LOOP row-bound (54.5M sigma-gather rows at
~11 ns, DESIGN.md round-4): rows = sum over rounds of alive-prefix x S,
so finer phase halving (more, smaller prefixes) and smaller S let
saturated/exhausted rays stop paying sooner — at the cost of more
while-loop iterations and compactions (~1-2 ms each). This sweep measures
the actual trade on one bake, both for the full scene (slab) and the
object-only field, and anchors quality vs the analytic oracle at 256^2
so row cuts can't silently cost dB.

Usage: python scripts/tpu_baked_knobs.py [bake_res] [frames]
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
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig, NeRFTrainer
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import (SyntheticDataset,
                                               SyntheticConfig,
                                               bake_analytic_field,
                                               render_analytic)
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.rendering_baked import (bake_ngp, cull_and_buckets,
                                            render_baked_uniform)
    from arnerf_tpu.utils.sync import device_sync

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("devices:", jax.devices(), flush=True)

    wh = 256
    scfg = SyntheticConfig(img_wh=(wh, wh), n_train=24, n_test=2,
                           gt_samples=512)
    cache = f"/tmp/arnerf_bench_data_{wh}.npz"
    blob = np.load(cache)
    train_ds = SyntheticDataset(split="train", config=scfg, read_meta=False)
    test_ds = SyntheticDataset(split="test", config=scfg, read_meta=False)
    train_ds.rays, test_ds.rays = blob["train_rays"], blob["test_rays"]

    cfg = NGPConfig(scale=0.5, compute_dtype="bfloat16", stoch_corners=True)
    tc = TrainConfig(batch_size=8192, loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, train_ds, test_ds, key=jax.random.PRNGKey(0))
    print("sweep: training 512 steps", file=sys.stderr, flush=True)
    tr.fit(n_steps=512, log_every=256)
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))
    pose = jnp.asarray(test_ds.poses[0])
    rays_o, rays_d = get_rays(dirs800, pose)

    def frame_fn(bk, **kw):
        buckets, _, blocked = cull_and_buckets(bk, rays_o, rays_d, 1 << 18,
                                               img_wh=(800, 800))
        reduce_fn = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))

        def frame(key):
            outs = []
            for sl, ro, rd, n in buckets:
                res = render_baked_uniform(
                    bk.rows, bk.aabb_lo, bk.aabb_hi, ro, rd, key,
                    B=bk.resolution, scale=bk.scale, T_threshold=1e-2,
                    mip=bk.mip, sigma=bk.sigma, block4=blocked,
                    row_index=bk.row_index, rows_q=bk.rows_q,
                    mip_dist=bk.mip_dist, **kw)
                outs.append(res["rgb"])
            return reduce_fn(outs) if outs else jnp.float32(0.0)
        return frame

    # Round-1 sweep findings (bench_runs/r4_knobs_round1.log): S8 is 3x
    # WORSE than S16 (0.24 vs 0.69 slab FPS) and finer phase ladders are
    # neutral (0.70) — the frame is dominated by PER-ROUND fixed work,
    # led by the color-bucket fetch: Wc rows/ray/round REGARDLESS of S
    # (2 gathers each: narrow row_index + 32 B rows_q). Hence round 2
    # probes LARGER S (fewer rounds -> fewer color fetches) and smaller
    # color windows.
    variants = [
        ("base (S16 Wc8)", dict()),
        ("S32", dict(samples_per_round=32)),
        ("S48", dict(samples_per_round=48)),
        ("Wc4", dict(color_window=4)),
        ("S32 Wc4", dict(samples_per_round=32, color_window=4)),
        ("S64", dict(samples_per_round=64)),
        ("S32 Wc16", dict(samples_per_round=32, color_window=16)),
    ]
    # quality anchor rays (256^2, full scene)
    f256 = 0.5 * 256 / np.tan(0.5 * np.deg2rad(scfg.fov_deg))
    K256 = np.array([[f256, 0, 128], [0, f256, 128], [0, 0, 1]], np.float32)
    d256 = jnp.asarray(get_ray_directions(256, 256, K256))
    ro256, rd256 = get_rays(d256, pose)
    rdn = rd256 / jnp.linalg.norm(rd256, axis=-1, keepdims=True)
    gt, _, _ = render_analytic(ro256, rdn, cfg.scale, n_samples=512,
                               object_only=True)

    # scene-major: one 256^3 bake resident at a time (two at once OOM'd
    # the pool slice)
    import gc
    for label in ("slab", "object"):
        if label == "slab":
            t0 = time.time()
            bk = bake_ngp(tr.model_params, tr.grid_state, cfg, resolution=B)
            device_sync(bk.rows)
            print(f"sweep: slab baked in {time.time() - t0:.0f}s",
                  flush=True)
        else:
            bk = bake_analytic_field(scale=cfg.scale, resolution=B)
            device_sync(bk.rows)
        for name, kw in variants:
            fr = frame_fn(bk, **kw)
            keys = list(jax.random.split(jax.random.PRNGKey(7),
                                         n_frames + 1))
            device_sync(fr(keys[0]))
            t0 = time.time()
            acc = 0.0
            for k in keys[1:]:
                acc = acc + fr(k)
            device_sync(acc)
            fps = n_frames / (time.time() - t0)
            extra = ""
            if label == "object":
                from arnerf_tpu.rendering_baked import render_baked
                res = render_baked(bk, tr.grid_state, ro256, rd256, cfg,
                                   key=jax.random.PRNGKey(3),
                                   T_threshold=1e-2, img_wh=(256, 256),
                                   **{k: v for k, v in kw.items()
                                      if k in ("samples_per_round",
                                               "n_steps", "color_window")})
                pred = (jnp.clip(res["rgb"], 0, 1)
                        + (1.0 - res["opacity"])[:, None])
                mse = float(jnp.mean((jnp.clip(pred, 0, 1) - gt) ** 2))
                extra = f" | {-10 * np.log10(max(mse, 1e-10)):.1f} dB"
            print(f"[{name}] {label}: {fps:.2f} FPS{extra}", flush=True)
        del bk
        gc.collect()


if __name__ == "__main__":
    main()
