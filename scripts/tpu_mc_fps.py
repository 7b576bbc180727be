"""VERDICT r3 #3 'done' measurement: multi-cascade baked FPS within 2x of
the single-cascade path at comparable occupied rows.

Bakes the SAME analytic object field two ways on the chip — (a) the
single-cascade production bake (bake_analytic_field, 256^3) and (b) a
3-cascade bake_field_mc whose inner cascade covers the same geometry
(scale 2.0, so cascade 0 half-extent = 0.5 == the single-cascade cube) —
then times 800x800 GUI-spec frames through the shared
baked_frame_device_fn. The MC path now carries the round-4 optimizations
(outer-cube distance prelude, survivor compaction, split+int8 color),
so the ratio isolates the remaining MC overhead (exponential stepper,
concatenated-table indexing).

Usage: python scripts/tpu_mc_fps.py [bake_res] [frames]
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
    from arnerf_tpu.datasets.synthetic import (bake_analytic_field,
                                               analytic_sigma, analytic_rgb)
    from arnerf_tpu.rendering_baked import (bake_field_mc,
                                            cascade_half_extents,
                                            baked_frame_device_fn)
    from arnerf_tpu.datasets.ray_utils import get_rays, get_ray_directions
    from arnerf_tpu.utils.sync import device_sync

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print("devices:", jax.devices(), flush=True)

    # GUI-spec rays (800x800, 45 deg) orbiting the object
    f800 = 0.5 * 800 / np.tan(0.5 * np.deg2rad(45.0))
    K800 = np.array([[f800, 0, 400], [0, f800, 400], [0, 0, 1]], np.float32)
    dirs800 = jnp.asarray(get_ray_directions(800, 800, K800))

    def look_at(eye):
        from arnerf_tpu.datasets.ray_utils import look_at_pose
        return jnp.asarray(look_at_pose(np.asarray(eye, np.float64)))

    def time_frames(baked, eye_r, label):
        ro, rd = get_rays(dirs800, look_at(np.array([0.9, 0.35, 0.75])
                                           * eye_r))
        frame = baked_frame_device_fn(baked, ro, rd, T_threshold=1e-2,
                                      img_wh=(800, 800))
        fkeys = list(jax.random.split(jax.random.PRNGKey(7), n_frames + 1))
        device_sync(frame(fkeys[0]))                              # warm
        t0 = time.time()
        acc = 0.0
        for k in fkeys[1:]:
            acc = acc + frame(k)
        device_sync(acc)
        fps = n_frames / (time.time() - t0)
        occ = (float((np.asarray(baked.sigma) > 0).mean())
               if baked.sigma is not None else -1.0)
        print(f"{label}: {fps:.2f} FPS device @800x800 "
              f"(occ {occ:.4f}, cascades {baked.cascades})", flush=True)
        return fps

    # (a) single-cascade production bake
    t0 = time.time()
    baked_sc = bake_analytic_field(scale=0.5, resolution=B)
    device_sync(baked_sc.rows)
    print(f"single-cascade bake {B}^3: {time.time() - t0:.1f}s", flush=True)
    fps_sc = time_frames(baked_sc, 1.6, "single-cascade")

    # (b) 3-cascade bake of the SAME world-space object: geometry is the
    # scale-0.5 analytic object (fits cascade 0 of the scale-2 nest), so
    # inner content matches (a) exactly and the outer cascades are almost
    # empty — realistic unbounded-scene statistics.
    SC = 2.0

    def field(x, d):
        return (analytic_sigma(x, 0.5, object_only=True),
                analytic_rgb(x, 0.5))

    masks = []
    for h in cascade_half_extents(3, SC):
        ax = (np.arange(B, dtype=np.float32) + 0.5) / B * 2 * h - h
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
        masks.append(np.asarray(
            analytic_sigma(pts, 0.5, object_only=True)) > 1e-2)
    t0 = time.time()
    baked_mc = bake_field_mc(field, SC, 3, resolution=B, occ_masks=masks,
                             n_dirs=16)
    device_sync(baked_mc.sigma)
    print(f"3-cascade bake {B}^3 x3: {time.time() - t0:.1f}s", flush=True)
    # same eye as (a): the tight occupied-AABB cull sees the same object
    # either way, so ray statistics match
    fps_mc = time_frames(baked_mc, 1.6, "multi-cascade")
    # prelude-off A/B isolates what the round-4 port bought
    baked_mc_np = baked_mc._replace(mip_dist=None)
    fps_mc_np = time_frames(baked_mc_np, 1.6, "multi-cascade noprelude")
    print(f"ratio single/mc: {fps_sc / max(fps_mc, 1e-9):.2f}x "
          f"(prelude gain {fps_mc / max(fps_mc_np, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
