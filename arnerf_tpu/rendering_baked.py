"""Baked-field interactive renderer (TPU-native fast path).

The network test renderer evaluates hash-grid + MLP per sample: 16 levels x
8 corners = 128 random narrow-row gathers per sample, and this runtime's
gather engine is issue-rate-bound at ~6.3 ns/row regardless of row width —
~0.8 us/sample, a hard wall far above interactive rates. GPUs hide exactly
this cost with L2-cached random access, which is why the reference's
tinycudann renderer hits 36 FPS (reference show_gui.py) on hardware with
nominally less bandwidth.

The TPU-native answer is to re-shape the data, not the loop: bake the
trained field into ONE dense voxel grid whose row holds everything a sample
needs — density + a 9-term spherical-harmonics radiance fit per channel
(the PlenOctrees/SNeRG recipe: project the trained radiance onto SH by
sampling directions, render view-dependence as a dot product). A sample
then costs a SINGLE wide-row gather:

  * interp="stochastic": one row per sample. The voxel index is rounded
    with per-dimension uniform jitter, which equals trilinear interpolation
    in expectation (P[round(u+j) = floor(u)] = 1-frac per dim, independent
    dims multiply); volume integration along the ray plus pixel averaging
    absorbs the variance.
  * interp="trilinear": exact 8-row trilerp for quality comparisons.

Empty-space skipping, compositing, and early termination reuse the
network renderer's marching/composite ops unchanged, so the baked path
inherits the reference's test-time semantics (march_rays_test,
composite_test_step; reference rendering.py:191-233).

Baking evaluates the field only at occupied voxels (the occupancy bitfield
the trainer already maintains) with a batch of quadrature directions per
voxel, then least-squares-projects onto SH9. `bake_field` takes the field
as a closure so tests can bake the analytic oracle scene directly.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .insert.sh_math import sh9_basis
from .ops.marching import march_rays_test
from .ops.stepping import num_lattice_steps
from .ops.composite import composite_test_step
from .ops.intersection import ray_aabb_intersect_single

# row layout: [sigma, r_sh(9), g_sh(9), b_sh(9), pad(4)] -> 32 channels
N_CH = 32
N_SH = 9


class BakedField(NamedTuple):
    rows: jnp.ndarray        # (B^3, 32) — z-fastest voxel rows
    resolution: int          # B (static)
    scale: float             # AABB half-extent (static)

    # NamedTuple keeps this a pytree; resolution/scale ride as aux via the
    # static argnums of the jitted entry points (callers pass them split).


def fibonacci_sphere(n: int) -> np.ndarray:
    """Deterministic near-uniform sphere directions (n, 3)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z],
                    axis=-1).astype(np.float32)


def bake_field(field_fn, scale: float, resolution: int = 256,
               occ_mask=None, n_dirs: int = 32, chunk: int = 1 << 15,
               dtype=jnp.bfloat16) -> BakedField:
    """Bake a radiance field into a dense SH voxel grid.

    field_fn(xyz (M,3), dirs (M,3)) -> (sigma (M,), rgb (M,3)); it is
    called with each voxel center repeated for `n_dirs` directions.
    occ_mask: optional (B^3,) bool (z-fastest, same layout as rows) — only
    occupied voxels are evaluated; empty rows stay zero (sigma 0).
    """
    B = resolution
    dirs = fibonacci_sphere(n_dirs)                              # (D, 3)
    basis = np.asarray(sh9_basis(jnp.asarray(dirs)))             # (D, 9)
    pinv = np.linalg.pinv(basis)                                 # (9, D)

    ax = (np.arange(B, dtype=np.float32) + 0.5) / B * 2 * scale - scale
    if occ_mask is not None:
        occ_idx = np.nonzero(np.asarray(occ_mask).reshape(-1))[0]
    else:
        occ_idx = np.arange(B ** 3)
    # z-fastest: row = (x * B + y) * B + z
    vx = ax[(occ_idx // (B * B)) % B]
    vy = ax[(occ_idx // B) % B]
    vz = ax[occ_idx % B]
    centers = np.stack([vx, vy, vz], axis=-1)                    # (V, 3)

    rows = np.zeros((B ** 3, N_CH), np.float32)
    d_j = jnp.asarray(dirs)
    pinv_j = jnp.asarray(pinv)

    @jax.jit
    def bake_chunk(c):
        m = c.shape[0]
        x_rep = jnp.repeat(c, n_dirs, axis=0)                    # (m*D, 3)
        d_rep = jnp.tile(d_j, (m, 1))
        sigma, rgb = field_fn(x_rep, d_rep)
        sigma = sigma.reshape(m, n_dirs)[:, 0]
        rgb = rgb.reshape(m, n_dirs, 3)
        coeffs = jnp.einsum("kd,mdc->mkc", pinv_j, rgb)          # (m, 9, 3)
        return sigma, coeffs

    for i in range(0, len(occ_idx), chunk):
        c = jnp.asarray(centers[i:i + chunk])
        sigma, coeffs = bake_chunk(c)
        sl = occ_idx[i:i + chunk]
        rows[sl, 0] = np.asarray(sigma)
        # channel layout: r_sh then g_sh then b_sh
        rows[sl, 1:28] = np.asarray(
            jnp.transpose(coeffs, (0, 2, 1)).reshape(-1, 27))
    return BakedField(rows=jnp.asarray(rows, dtype), resolution=B,
                      scale=scale)


def sample_baked(rows, xyz, sh_d, B: int, scale: float,
                 interp: str, jitter=None):
    """Evaluate the baked field. sh_d: precomputed sh9_basis(dirs) (N, 9).

    interp="stochastic": jitter (N, 3) uniform [0,1) — one row per sample,
    trilinear in expectation. interp="trilinear": exact 8-row blend.
    """
    u = (xyz + scale) / (2 * scale) * B - 0.5     # voxel-center coordinates

    def fetch(ix, iy, iz):
        ii = jnp.clip(ix, 0, B - 1) * (B * B) + \
            jnp.clip(iy, 0, B - 1) * B + jnp.clip(iz, 0, B - 1)
        f = rows[ii].astype(jnp.float32)          # (N, 32)
        return f

    def decode(f):
        sigma = f[:, 0]
        sh = f[:, 1:28].reshape(-1, 3, N_SH)      # (N, 3, 9)
        rgb = jnp.einsum("nck,nk->nc", sh, sh_d)
        return sigma, jnp.maximum(rgb, 0.0)

    if interp == "stochastic":
        idx = jnp.floor(u + jitter).astype(jnp.int32)
        return decode(fetch(idx[:, 0], idx[:, 1], idx[:, 2]))

    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - jnp.floor(u)
    acc = None
    for cx in (0, 1):
        wx = frac[:, 0] if cx else 1.0 - frac[:, 0]
        for cy in (0, 1):
            wy = frac[:, 1] if cy else 1.0 - frac[:, 1]
            for cz in (0, 1):
                wz = frac[:, 2] if cz else 1.0 - frac[:, 2]
                w = (wx * wy * wz)[:, None]
                f = fetch(i0[:, 0] + cx, i0[:, 1] + cy, i0[:, 2] + cz)
                acc = f * w if acc is None else acc + f * w
    return decode(acc)


@partial(jax.jit, static_argnames=(
    "B", "scale", "cascades", "grid_size", "interp", "exp_step_factor",
    "T_threshold", "max_samples", "n_candidates", "samples_per_round",
    "max_rounds", "return_state", "dt_scale"))
def render_baked_chunk(rows, occ_flat, occ_coarse, rays_o, rays_d, key, *,
                       B: int, scale: float, cascades: int, grid_size: int,
                       interp: str = "stochastic",
                       exp_step_factor: float = 0.0,
                       T_threshold: float = 1e-2, max_samples: int = 1024,
                       n_candidates: int = 512, samples_per_round: int = 16,
                       init_state=None, max_rounds: int = 0,
                       return_state: bool = False, dt_scale: float = None):
    """Fixed-shape round loop over the baked field (mirrors
    rendering.render_test_chunk with the 1-gather sampler)."""
    N = rays_o.shape[0]
    hits = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                     jnp.full(3, scale))
    t2 = hits[:, 1]
    S = samples_per_round

    def cond(carry):
        *_, alive, samples_done, rounds, _k = carry
        go = jnp.any(alive) & (samples_done < max_samples)
        if max_rounds:
            go = go & (rounds < max_rounds)
        return go

    def body(carry):
        t_cur, opacity, depth, rgb, alive, samples_done, rounds, k = carry
        xyzs, deltas, ts, n_eff, t_next = march_rays_test(
            rays_o, rays_d, t_cur, t2, occ_flat,
            scale=scale, cascades=cascades,
            exp_step_factor=exp_step_factor, grid_size=grid_size,
            max_samples=max_samples, n_candidates=n_candidates,
            n_samples=S, occ_coarse=occ_coarse, dt_scale=dt_scale)
        n_eff = jnp.where(alive, n_eff, 0)
        flat_x = xyzs.reshape(N * S, 3)
        sh_d = sh9_basis(rays_d / jnp.linalg.norm(
            rays_d, axis=-1, keepdims=True).clip(1e-12))
        sh_rep = jnp.repeat(sh_d, S, axis=0)
        k, k_j = jax.random.split(k)
        jitter = jax.random.uniform(k_j, (N * S, 3)) \
            if interp == "stochastic" else None
        sig, col = sample_baked(rows, flat_x, sh_rep, B, scale,
                                interp, jitter)
        opacity, depth, rgb, still = composite_test_step(
            sig.reshape(N, S), col.reshape(N, S, 3), deltas, ts, n_eff,
            opacity, depth, rgb, T_threshold)
        t_cur = jnp.where(alive, t_next, t_cur)
        alive = alive & still & (t_cur < t2)
        return (t_cur, opacity, depth, rgb, alive,
                samples_done + S, rounds + 1, k)

    if init_state is None:
        from .rendering import NEAR_DISTANCE
        t1 = hits[:, 0]
        t1 = jnp.where((t1 >= 0) & (t1 < NEAR_DISTANCE), NEAR_DISTANCE, t1)
        alive = t1 >= 0
        state = (jnp.where(alive, t1, t2 + 1.0), jnp.zeros(N),
                 jnp.zeros(N), jnp.zeros((N, 3)), alive, jnp.int32(0))
    else:
        state = init_state
    init = (*state[:5], state[5], jnp.int32(0), key)
    t_cur, opacity, depth, rgb, alive, samples_done, rounds, _ = \
        jax.lax.while_loop(cond, body, init)
    out = {"opacity": opacity, "depth": depth, "rgb": rgb}
    if return_state:
        out["state"] = (t_cur, opacity, depth, rgb, alive, samples_done)
    return out


def render_baked(baked: BakedField, grid_state, rays_o, rays_d, cfg, *,
                 key=None, interp: str = "stochastic",
                 T_threshold: float = 1e-2, max_samples: int = 1024,
                 samples_per_round: int = 16, chunk: int = 1 << 18,
                 prehit: bool = True, dt_scale: float = None,
                 exp_step_factor: float = 0.0):
    """Full-frame baked render with the network renderer's prehit
    compaction (rendering.first_hit): background rays die on occupancy
    gathers alone before any field fetch."""
    from .rendering import (first_hit, scene_hits, _pow2_bucket, SQRT3,
                            NEAR_DISTANCE)
    from .ops.marching import build_coarse_occupancy, coarse_dilation_radius

    if key is None:
        key = jax.random.PRNGKey(0)
    N = rays_o.shape[0]
    occ_coarse = None
    if cfg.cascades == 1:
        occ_coarse = build_coarse_occupancy(
            grid_state.occ_flat, cfg.cascades, cfg.grid_size,
            dilate=coarse_dilation_radius(
                scale=cfg.scale, exp_step_factor=exp_step_factor,
                grid_size=cfg.grid_size, max_samples=max_samples,
                dt_scale=dt_scale))

    opacity = np.zeros(N, np.float32)
    depth = np.zeros(N, np.float32)
    rgb = np.zeros((N, 3), np.float32)

    if prehit:
        hits = scene_hits(rays_o, rays_d, cfg)
        step_scale = cfg.scale if dt_scale is None else dt_scale
        diag = 2 * SQRT3 * cfg.scale
        fh_K = num_lattice_steps(NEAR_DISTANCE, NEAR_DISTANCE + diag,
                                 exp_step_factor, max_samples,
                                 cfg.grid_size, step_scale)
        alive0, t_first = first_hit(
            grid_state.occ_flat, occ_coarse, rays_o, rays_d, hits, cfg,
            exp_step_factor=exp_step_factor, max_samples=max_samples,
            n_candidates=fh_K, dt_scale=dt_scale)
        idx0 = np.where(np.asarray(alive0))[0]
        if len(idx0) == 0:
            return {"opacity": jnp.asarray(opacity),
                    "depth": jnp.asarray(depth), "rgb": jnp.asarray(rgb)}
        ro_np, rd_np = np.asarray(rays_o), np.asarray(rays_d)
        tf_np = np.asarray(t_first)
    else:
        idx0 = np.arange(N)
        ro_np, rd_np = np.asarray(rays_o), np.asarray(rays_d)
        tf_np = None

    M = len(idx0)
    bucket = min(chunk, _pow2_bucket(M, 4096))
    for i in range(0, M, bucket):
        sl = idx0[i:i + bucket]
        n = len(sl)
        pad = bucket - n
        ro = jnp.asarray(np.concatenate([ro_np[sl],
                                         np.zeros((pad, 3), np.float32)]))
        rd = jnp.asarray(np.concatenate([rd_np[sl],
                                         np.ones((pad, 3), np.float32)]))
        init_state = None
        if tf_np is not None:
            tc = np.concatenate([tf_np[sl], np.full(pad, 1e9, np.float32)])
            init_state = (jnp.asarray(tc), jnp.zeros(bucket),
                          jnp.zeros(bucket), jnp.zeros((bucket, 3)),
                          jnp.concatenate([jnp.ones(n, bool),
                                           jnp.zeros(pad, bool)]),
                          jnp.int32(0))
        key, k = jax.random.split(key)
        res = render_baked_chunk(
            baked.rows, grid_state.occ_flat, occ_coarse, ro, rd, k,
            B=baked.resolution, scale=baked.scale, cascades=cfg.cascades,
            grid_size=cfg.grid_size, interp=interp,
            exp_step_factor=exp_step_factor, T_threshold=T_threshold,
            max_samples=max_samples, samples_per_round=samples_per_round,
            init_state=init_state, dt_scale=dt_scale)
        opacity[sl] = np.asarray(res["opacity"])[:n]
        depth[sl] = np.asarray(res["depth"])[:n]
        rgb[sl] = np.asarray(res["rgb"])[:n]
    return {"opacity": jnp.asarray(opacity), "depth": jnp.asarray(depth),
            "rgb": jnp.asarray(rgb)}


def bake_ngp(params, grid_state, cfg, resolution: int = 256,
             n_dirs: int = 32, dtype=jnp.bfloat16) -> BakedField:
    """Bake a trained NGP (models/ngp.py) into a BakedField.

    Occupancy comes from the trainer's grid (cascade 0); baked voxels are
    the occupied cells' neighborhoods dilated by 1 so trilinear reads at
    occupancy boundaries see real values.
    """
    from .models.ngp import ngp_forward
    B = resolution
    G = cfg.grid_size
    # occ_flat layout is row-major (x, y, z) (models/ngp.py _cell_coords)
    occ_xyz = np.asarray(grid_state.occ_flat[:G ** 3]).reshape(G, G, G) > 0
    # dilate by one occupancy cell so boundary trilerp reads real values
    p = np.pad(occ_xyz, 1)
    d = np.zeros_like(occ_xyz)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                d |= p[dx:dx + G, dy:dy + G, dz:dz + G]
    # voxel (x,y,z) at resolution B maps to occupancy cell (x*G//B, ...)
    rep = B // G if B >= G else 1
    if B >= G:
        mask = np.repeat(np.repeat(np.repeat(d, rep, 0), rep, 1), rep, 2)
    else:
        s = G // B
        mask = d.reshape(B, s, B, s, B, s).any(axis=(1, 3, 5))
    mask_flat = mask.reshape(-1)

    def field_fn(x, dirs):
        sigma, rgb = ngp_forward(params, x, dirs, cfg)
        return sigma, rgb

    return bake_field(field_fn, cfg.scale, resolution=B,
                      occ_mask=mask_flat, n_dirs=n_dirs, dtype=dtype)
