"""Render orchestration: AABB clip -> march -> field eval -> composite.

TPU-native rebuild of reference models/rendering.py. `render_train` is fully
jittable (used inside the training step); `render_image` is the test-time
path — an incremental march/composite loop over fixed-shape rounds
(the reference's alive-ray while loop, rendering.py:191-233, with the
dynamic alive-list replaced by masks and a lax.while_loop).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .models.ngp import NGPConfig, ngp_forward, ngp_forward_chunked
from .ops.intersection import ray_aabb_intersect_single
from .ops.marching import march_rays_train, march_rays_test
from .ops.composite import composite_train, composite_test_step
from .ops.stepping import SQRT3, num_lattice_steps

MAX_SAMPLES = 1024   # reference: models/rendering.py:9
NEAR_DISTANCE = 0.01


def scene_hits(rays_o, rays_d, cfg: NGPConfig, mesh_depth_map=None):
    """Scene-AABB intersection with the reference's near clamp
    (rendering.py:29-31) and optional far clamp to an inserted mesh's depth
    map for AR compositing (rendering.py:38-44)."""
    hits = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                     jnp.full(3, cfg.scale))
    t1, t2 = hits[:, 0], hits[:, 1]
    t1 = jnp.where((t1 >= 0) & (t1 < NEAR_DISTANCE), NEAR_DISTANCE, t1)
    if mesh_depth_map is not None:
        valid_depth = mesh_depth_map >= 1e-6
        clamped = jnp.maximum(jnp.minimum(t2, mesh_depth_map), t1)
        t2 = jnp.where(valid_depth, clamped, t2)
    return jnp.stack([t1, t2], axis=-1)


def default_candidates(cfg: NGPConfig, exp_step_factor: float,
                      max_samples: int = MAX_SAMPLES) -> int:
    """Static lattice length covering the scene diagonal from any start."""
    diag = 2 * SQRT3 * cfg.scale
    return num_lattice_steps(NEAR_DISTANCE, NEAR_DISTANCE + diag,
                             exp_step_factor, max_samples, cfg.grid_size,
                             cfg.scale)


@partial(jax.jit, static_argnames=(
    "cfg", "exp_step_factor", "T_threshold", "random_bg", "m_cap", "s_cap",
    "max_samples", "seg_cap", "stoch", "seg_pool", "selection"))
def render_train(params, grid_state, rays_o, rays_d, key, cfg: NGPConfig, *,
                 exp_step_factor: float = 0.0, T_threshold: float = 1e-4,
                 random_bg: bool = False, m_cap: int = 256 * 1024,
                 s_cap: int = MAX_SAMPLES, max_samples: int = MAX_SAMPLES,
                 seg_cap: int = 64, exposure=None, mesh_depth_map=None,
                 stoch: bool = False, seg_pool: int = 0,
                 selection: str = "search", march_results=None):
    """Differentiable training-path render. Returns the reference's results
    dict (rendering.py:255-298): rgb, opacity, depth, ws, deltas, ts +
    segment layout + sample counters.

    stoch=True evaluates the field with stochastic-corner hash gathers
    (8x fewer rows, unbiased trilerp estimator — ops/hashgrid.py). Not
    valid with --optimize_ext (position gradients vanish); the trainer
    gates it.

    seg_pool > 0 routes two-level marching through the shared cross-ray
    segment pool of that many TOTAL slots (march_rays_train_pooled):
    marching cost scales with mean segment demand instead of the worst
    ray's. Ignored (falls back to the per-ray seg_cap path) for
    multi-cascade scenes or when seg_cap == 0 (warmup).

    selection ("search" | "sort") picks the pooled marcher's compaction
    algorithm — see march_rays_train_pooled; identical sample sets when
    the budgets fit, and "sort" replaces ~21 serial gather rounds with
    one sort (the chip-measured march bottleneck).

    march_results: precomputed MarchResults for these rays/keys (the
    trainer's hoisted block march — marching is parameter-independent, so
    the 16-step block marches all its steps in ONE batched pass where the
    selection sorts amortize; see trainer.hoisted_block_march). Must have
    been produced with the SAME key/grid/budgets this call would use; the
    k_noise/k_bg/k_stoch splits below are unchanged so every other random
    draw stays bit-identical to the unhoisted path."""
    k_noise, k_bg, k_stoch = jax.random.split(key, 3)
    seed = jax.random.bits(k_stoch, dtype=jnp.uint32) if stoch else None
    if march_results is not None:
        mr = march_results
        return _render_train_from_march(
            params, mr, k_bg, cfg, seed=seed, random_bg=random_bg,
            exp_step_factor=exp_step_factor, T_threshold=T_threshold,
            exposure=exposure)
    hits = scene_hits(rays_o, rays_d, cfg, mesh_depth_map)
    noise = jax.random.uniform(k_noise, (rays_o.shape[0],))
    occ_coarse = None
    if seg_cap > 0 and cfg.cascades == 1:
        # coarse supercell pre-pass (derived on the fly: cheap, and keeps
        # GridState/checkpoints free of derived fields)
        from .ops.marching import build_coarse_occupancy, \
            coarse_dilation_radius
        occ_coarse = build_coarse_occupancy(
            grid_state.occ_flat, cfg.cascades, cfg.grid_size,
            dilate=coarse_dilation_radius(
                scale=cfg.scale, exp_step_factor=exp_step_factor,
                grid_size=cfg.grid_size, max_samples=max_samples))
    if seg_pool > 0 and occ_coarse is not None:
        from .ops.marching import march_rays_train_pooled
        mr = march_rays_train_pooled(
            rays_o, rays_d, hits, grid_state.occ_flat, noise,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
            max_samples=max_samples,
            n_candidates=default_candidates(cfg, exp_step_factor,
                                            max_samples),
            m_cap=m_cap, s_cap=s_cap, occ_coarse=occ_coarse,
            seg_pool_cap=seg_pool, selection=selection)
    else:
        mr = march_rays_train(
            rays_o, rays_d, hits, grid_state.occ_flat, noise,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
            max_samples=max_samples,
            n_candidates=default_candidates(cfg, exp_step_factor,
                                            max_samples),
            m_cap=m_cap, s_cap=s_cap, occ_coarse=occ_coarse,
            seg_cap=max(seg_cap, 1), selection=selection)

    return _render_train_from_march(
        params, mr, k_bg, cfg, seed=seed, random_bg=random_bg,
        exp_step_factor=exp_step_factor, T_threshold=T_threshold,
        exposure=exposure)


def _render_train_from_march(params, mr, k_bg, cfg: NGPConfig, *, seed,
                             random_bg: bool, exp_step_factor: float,
                             T_threshold: float, exposure=None):
    """Field eval + composite + background blend over a MarchResults —
    the parameter-dependent tail of render_train, shared by the in-step
    marching path and the trainer's hoisted block march."""
    sample_exposure = None
    if exposure is not None:
        sample_exposure = exposure[mr.ray_idx]
    sigmas, rgbs = ngp_forward(params, mr.xyzs, mr.dirs + 1e-12, cfg,
                               exposure=sample_exposure, seed=seed)

    comp = composite_train(sigmas, rgbs, mr.deltas, mr.ts, mr.ray_idx,
                           mr.valid, mr.ray_start, mr.counts, T_threshold)

    # background blend (reference rendering.py:287-296)
    if random_bg:
        rgb_bg = jax.random.uniform(k_bg, (3,))
    elif exp_step_factor == 0.0:
        rgb_bg = jnp.ones(3)
    else:
        rgb_bg = jnp.zeros(3)
    rgb = comp.rgb + rgb_bg[None, :] * (1.0 - comp.opacity[:, None])

    return {
        "rgb": rgb, "opacity": comp.opacity, "depth": comp.depth,
        "ws": comp.ws, "deltas": mr.deltas, "ts": mr.ts,
        "ray_idx": mr.ray_idx, "valid": mr.valid,
        "ray_start": mr.ray_start, "counts": mr.counts,
        "rm_samples": mr.rm_samples, "vr_samples": comp.vr_samples,
        "max_nseg": mr.max_nseg,
        "total_nseg": (mr.total_nseg if mr.total_nseg is not None
                       else jnp.int32(0)),
    }


@partial(jax.jit, static_argnames=(
    "cfg", "exp_step_factor", "T_threshold", "max_samples", "n_candidates",
    "samples_per_round", "output_radiance", "max_rounds", "return_state",
    "dt_scale"))
def render_test_chunk(params, grid_state, rays_o, rays_d, cfg: NGPConfig, *,
                      exp_step_factor: float = 0.0, T_threshold: float = 1e-4,
                      max_samples: int = MAX_SAMPLES, n_candidates: int = 512,
                      samples_per_round: int = 32,
                      output_radiance: bool = False, exposure=None,
                      mesh_depth_map=None, init_state=None,
                      max_rounds: int = 0, return_state: bool = False,
                      dt_scale: float = None):
    """Non-differentiable incremental render of one chunk of rays.

    lax.while_loop over fixed-shape rounds; each round marches every
    still-alive ray `samples_per_round` occupied samples forward and
    composites in place — the reference's test loop with masks instead of a
    shrinking alive list.

    For the compacted fast path (render_test_fast): `max_rounds` bounds the
    loop, `return_state=True` additionally returns the carried
    (t_cur, opacity, depth, rgb, alive, samples_done) so a caller can gather
    the surviving rays and resume on a smaller buffer via `init_state`.
    """
    N = rays_o.shape[0]
    hits = scene_hits(rays_o, rays_d, cfg, mesh_depth_map)
    t2 = hits[:, 1]

    occ_coarse = None
    if cfg.cascades == 1:
        from .ops.marching import build_coarse_occupancy, \
            coarse_dilation_radius
        occ_coarse = build_coarse_occupancy(
            grid_state.occ_flat, cfg.cascades, cfg.grid_size,
            dilate=coarse_dilation_radius(
                scale=cfg.scale, exp_step_factor=exp_step_factor,
                grid_size=cfg.grid_size, max_samples=max_samples,
                dt_scale=dt_scale))

    # NOTE: the reference grows per-round samples as rays die
    # (min_samples=1 or 4, rendering.py:191-196); fixed shapes make that a
    # recompile per size, so this renderer keeps samples_per_round constant
    # and render_test_fast compacts the alive set instead.

    def cond(carry):
        t_cur, opacity, depth, rgb, alive, samples_done, rounds, total = carry
        go = jnp.any(alive) & (samples_done < max_samples)
        if max_rounds:
            go = go & (rounds < max_rounds)
        return go

    def body(carry):
        t_cur, opacity, depth, rgb, alive, samples_done, rounds, total = carry
        xyzs, deltas, ts, n_eff, t_next = march_rays_test(
            rays_o, rays_d, t_cur, t2, grid_state.occ_flat,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
            max_samples=max_samples, n_candidates=n_candidates,
            n_samples=samples_per_round, occ_coarse=occ_coarse,
            dt_scale=dt_scale)
        n_eff = jnp.where(alive, n_eff, 0)
        S = samples_per_round
        flat_x = xyzs.reshape(N * S, 3)
        flat_d = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3)).reshape(-1, 3)
        sample_exposure = None
        if exposure is not None:
            sample_exposure = jnp.broadcast_to(
                exposure[:, None, :], (N, S, 1)).reshape(-1, 1)
        sig, col = ngp_forward_chunked(params, flat_x, flat_d + 1e-12, cfg,
                                       exposure=sample_exposure,
                                       output_radiance=output_radiance)
        sig = sig.reshape(N, S)
        col = col.reshape(N, S, 3)
        opacity, depth, rgb, still = composite_test_step(
            sig, col, deltas, ts, n_eff, opacity, depth, rgb, T_threshold)
        t_cur = jnp.where(alive, t_next, t_cur)
        alive = alive & still & (t_cur < t2)
        total = total + jnp.sum(n_eff)
        return (t_cur, opacity, depth, rgb, alive,
                samples_done + S, rounds + 1, total)

    if init_state is None:
        t_cur = hits[:, 0]
        alive = t_cur >= 0
        state = (jnp.where(alive, t_cur, t2 + 1.0), jnp.zeros(N),
                 jnp.zeros(N), jnp.zeros((N, 3)), alive, jnp.int32(0))
    else:
        state = init_state
    init = (*state[:5], state[5], jnp.int32(0), jnp.int32(0))
    t_cur, opacity, depth, rgb, alive, samples_done, rounds, total = \
        jax.lax.while_loop(cond, body, init)
    out = {"opacity": opacity, "depth": depth, "rgb": rgb,
           "total_samples": total}
    if return_state:
        out["state"] = (t_cur, opacity, depth, rgb, alive, samples_done)
    return out


@partial(jax.jit, static_argnames=(
    "cfg", "exp_step_factor", "T_threshold", "max_samples", "n_candidates",
    "samples_per_round", "output_radiance", "dt_scale"))
def _render_round(params, grid_state, occ_coarse, rays_o, rays_d, t2, state,
                  cfg: NGPConfig, *, exp_step_factor: float,
                  T_threshold: float, max_samples: int, n_candidates: int,
                  samples_per_round: int, output_radiance: bool,
                  exposure=None, dt_scale: float = None):
    """One render round as a standalone program (host-loop fallback for
    runtimes whose compiler rejects the fused while_loop)."""
    N = rays_o.shape[0]
    t_cur, opacity, depth, rgb, alive, samples_done = state
    xyzs, deltas, ts, n_eff, t_next = march_rays_test(
        rays_o, rays_d, t_cur, t2, grid_state.occ_flat,
        scale=cfg.scale, cascades=cfg.cascades,
        exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
        max_samples=max_samples, n_candidates=n_candidates,
        n_samples=samples_per_round, occ_coarse=occ_coarse,
        dt_scale=dt_scale)
    n_eff = jnp.where(alive, n_eff, 0)
    S = samples_per_round
    flat_x = xyzs.reshape(N * S, 3)
    flat_d = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3)).reshape(-1, 3)
    sample_exposure = None
    if exposure is not None:
        sample_exposure = jnp.broadcast_to(
            exposure[:, None, :], (N, S, 1)).reshape(-1, 1)
    sig, col = ngp_forward_chunked(params, flat_x, flat_d + 1e-12, cfg,
                                   exposure=sample_exposure,
                                   output_radiance=output_radiance)
    opacity, depth, rgb, still = composite_test_step(
        sig.reshape(N, S), col.reshape(N, S, 3), deltas, ts, n_eff,
        opacity, depth, rgb, T_threshold)
    t_cur = jnp.where(alive, t_next, t_cur)
    alive = alive & still & (t_cur < t2)
    return (t_cur, opacity, depth, rgb, alive, samples_done + S), \
        jnp.sum(n_eff)


def render_test_chunk_host(params, grid_state, rays_o, rays_d,
                           cfg: NGPConfig, *, exp_step_factor: float = 0.0,
                           T_threshold: float = 1e-4,
                           max_samples: int = MAX_SAMPLES,
                           n_candidates: int = 512,
                           samples_per_round: int = 32,
                           output_radiance: bool = False, exposure=None,
                           mesh_depth_map=None, init_state=None,
                           max_rounds: int = 0, return_state: bool = False,
                           sync_every: int = 2, dt_scale: float = None):
    """render_test_chunk semantics with the round loop on the host: one
    jitted program per round, alive-check synced every `sync_every` rounds."""
    import numpy as np
    N = rays_o.shape[0]
    hits = scene_hits(rays_o, rays_d, cfg, mesh_depth_map)
    t2 = hits[:, 1]
    occ_coarse = None
    if cfg.cascades == 1:
        from .ops.marching import build_coarse_occupancy, \
            coarse_dilation_radius
        occ_coarse = build_coarse_occupancy(
            grid_state.occ_flat, cfg.cascades, cfg.grid_size,
            dilate=coarse_dilation_radius(
                scale=cfg.scale, exp_step_factor=exp_step_factor,
                grid_size=cfg.grid_size, max_samples=max_samples,
                dt_scale=dt_scale))
    if init_state is None:
        t_cur = hits[:, 0]
        alive = t_cur >= 0
        state = (jnp.where(alive, t_cur, t2 + 1.0), jnp.zeros(N),
                 jnp.zeros(N), jnp.zeros((N, 3)), alive, jnp.int32(0))
    else:
        state = init_state
    total = jnp.int32(0)
    rounds = 0
    while int(state[5]) < max_samples:
        if max_rounds and rounds >= max_rounds:
            break
        state, n = _render_round(
            params, grid_state, occ_coarse, rays_o, rays_d, t2, state, cfg,
            exp_step_factor=exp_step_factor, T_threshold=T_threshold,
            max_samples=max_samples, n_candidates=n_candidates,
            samples_per_round=samples_per_round,
            output_radiance=output_radiance, exposure=exposure,
            dt_scale=dt_scale)
        total = total + n
        rounds += 1
        if rounds % sync_every == 0 and not bool(np.any(np.asarray(state[4]))):
            break
    out = {"opacity": state[1], "depth": state[2], "rgb": state[3],
           "total_samples": total}
    if return_state:
        out["state"] = state
    return out


@partial(jax.jit, static_argnames=(
    "cfg", "exp_step_factor", "max_samples", "n_candidates", "dt_scale"))
def first_hit(grid_state_occ, occ_coarse, rays_o, rays_d, hits, cfg:
              NGPConfig, *, exp_step_factor: float = 0.0,
              max_samples: int = MAX_SAMPLES, n_candidates: int = 512,
              dt_scale: float = None):
    """March-only alive detection: for each ray, whether its marching window
    contains ANY occupied lattice sample, and the t of the first one.

    This is the cheap pre-pass of the compacted test renderer: it costs only
    occupancy gathers (no field evaluation), and on object-centric frames it
    kills the background majority of rays before a single hash-grid gather
    happens. The reference gets the same effect implicitly from its
    shrinking alive list (reference rendering.py:191-233); with fixed
    shapes, killing rays BEFORE the first field-eval round is worth a whole
    round of wasted evals.

    Returns (alive (N,) bool, t_first (N,) — first occupied sample t,
    parked > t2 for misses).

    A single march_rays_test call is NOT sufficient evidence of "no
    geometry": the two-level path truncates at seg_cap occupied-DILATED
    coarse segments per call, advancing the cursor to the end of the last
    selected segment (ops/marching.py:339-347). A ray whose first truly
    occupied fine sample lies beyond the seg_cap-th dilated segment (e.g.
    grazing a surface) would be killed by a one-shot check — silently wrong
    background pixels. So: loop on the t_next cursor until every ray either
    found a sample or parked past t2. Untruncated rays resolve in one
    iteration, so the loop body almost always runs once."""
    t1, t2 = hits[:, 0], hits[:, 1]
    ok = t1 >= 0
    t_cur = jnp.where(ok, t1, t2 + 1.0)

    def cond(carry):
        _, _, _, unresolved = carry
        return jnp.any(unresolved)

    def body(carry):
        t_c, alive, t_first, unresolved = carry
        xyzs, deltas, ts, n_eff, t_next = march_rays_test(
            rays_o, rays_d, t_c, t2, grid_state_occ,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
            max_samples=max_samples, n_candidates=n_candidates,
            n_samples=1, occ_coarse=occ_coarse, dt_scale=dt_scale)
        found = unresolved & (n_eff > 0)
        alive = alive | found
        t_first = jnp.where(found, ts[:, 0], t_first)
        t_c = jnp.where(unresolved, t_next, t_c)
        unresolved = unresolved & (~found) & (t_c < t2)
        return t_c, alive, t_first, unresolved

    init = (t_cur, jnp.zeros_like(ok), t2 + 1.0, ok)
    _, alive, t_first, _ = jax.lax.while_loop(cond, body, init)
    return alive, t_first


_WHILE_LOOP_OK = None


def render_test_dispatch(*args, **kwargs):
    """render_test_chunk with automatic fallback to the host-loop variant
    when the fused while_loop fails to compile on this runtime."""
    global _WHILE_LOOP_OK
    if _WHILE_LOOP_OK is False:
        return render_test_chunk_host(*args, **kwargs)
    try:
        out = render_test_chunk(*args, **kwargs)
        _WHILE_LOOP_OK = True
        return out
    except Exception:
        if _WHILE_LOOP_OK is True:
            raise  # it compiled before: a real runtime error, don't mask
        _WHILE_LOOP_OK = False
        return render_test_chunk_host(*args, **kwargs)


def _pow2_bucket(n: int, min_bucket: int) -> int:
    import numpy as np
    return max(min_bucket, 1 << int(np.ceil(np.log2(max(n, 1)))))


def render_test_fast(params, grid_state, rays_o, rays_d, cfg: NGPConfig, *,
                     phase1_rounds: int = 2, chunk: int = 1 << 16,
                     min_bucket: int = 4096, prehit: bool = True, **kwargs):
    """Alive-ray-compacted render (the reference's shrinking alive-list
    loop, rendering.py:191-233, adapted to fixed shapes). Three phases:

    0. `first_hit` pre-pass (occupancy gathers only, no field eval) kills
       every ray whose marching window holds no occupied cell — on
       object-centric frames that's the background majority, gone before a
       single hash-grid gather.
    1. A few full rounds on the compacted survivors (power-of-two bucket);
       quickly-saturating rays die here.
    2. The remaining survivors are compacted again and finished with bigger
       rounds (the reference grows N_samples as rays die,
       rendering.py:193-196).
    """
    import numpy as np
    N = rays_o.shape[0]
    exp_step_factor = kwargs.get("exp_step_factor", 0.0)
    max_samples = kwargs.get("max_samples", MAX_SAMPLES)
    dt_scale = kwargs.get("dt_scale")

    opacity = np.zeros(N, np.float32)
    depth = np.zeros(N, np.float32)
    rgb = np.zeros((N, 3), np.float32)
    total = 0

    # ---- phase 0: march-only alive detection + first compaction -----------
    if prehit:
        hits = scene_hits(rays_o, rays_d, cfg)
        occ_coarse = None
        if cfg.cascades == 1:
            from .ops.marching import build_coarse_occupancy, \
                coarse_dilation_radius
            occ_coarse = build_coarse_occupancy(
                grid_state.occ_flat, cfg.cascades, cfg.grid_size,
                dilate=coarse_dilation_radius(
                    scale=cfg.scale, exp_step_factor=exp_step_factor,
                    grid_size=cfg.grid_size, max_samples=max_samples,
                    dt_scale=dt_scale))
        # the pre-pass must scan the ENTIRE marching window (a caller's
        # per-round n_candidates may cover only part of the scene diagonal)
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
                    "depth": jnp.asarray(depth), "rgb": jnp.asarray(rgb),
                    "total_samples": 0}
        rays_o_np, rays_d_np = np.asarray(rays_o), np.asarray(rays_d)
        t_first_np = np.asarray(t_first)
        sub_o, sub_d = rays_o_np[idx0], rays_d_np[idx0]
        sub_t = t_first_np[idx0]
    else:
        idx0 = np.arange(N)
        rays_o_np, rays_d_np = np.asarray(rays_o), np.asarray(rays_d)
        sub_o, sub_d = rays_o_np, rays_d_np
        sub_t = None

    # ---- phase 1: a few rounds on the survivors ----------------------------
    M = len(idx0)
    chunk1 = min(chunk, _pow2_bucket(M, min_bucket))
    states = []
    for i in range(0, M, chunk1):
        ro, rd = sub_o[i:i + chunk1], sub_d[i:i + chunk1]
        n = ro.shape[0]
        pad = chunk1 - n
        ro = jnp.asarray(np.concatenate([ro, np.zeros((pad, 3), ro.dtype)]))
        rd = jnp.asarray(np.concatenate([rd, np.ones((pad, 3), rd.dtype)]))
        init_state = None
        if sub_t is not None:
            tc = np.concatenate([sub_t[i:i + chunk1],
                                 np.full(pad, 1e9, np.float32)])
            init_state = (jnp.asarray(tc), jnp.zeros(chunk1),
                          jnp.zeros(chunk1), jnp.zeros((chunk1, 3)),
                          jnp.concatenate([jnp.ones(n, bool),
                                           jnp.zeros(pad, bool)]),
                          jnp.int32(0))
        res = render_test_dispatch(params, grid_state, ro, rd, cfg,
                                   max_rounds=phase1_rounds,
                                   return_state=True, init_state=init_state,
                                   **kwargs)
        st = res["state"]
        states.append([np.asarray(s) for s in st[:5]] + [int(st[5])])
        total += int(res["total_samples"])
    t_cur = np.concatenate([s[0] for s in states])[:M]
    opacity[idx0] = np.concatenate([s[1] for s in states])[:M]
    depth[idx0] = np.concatenate([s[2] for s in states])[:M]
    rgb[idx0] = np.concatenate([s[3] for s in states])[:M]
    alive = np.concatenate([s[4] for s in states])[:M]
    samples_done = max(s[5] for s in states)

    # ---- phase 2: second compaction, bigger rounds to the end --------------
    alive_idx = np.where(alive)[0]          # indices into the phase-1 subset
    if len(alive_idx):
        bucket = _pow2_bucket(len(alive_idx), min_bucket)
        pad = bucket - len(alive_idx)
        full_idx = idx0[alive_idx]          # indices into the original rays
        ro = jnp.concatenate([jnp.asarray(rays_o_np[full_idx]),
                              jnp.zeros((pad, 3))])
        rd = jnp.concatenate([jnp.asarray(rays_d_np[full_idx]),
                              jnp.ones((pad, 3))])

        def gpad(x, fill=0.0):
            g = np.asarray(x)[alive_idx]
            shape = (pad,) + g.shape[1:]
            return jnp.concatenate([jnp.asarray(g),
                                    jnp.full(shape, fill, g.dtype)])

        state = (gpad(t_cur, 1e9), gpad(opacity[idx0]), gpad(depth[idx0]),
                 gpad(rgb[idx0]),
                 jnp.concatenate([jnp.ones(len(alive_idx), bool),
                                  jnp.zeros(pad, bool)]),
                 jnp.int32(samples_done))
        kw2 = dict(kwargs)
        kw2["samples_per_round"] = max(kwargs.get("samples_per_round", 32),
                                       64)
        res2 = render_test_dispatch(params, grid_state, ro, rd, cfg,
                                    init_state=state, **kw2)
        opacity[full_idx] = np.asarray(res2["opacity"])[:len(alive_idx)]
        depth[full_idx] = np.asarray(res2["depth"])[:len(alive_idx)]
        rgb[full_idx] = np.asarray(res2["rgb"])[:len(alive_idx)]
        total += int(res2["total_samples"])

    return {"opacity": jnp.asarray(opacity), "depth": jnp.asarray(depth),
            "rgb": jnp.asarray(rgb), "total_samples": total}


def render_test(params, grid_state, rays_o, rays_d, cfg: NGPConfig, *,
                chunk: int = 1 << 16, sh_bkg=None, im_bkg=None,
                blend_bkg: bool = True, fast: bool = False, **kwargs):
    """Full test-time render, chunked over rays (host loop), with the
    reference's background options (rendering.py:240-250): SH environment,
    image background (AR insertion), or none.

    Step sizing mirrors the reference's test kernel, which passes
    `cascades` where calc_dt expects `scale` (raymarching.cu:370,399) —
    only observable for exp_step_factor>0 scenes. Override with
    dt_scale=None to step exactly as in training."""
    N = rays_o.shape[0]
    chunk = min(chunk, N)
    if "dt_scale" not in kwargs:
        kwargs["dt_scale"] = float(cfg.cascades)
    if fast and kwargs.get("mesh_depth_map") is None \
            and kwargs.get("exposure") is None:
        result = render_test_fast(params, grid_state, rays_o, rays_d, cfg,
                                  chunk=chunk, **kwargs)
        if blend_bkg:
            rgb_bg = jnp.zeros((N, 3))
            if sh_bkg is not None:
                from .insert.sh_math import get_sh_val
                rgb_bg = get_sh_val(sh_bkg, rays_d, clamp_positive=True)
            if im_bkg is not None:
                rgb_bg = im_bkg
            result["rgb"] = result["rgb"] \
                + rgb_bg * (1.0 - result["opacity"][:, None])
        return result
    outs = []
    for i in range(0, N, chunk):
        ro, rd = rays_o[i:i + chunk], rays_d[i:i + chunk]
        n = ro.shape[0]
        if n < chunk:  # pad to keep one compiled shape
            pad = chunk - n
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3))])
            rd = jnp.concatenate([rd, jnp.ones((pad, 3))])
        kw = dict(kwargs)
        if kw.get("exposure") is not None:
            e = kw["exposure"]
            if e.ndim == 0 or e.shape[0] == 1:
                e = jnp.broadcast_to(jnp.reshape(e, (1, 1)), (chunk, 1))
            else:
                e = e[i:i + chunk]
                if e.shape[0] < chunk:
                    e = jnp.concatenate(
                        [e, jnp.ones((chunk - e.shape[0], 1))])
            kw["exposure"] = e
        if kw.get("mesh_depth_map") is not None:
            mdm = kw["mesh_depth_map"][i:i + chunk]
            if n < chunk:
                mdm = jnp.concatenate([mdm, jnp.zeros(chunk - n)])
            kw["mesh_depth_map"] = mdm
        res = render_test_dispatch(params, grid_state, ro, rd, cfg, **kw)
        outs.append({k: v[:n] for k, v in res.items() if k != "total_samples"}
                    | {"total_samples": res["total_samples"]})
    result = {k: jnp.concatenate([o[k] for o in outs])
              for k in ("opacity", "depth", "rgb")}
    result["total_samples"] = sum(int(o["total_samples"]) for o in outs)

    if blend_bkg:
        rgb_bg = jnp.zeros((N, 3))
        if sh_bkg is not None:
            from .insert.sh_math import get_sh_val
            rgb_bg = get_sh_val(sh_bkg, rays_d, clamp_positive=True)
        if im_bkg is not None:
            rgb_bg = im_bkg
        result["rgb"] = result["rgb"] + rgb_bg * (1.0 - result["opacity"][:, None])
    return result


@partial(jax.jit, static_argnames=("cfg",))
def render_surface_normal(params, pts, cfg: NGPConfig):
    """Surface normals as the negative normalized density gradient
    (reference models/rendering.py:300-313). pts: (..., 3) -> (..., 3)."""
    from .models.ngp import ngp_density
    flat = pts.reshape(-1, 3)

    def sigma_sum(x):
        return jnp.sum(ngp_density(params, x, cfg))

    grads = jax.grad(sigma_sum)(flat)
    grads = jnp.nan_to_num(grads, nan=0.0, posinf=1.0, neginf=-1.0)
    normals = -grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-6)
    return normals.reshape(pts.shape)


def render_surface_rgb(params, pts, rays_d, cfg: NGPConfig, **kwargs):
    """Radiance emitted at surface points toward given directions
    (reference models/rendering.py:315-320)."""
    from .models.ngp import ngp_forward
    sigmas, rgbs = ngp_forward(params, pts.reshape(-1, 3),
                               rays_d.reshape(-1, 3), cfg, **kwargs)
    return rgbs.reshape(*pts.shape[:-1], 3)
