"""Occupancy-grid-guided ray marching, TPU-native.

Replaces the reference's serial per-ray DDA CUDA kernels with atomic
compaction (`raymarching_train_kernel`, reference: models/csrc/raymarching.cu:166-332
and `raymarching_test_kernel`, :335-454). The TPU formulation:

  1. evaluate the closed-form step lattice t(k) for all k in parallel
     (ops/stepping.py) — this subsumes the reference's empty-space skipping,
     which merely fast-forwards along the same lattice;
  2. one vectorized gather into the occupancy grid tests every candidate;
  3. an order-preserving compaction (cumsum + batched binary search — all
     gathers, no scatters/sorts/atomics) packs the occupied samples into a
     statically-shaped compact buffer, exactly the reference's
     (ray_start, count) segment layout but deterministic.

Budgeting: each ray demands min(#occupied, s_cap) samples. If the total
demand exceeds the static buffer m_cap, every ray's allocation is scaled
proportionally and its samples are STRIDED along the ray (deltas scaled by
the stride) instead of truncated — so early training with a dense occupancy
grid still supervises the whole ray, unlike naive truncation. Once the grid
is carved (normal operation), stride == 1 and the sample set matches the
reference's marcher exactly.

The occupancy grid here is a flat uint8 0/1 array of shape (cascades*G^3,)
laid out [mip, x, y, z] row-major (byte gather beats bit-extract on TPU; the
packed bitfield of the reference is only kept for checkpoint parity).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .stepping import SQRT3, calc_dt, lattice_t, mip_from_pos, mip_from_dt


def pl_cdiv(a: int, b: int) -> int:
    return -(-a // b)


def small_table_lookup(table_u8, idx):
    """Boolean lookup `table_u8[idx] > 0` for a TINY table without an HBM
    row gather.

    The coarse occupancy grid is 4096 cells (CG=16 supercells, single
    cascade) but the marcher queries it ~1M times per step — at the
    chip's ~12 ns/row gather-issue rate that is ~12 ms/step for 512 bytes
    of actual data. Here the table is bit-packed into W = ceil(T/32)
    int32 words, broadcast across rows, and each query extracts its bit
    with jnp.take_along_axis along the LANE axis (lowered as a
    column-batched dynamic gather on TPU) + a shift — VPU work priced per
    lane, not an HBM row per query.

    Exact: returns the same boolean as `table_u8[idx] > 0` for idx in
    range. Falls back to the plain gather when the packed table would
    exceed 512 lanes (16k entries)."""
    T = table_u8.shape[0]
    W = pl_cdiv(T, 32)
    if W > 512:
        return table_u8[idx] > 0
    bits = (table_u8 > 0).astype(jnp.uint32)
    bits = jnp.pad(bits, (0, W * 32 - T)).reshape(W, 32)
    words = (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
        axis=1).astype(jnp.int32)                              # (W,)
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    R = flat.shape[0]
    w = (flat >> 5)[:, None]                                   # (R, 1)
    row = jnp.broadcast_to(words[None, :], (R, W))
    word = jnp.take_along_axis(row, w, axis=1)[:, 0]
    bit = (word >> (flat & 31)) & 1
    return (bit > 0).reshape(shape)


def _coarse_test(occ_coarse, cflat):
    """Coarse-supercell occupancy test, `occ_coarse[cflat] > 0`.

    The lane-packed `small_table_lookup` variant (ARNERF_VPU_COARSE=1)
    prices the ~1M queries/step as VPU lanes instead of HBM gather rows —
    but MEASURED SLOWER on chip (default OFF): +7 ms/step at the bench
    shape (172.0 vs 165.1 ms, bench_runs/r5_hoist_ab*.log) — XLA lowers
    the broadcast + take_along_axis to a materialized (R, W) operand and
    a real gather rather than a lane permute. Kept as an A/B knob."""
    import os
    if (jax.default_backend() != "cpu"
            and os.environ.get("ARNERF_VPU_COARSE", "0") == "1"):
        return small_table_lookup(occ_coarse, cflat)
    return occ_coarse[cflat] > 0


class MarchResults(NamedTuple):
    xyzs: jnp.ndarray       # (M, 3) sample positions (0 where invalid)
    dirs: jnp.ndarray       # (M, 3) ray directions per sample
    deltas: jnp.ndarray     # (M,) integration step (stride-scaled)
    ts: jnp.ndarray         # (M,) sample distances
    ray_idx: jnp.ndarray    # (M,) which ray each sample belongs to
    valid: jnp.ndarray      # (M,) bool sample validity
    ray_start: jnp.ndarray  # (N,) segment start of each ray in the buffer
    counts: jnp.ndarray     # (N,) samples allocated per ray
    rm_samples: jnp.ndarray # () total demanded samples (reference's rm_samples)
    # () max occupied-dilated segments any ray intersected, PRE-clamp (0 on
    # the single-level path). The trainer's adaptive seg_cap shrinks the
    # static segment buffer toward this measured demand — seg_cap=64 is a
    # worst-case bound; a carved scene needs ~2-6 — and the pre-clamp value
    # is the guard that truncation never actually happens.
    max_nseg: jnp.ndarray = None
    # () TOTAL occupied-dilated segments over all rays (pooled path only;
    # 0 elsewhere). The pooled marcher's capacity adapts on the MEAN
    # total_nseg/N, not the max — one grazing ray no longer sizes the
    # whole segment buffer.
    total_nseg: jnp.ndarray = None


def _lower_bound_rows(c_flat, rows, queries, K: int):
    """For each (row, q): smallest j in [0, K) with c[row, j] >= q.

    c_flat: (N*K,) row-major values, nondecreasing within each row.
    rows: (M,) int32; queries: (M,) int or float (compared against c values).
    Returns (M,) int32 (== K if no such j).
    Branchless binary search: log2(K) rounds of one gather each.
    """
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, K, jnp.int32)
    n_iter = max(1, K.bit_length())  # search space is [0, K] inclusive
    base = rows * K
    for _ in range(n_iter):
        mid = (lo + hi) // 2
        val = c_flat[base + jnp.minimum(mid, K - 1)]
        ge = val >= queries
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return lo


def _upper_bound(sorted_vals, queries):
    """Largest index i with sorted_vals[i] <= q, for each q. -1 if none."""
    return jnp.searchsorted(sorted_vals, queries, side="right").astype(jnp.int32) - 1


def _lower_bound_var(c, base, length, queries, k_max: int):
    """Variable-row lower bound: smallest x in [0, length_i) with
    c[base_i + x] >= q_i, per query i (== length_i if none; garbage where
    length_i == 0 — callers mask those slots).

    Same branchless binary search as `_lower_bound_rows` but rows live at
    per-query offsets `base` with per-query lengths `length` inside one
    flat nondecreasing-within-row array `c`. `k_max` bounds every length
    (static, sets the iteration count)."""
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = length
    for _ in range(max(1, int(k_max).bit_length())):
        mid = (lo + hi) // 2
        val = c[base + jnp.minimum(mid, jnp.maximum(length - 1, 0))]
        ge = val >= queries
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return lo


def occupancy_lookup(occ_flat, pos, dt, *, scale: float, cascades: int,
                     grid_size: int):
    """Vectorized bitfield test: positions (..., 3), dt (...,) -> bool (...,).

    Mirrors the per-step lookup of the reference marcher
    (raymarching.cu:205-220) with a row-major [mip, x, y, z] uint8 grid.
    """
    G = grid_size
    mip = jnp.maximum(mip_from_pos(pos, cascades), mip_from_dt(dt, G, cascades))
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), scale)
    n = jnp.clip(0.5 * (pos / mip_bound[..., None] + 1.0) * G, 0.0, G - 1.0)
    n = n.astype(jnp.int32)
    flat = ((mip * G + n[..., 0]) * G + n[..., 1]) * G + n[..., 2]
    return occ_flat[flat] > 0


COARSE_FACTOR = 8   # coarse supercell = 8^3 fine occupancy cells


def coarse_dilation_radius(*, scale: float, exp_step_factor: float,
                           grid_size: int, max_samples: int,
                           dt_scale: float = None) -> int:
    """Exact dilation radius (in supercells) so that a lattice segment
    classified by its START position can never miss occupancy its F-1
    forward fine steps would hit.

    A fine candidate lies at most (F-1)*dt_worst along the ray from the
    tested sample; a point that far can sit at most floor(d/s)+1 supercell
    indices away (s = supercell world size). dt is clamped to
    [dt_min, dt_max] with hi precedence (reference raymarching.cu:11-13),
    so dt_worst = dt_max when exponential stepping is on, else
    min(dt_min, dt_max)."""
    import math
    step_scale = scale if dt_scale is None else dt_scale
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2 * step_scale / grid_size
    worst = dt_max if exp_step_factor > 0 else min(dt_min, dt_max)
    d = (COARSE_FACTOR - 1) * worst
    s = 2.0 * min(0.5, scale) / (grid_size // COARSE_FACTOR)
    return int(math.floor(d / s)) + 1


def build_coarse_occupancy(occ_flat, cascades: int, grid_size: int,
                           dilate: int = 2):
    """Dilated max-pool of the occupancy grid: (C*G^3,) -> (C*(G/8)^3,).

    Supercell j is 1 iff ANY fine cell within `dilate` supercells of j is
    occupied ((2*dilate+1)^3 max filter after pooling), so a lattice
    segment classified by its start position can never miss occupancy its
    fine steps would hit — provided dilate >= coarse_dilation_radius(...)
    for the marching parameters in use. Smaller radii keep the coarse grid
    sparser (better pruning); the renderers compute the exact radius."""
    G = grid_size
    CG = G // COARSE_FACTOR
    w = 2 * dilate + 1
    occ = occ_flat.reshape(cascades, CG, COARSE_FACTOR, CG, COARSE_FACTOR,
                           CG, COARSE_FACTOR)
    coarse = occ.max(axis=(2, 4, 6)).astype(jnp.float32)       # (C, CG^3)
    coarse = jax.lax.reduce_window(
        coarse, -jnp.inf, jax.lax.max, (1, w, w, w), (1, 1, 1, 1), "SAME")
    return (coarse > 0).astype(jnp.uint8).reshape(-1)


@partial(jax.jit, static_argnames=(
    "scale", "cascades", "exp_step_factor", "grid_size", "max_samples",
    "n_candidates", "m_cap", "s_cap", "seg_cap", "selection"))
def march_rays_train(rays_o, rays_d, hits_t, occ_flat, noise, *,
                     scale: float, cascades: int, exp_step_factor: float,
                     grid_size: int, max_samples: int, n_candidates: int,
                     m_cap: int, s_cap: int, occ_coarse=None,
                     seg_cap: int = 64,
                     selection: str = "search") -> MarchResults:
    """March N rays into a compact (M=m_cap) sample buffer.

    rays_o, rays_d: (N, 3); hits_t: (N, 2) from ray_aabb_intersect_single
    occ_flat: (cascades*G^3,) uint8 0/1 occupancy; noise: (N,) U[0,1)

    When `occ_coarse` (from build_coarse_occupancy) is given and the scene
    is single-cascade, a coarse pre-pass tests one candidate per 8-step
    segment against the dilated supercell grid and only the occupied
    segments' fine candidates are generated — cutting candidate traffic
    several-fold once the grid is carved. Results are EXACTLY equal to the
    single-level path as long as a ray intersects at most `seg_cap`
    occupied segments (the dilation makes the coarse test a strict
    superset).

    selection="sort" replaces the sample-compaction binary searches with
    a ROW-LOCAL sort of the (N, Kf) eligibility layout (same exact-
    equality argument as march_rays_train_pooled's sort mode; the
    allocation + striding policy is untouched). This is the warmup /
    multi-cascade analogue of the pooled sort marcher — the trainer's
    warmup blocks at seg_cap=0 run this path.
    """
    N = rays_o.shape[0]
    K = n_candidates
    cd = partial(calc_dt, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size, scale=scale)
    lt = partial(lattice_t, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size, scale=scale)

    # t values are constants w.r.t. the rays, matching the reference's
    # RayMarcher backward (custom_functions.py:102-112): gradients reach
    # rays_o/rays_d only through xyzs = o + t*d, not through the bounds
    hits_t = jax.lax.stop_gradient(hits_t)
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    ray_ok = t1 >= 0
    # perturb the first sample of each ray (reference: custom_functions.py:83,
    # raymarching.cu:195-198)
    t1 = jnp.where(ray_ok, t1 + cd(t1) * noise, t1)

    two_level = occ_coarse is not None and cascades == 1

    if two_level:
        F = COARSE_FACTOR
        CG = grid_size // F
        K1 = pl_cdiv(K, F)
        jj = (jnp.arange(K1, dtype=jnp.int32) * F)[None, :]
        t_seg = lt(t1[:, None], jj)                            # (N, K1)
        pos_s = rays_o[:, None, :] + t_seg[..., None] * rays_d[:, None, :]
        # single cascade: mip == 0, bound == min(0.5, scale)
        mb = min(0.5, scale)
        nc = jnp.clip(0.5 * (pos_s / mb + 1.0) * CG, 0.0, CG - 1.0)
        nc = nc.astype(jnp.int32)
        cflat = (nc[..., 0] * CG + nc[..., 1]) * CG + nc[..., 2]
        seg_occ = _coarse_test(occ_coarse, cflat)
        seg_elig = seg_occ & (t_seg < t2[:, None]) & ray_ok[:, None]
        c1 = jnp.cumsum(seg_elig.astype(jnp.int32), axis=1)
        max_nseg = jnp.max(c1[:, -1])          # pre-clamp: truncation guard
        nseg = jnp.minimum(c1[:, -1], seg_cap)
        srows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                 (N, seg_cap))
        squer = jnp.broadcast_to(
            jnp.arange(1, seg_cap + 1, dtype=jnp.int32)[None, :],
            (N, seg_cap))
        sel_j = _lower_bound_rows(c1.reshape(-1), srows.reshape(-1),
                                  squer.reshape(-1), K1).reshape(N, seg_cap)
        slot_ok = jnp.arange(seg_cap, dtype=jnp.int32)[None, :] \
            < nseg[:, None]
        # ks: global lattice step of every fine candidate (N, seg_cap*F)
        ks = (jnp.minimum(sel_j, K1 - 1) * F)[:, :, None] \
            + jnp.arange(F, dtype=jnp.int32)[None, None, :]
        ks = ks.reshape(N, seg_cap * F)
        slot_mask = jnp.repeat(slot_ok, F, axis=1)
        Kf = seg_cap * F
    else:
        ks = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                              (N, K))
        slot_mask = jnp.ones((N, K), bool)
        Kf = K
        max_nseg = jnp.int32(0)

    # ---- candidate lattice + occupancy test -------------------------------
    t_cand = lt(t1[:, None], ks)                               # (N, Kf)
    dt_cand = cd(t_cand)
    pos = rays_o[:, None, :] + t_cand[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(occ_flat, pos, dt_cand, scale=scale,
                           cascades=cascades, grid_size=grid_size)
    elig = occ & (t_cand < t2[:, None]) & ray_ok[:, None] & slot_mask

    # ---- order-preserving compaction --------------------------------------
    demand = jnp.minimum(jnp.sum(elig.astype(jnp.int32), axis=1), s_cap)
    total_demand = jnp.sum(demand)
    ratio = jnp.minimum(1.0, m_cap / jnp.maximum(total_demand, 1).astype(jnp.float32))
    alloc = jnp.floor(demand.astype(jnp.float32) * ratio).astype(jnp.int32)
    stride = demand.astype(jnp.float32) / jnp.maximum(alloc, 1).astype(jnp.float32)
    ray_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(alloc)[:-1].astype(jnp.int32)])
    m = jnp.arange(m_cap, dtype=jnp.int32)

    if selection == "sort":
        # row-local sort compaction: per-row keys (elig ? col : Kf+col)
        # are unique, so one unstable (N, Kf) sort packs each row's
        # eligible columns to the front in order — the j-th eligible
        # candidate of ray r is sel_col[r, j], a direct read. Per-ray
        # values ride one packed (N, 11) row gather (see pooled marcher).
        colsK = jnp.broadcast_to(jnp.arange(Kf, dtype=jnp.int32)[None, :],
                                 (N, Kf))
        keyK = jnp.where(elig, colsK, Kf + colsK)
        skeyK = jax.lax.sort(keyK, dimension=1, is_stable=False)
        sel_col = jnp.where(skeyK < Kf, skeyK, Kf - 1)
        r = jnp.minimum(_starts_to_rows(ray_start, m_cap), N - 1)
        tab = jnp.stack([
            ray_start.astype(jnp.float32), alloc.astype(jnp.float32),
            stride, demand.astype(jnp.float32), t1], axis=1)
        tab = jnp.concatenate([tab, rays_o, rays_d], axis=1)   # (N, 11)
        row = tab[r]                                           # (M, 11)
        s = m - row[:, 0].astype(jnp.int32)
        valid = s < row[:, 1].astype(jnp.int32)
        j = jnp.floor(s.astype(jnp.float32) * row[:, 2]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(row[:, 3].astype(jnp.int32) - 1, 0))
        q_sel = sel_col.reshape(-1)[r * Kf + j]
        k_sel = ks.reshape(-1)[r * Kf + q_sel]                 # global step
        t_m = lt(row[:, 4], k_sel)
        dt_m = cd(t_m) * row[:, 2]
        dirs = row[:, 8:11]
        xyzs = row[:, 5:8] + t_m[:, None] * dirs
    else:
        c = jnp.cumsum(elig.astype(jnp.int32), axis=1)         # (N, Kf)
        r = jnp.clip(_upper_bound(ray_start, m), 0, N - 1)     # (M,)
        s = m - ray_start[r]
        valid = s < alloc[r]
        # occupied-ordinal along the ray, strided when over budget
        j = jnp.floor(s.astype(jnp.float32) * stride[r]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(demand[r] - 1, 0))
        q_sel = _lower_bound_rows(c.reshape(-1), r, j + 1, Kf)  # (M,)
        q_sel = jnp.minimum(q_sel, Kf - 1)
        k_sel = ks.reshape(-1)[r * Kf + q_sel]                 # global step

        # ---- reconstruct sample attributes from the closed form ---------
        t_m = lt(t1[r], k_sel)
        dt_m = cd(t_m) * stride[r]
        dirs = rays_d[r]
        xyzs = rays_o[r] + t_m[:, None] * dirs
    fvalid = valid.astype(t_m.dtype)
    return MarchResults(
        xyzs=xyzs * fvalid[:, None], dirs=dirs * fvalid[:, None],
        deltas=dt_m * fvalid, ts=t_m * fvalid, ray_idx=r, valid=valid,
        ray_start=ray_start, counts=alloc, rm_samples=total_demand,
        max_nseg=max_nseg)


def _starts_to_rows(starts, n_slots: int):
    """Inverse of _upper_bound(starts, arange(n_slots)) for a sorted
    `starts` (N,) with starts[0] == 0: slot p -> the ray owning it.

    One tiny scatter (N rows) + one cumsum instead of log2(N) rounds of
    n_slots-row gathers — the chip-measured costs are ~0.01 ms vs ~6 ms
    PER GATHER ROUND at n_slots = 262144 (scripts/tpu_march_anatomy.py),
    which is what makes the sort-selection marcher below pay off.
    Rays with zero allocation stack their marks on one slot; the cumsum
    counts them all, matching searchsorted(side='right') - 1."""
    marks = jnp.zeros((n_slots,), jnp.int32).at[starts[1:]].add(
        1, mode="drop")
    return jnp.cumsum(marks)


@partial(jax.jit, static_argnames=(
    "scale", "cascades", "exp_step_factor", "grid_size", "max_samples",
    "n_candidates", "m_cap", "s_cap", "seg_pool_cap", "selection"))
def march_rays_train_pooled(rays_o, rays_d, hits_t, occ_flat, noise, *,
                            scale: float, cascades: int,
                            exp_step_factor: float, grid_size: int,
                            max_samples: int, n_candidates: int,
                            m_cap: int, s_cap: int, occ_coarse,
                            seg_pool_cap: int,
                            selection: str = "search") -> MarchResults:
    """Two-level train marching with a SHARED cross-ray segment pool.

    `march_rays_train`'s two-level path pads segments per ray to `seg_cap`,
    so every marching cost (fine occupancy gathers, selection searches)
    scales with the WORST ray — a single ray grazing along occupied
    geometry pins seg_cap at its 64 maximum for the whole batch. Here the
    occupied-segment selection is compacted across rays into one static
    pool of `seg_pool_cap` slots (exactly the trick the sample buffer
    already uses), so capacity is sized by the batch MEAN. When total
    demand exceeds the pool, each ray's occupied segments are STRIDED
    (uniformly thinned along the ray, same policy as the sample budget) —
    never truncated, so no geometry interval is systematically
    unsupervised. When demand fits (a carved grid — normal operation), the
    sample set equals `march_rays_train`'s single-level path exactly.

    Requires `occ_coarse` (build_coarse_occupancy) and cascades == 1;
    render_train guards. The reference analogue remains
    raymarching_train_kernel (models/csrc/raymarching.cu:166-332), whose
    atomic global compaction this reproduces deterministically — including
    its property that buffer pressure from one ray never changes which
    cells OTHER rays may sample.

    selection="search" (original): per-slot binary searches map compact
    slots back to candidates. Chip-measured (scripts/tpu_march_anatomy.py,
    250 GB/s window): every 262k-row gather costs ~6 ms and the searches
    run ~21 of them — 141 ms of the 173 ms marcher.

    selection="sort": ONE order-preserving sort per compaction instead.
    Candidates are laid out ray-contiguously, so sorting the key
    (elig ? flat_index : BIG + flat_index) materializes the compacted
    eligible-candidate array in (ray, t) order; the (j+1)-th eligible
    candidate of ray r is then a DIRECT read at
    comp[cg0[fine_base[r]] + j], and slot->ray comes from _starts_to_rows
    (scatter+cumsum). Allocation and striding policy are SHARED with
    "search", so results are bit-identical in every regime (pinned by
    tests/test_marching_composite.py) — only the slot->candidate
    machinery differs. (An earlier round-4 variant truncated overflow
    rays like the reference kernel instead of striding; it cost ~2.7 dB
    on the 1000-step verify run by leaving tail rays unsupervised, so
    striding stays in both modes.)
    """
    N = rays_o.shape[0]
    K = n_candidates
    F = COARSE_FACTOR
    CG = grid_size // F
    K1 = pl_cdiv(K, F)
    Sp = seg_pool_cap
    cd = partial(calc_dt, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size, scale=scale)
    lt = partial(lattice_t, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size, scale=scale)

    hits_t = jax.lax.stop_gradient(hits_t)
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    ray_ok = t1 >= 0
    t1 = jnp.where(ray_ok, t1 + cd(t1) * noise, t1)

    # ---- coarse pass: occupied-dilated supercell segments per ray ----------
    jj = (jnp.arange(K1, dtype=jnp.int32) * F)[None, :]
    t_seg = lt(t1[:, None], jj)                                # (N, K1)
    pos_s = rays_o[:, None, :] + t_seg[..., None] * rays_d[:, None, :]
    mb = min(0.5, scale)
    nc = jnp.clip(0.5 * (pos_s / mb + 1.0) * CG, 0.0, CG - 1.0)
    nc = nc.astype(jnp.int32)
    cflat = (nc[..., 0] * CG + nc[..., 1]) * CG + nc[..., 2]
    seg_elig = _coarse_test(occ_coarse, cflat) & (t_seg < t2[:, None]) \
        & ray_ok[:, None]
    if selection == "sort":
        dseg = jnp.sum(seg_elig.astype(jnp.int32), axis=1)     # (N,)
    else:
        c1 = jnp.cumsum(seg_elig.astype(jnp.int32), axis=1)    # (N, K1)
        dseg = c1[:, -1]                                       # (N,)
    max_nseg = jnp.max(dseg)
    total_nseg = jnp.sum(dseg)

    # ---- segment compaction into the shared pool ---------------------------
    ratio_s = jnp.minimum(
        1.0, Sp / jnp.maximum(total_nseg, 1).astype(jnp.float32))
    alloc_s = jnp.floor(dseg.astype(jnp.float32) * ratio_s).astype(jnp.int32)
    stride_s = dseg.astype(jnp.float32) \
        / jnp.maximum(alloc_s, 1).astype(jnp.float32)
    seg_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(alloc_s)[:-1].astype(jnp.int32)])
    p = jnp.arange(Sp, dtype=jnp.int32)
    if selection == "sort":
        r_p = jnp.minimum(_starts_to_rows(seg_start, Sp), N - 1)
    else:
        r_p = jnp.clip(_upper_bound(seg_start, p), 0, N - 1)   # (Sp,)
    s_p = p - seg_start[r_p]
    valid_p = s_p < alloc_s[r_p]
    j_p = jnp.floor(s_p.astype(jnp.float32) * stride_s[r_p]).astype(jnp.int32)
    j_p = jnp.minimum(j_p, jnp.maximum(dseg[r_p] - 1, 0))
    if selection == "sort":
        # global eligible-segment compaction: keys are unique so the
        # unstable sort is still order-preserving; the first total_nseg
        # sorted keys are exactly the eligible (ray, segment) flats in
        # ray-major order, and ray r's run starts at dseg_cum[r]
        flatK = jnp.arange(N * K1, dtype=jnp.int32)
        keyS = jnp.where(seg_elig.reshape(-1), flatK, N * K1 + flatK)
        skey = jax.lax.sort(keyS, is_stable=False)
        dseg_cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(dseg)[:-1].astype(jnp.int32)])
        sel_flat = skey[jnp.minimum(dseg_cum[r_p] + j_p, N * K1 - 1)]
        k_base = (sel_flat % K1) * F
    else:
        sel = _lower_bound_rows(c1.reshape(-1), r_p, j_p + 1, K1)  # (Sp,)
        k_base = jnp.minimum(sel, K1 - 1) * F                      # global step

    # ---- fine pass over pooled segments only -------------------------------
    ks_f = k_base[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]
    t_cand = lt(t1[r_p][:, None], ks_f)                        # (Sp, F)
    dt_cand = cd(t_cand)
    pos = rays_o[r_p][:, None, :] + t_cand[..., None] * rays_d[r_p][:, None, :]
    occ = occupancy_lookup(occ_flat, pos, dt_cand, scale=scale,
                           cascades=cascades, grid_size=grid_size)
    elig = occ & (t_cand < t2[r_p][:, None]) & valid_p[:, None]

    # ---- sample compaction (global cumsum over the ray-contiguous pool) ----
    # pool slots are ray-contiguous (seg_start is a cumsum), so one GLOBAL
    # inclusive cumsum gives every per-ray prefix count via two gathers
    cg = jnp.cumsum(elig.reshape(-1).astype(jnp.int32))        # (Sp*F,)
    cg0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cg])    # (Sp*F+1,)
    fine_base = seg_start * F                                  # (N,)
    fine_len = alloc_s * F                                     # (N,)
    cnt = cg0[jnp.minimum(fine_base + fine_len, Sp * F)] - cg0[fine_base]
    demand = jnp.minimum(cnt, s_cap)                           # (N,)
    total_demand = jnp.sum(demand)

    # demand-proportional allocation with uniform striding: identical
    # policy in both selection modes (the r3 quality finding stands —
    # every ray keeps supervising its whole interval under pressure;
    # truncation was tried in an earlier sort variant and cost ~2.7 dB
    # on the 1000-step verify run by leaving tail rays unsupervised)
    ratio = jnp.minimum(
        1.0, m_cap / jnp.maximum(total_demand, 1).astype(jnp.float32))
    alloc = jnp.floor(
        demand.astype(jnp.float32) * ratio).astype(jnp.int32)
    stride = demand.astype(jnp.float32) \
        / jnp.maximum(alloc, 1).astype(jnp.float32)
    ray_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(alloc)[:-1].astype(jnp.int32)])
    m = jnp.arange(m_cap, dtype=jnp.int32)

    if selection == "sort":
        # ONE order-preserving sort materializes the compacted eligible-
        # candidate array (keys unique -> unstable sort is order-
        # preserving); the (j+1)-th eligible candidate of ray r is then a
        # DIRECT read at comp[cg0[fine_base[r]] + j] — no binary search.
        # Results are bit-identical to selection="search" in every regime
        # (same allocation, same striding); only the slot->candidate
        # machinery differs.
        flatF = jnp.arange(Sp * F, dtype=jnp.int32)
        keyF = jnp.where(elig.reshape(-1), flatF, Sp * F + flatF)
        _, comp_k = jax.lax.sort((keyF, ks_f.reshape(-1)), num_keys=1,
                                 is_stable=False)
        r = jnp.minimum(_starts_to_rows(ray_start, m_cap), N - 1)
        # ALL per-ray values ride ONE packed (N, 13) row gather — gathers
        # cost per ROW, not per byte (chip-measured ~3-6 ms per 262k-row
        # gather op), so 8 separate per-ray gathers -> 1. int fields stay
        # exact in f32 while < 2^24 (Sp*F caps at ~2^21 pools; guarded).
        if Sp * F >= (1 << 24) or m_cap >= (1 << 24):
            raise ValueError("sort selection: pool/m_cap too large for "
                             "f32-packed per-ray table")
        tab = jnp.stack([
            ray_start.astype(jnp.float32), alloc.astype(jnp.float32),
            stride, demand.astype(jnp.float32),
            cg0[fine_base].astype(jnp.float32), stride_s, t1], axis=1)
        tab = jnp.concatenate([tab, rays_o, rays_d], axis=1)   # (N, 13)
        row = tab[r]                                           # (M, 13)
        s = m - row[:, 0].astype(jnp.int32)
        valid = s < row[:, 1].astype(jnp.int32)
        j = jnp.floor(s.astype(jnp.float32) * row[:, 2]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(row[:, 3].astype(jnp.int32) - 1, 0))
        q = jnp.minimum(row[:, 4].astype(jnp.int32) + j, Sp * F - 1)
        k_sel = comp_k[q]                                      # global step
        t_m = lt(row[:, 6], k_sel)
        dt_m = cd(t_m) * row[:, 2] * row[:, 5]
        dirs = row[:, 10:13]                                   # rays_d
        xyzs = row[:, 7:10] + t_m[:, None] * dirs              # o + t*d
    else:
        r = jnp.clip(_upper_bound(ray_start, m), 0, N - 1)     # (M,)
        s = m - ray_start[r]
        valid = s < alloc[r]
        j = jnp.floor(s.astype(jnp.float32) * stride[r]).astype(jnp.int32)
        j = jnp.minimum(j, jnp.maximum(demand[r] - 1, 0))
        # (j+1)-th eligible fine sample within ray r's pool region. A
        # ray's region can span up to K1*F slots (> K when K isn't a
        # multiple of F), and the iteration bound must cover the longest
        # row or the search can return unconverged indices.
        q = cg0[fine_base[r]] + j + 1
        x = _lower_bound_var(cg, fine_base[r], fine_len[r], q,
                             k_max=K1 * F)
        flat_idx = fine_base[r] \
            + jnp.minimum(x, jnp.maximum(fine_len[r] - 1, 0))
        k_sel = ks_f.reshape(-1)[flat_idx]                     # global step

        # ---- reconstruct sample attributes from the closed form ---------
        t_m = lt(t1[r], k_sel)
        # integration step scales by BOTH thinning factors: segment
        # striding (stride_s, pool pressure) and sample striding (stride,
        # m_cap pressure); both are 1 once the grid is carved
        dt_m = cd(t_m) * stride[r] * stride_s[r]
        dirs = rays_d[r]
        xyzs = rays_o[r] + t_m[:, None] * dirs
    fvalid = valid.astype(t_m.dtype)
    return MarchResults(
        xyzs=xyzs * fvalid[:, None], dirs=dirs * fvalid[:, None],
        deltas=dt_m * fvalid, ts=t_m * fvalid, ray_idx=r, valid=valid,
        ray_start=ray_start, counts=alloc, rm_samples=total_demand,
        max_nseg=max_nseg, total_nseg=total_nseg)


@partial(jax.jit, static_argnames=(
    "scale", "cascades", "exp_step_factor", "grid_size", "max_samples",
    "n_candidates", "n_samples", "seg_cap", "dt_scale"))
def march_rays_test(rays_o, rays_d, t_cur, t2, occ_flat, *,
                    scale: float, cascades: int, exp_step_factor: float,
                    grid_size: int, max_samples: int, n_candidates: int,
                    n_samples: int, occ_coarse=None, seg_cap: int = 32,
                    dt_scale: float = None):
    """One incremental marching round for the test-time renderer.

    From each ray's current position t_cur, find its next `n_samples`
    occupied lattice points within the next `n_candidates` steps (padded
    per-ray layout). Mirrors `raymarching_test_kernel`
    (reference: models/csrc/raymarching.cu:335-404) with the persistent
    hits_t[r][0] cursor becoming the explicit t_cur carry.

    With `occ_coarse` (single-cascade scenes) a dilated-supercell pre-pass
    prunes fine candidates to occupied 8-step segments; if a ray's occupied
    segments exceed seg_cap the cursor only advances to the end of the last
    selected segment, so no geometry is skipped.

    Returns (xyzs (N,S,3), deltas (N,S), ts (N,S), n_eff (N,), t_next (N,)).
    t_next is the lattice position after the last CONSUMED candidate: if a
    ray found n_samples occupied points, marching resumes right after the
    n_samples-th; otherwise after the last candidate scanned.

    `dt_scale` overrides the scale used for STEP SIZING only (dt_max =
    SQRT3*2*dt_scale/grid_size). The reference's test kernel passes
    `cascades` where calc_dt expects `scale` (raymarching.cu:370,399), so
    its test-time steps use dt_max = SQRT3*2*cascades/G — coarser than
    training for scale<1 scenes. Pass dt_scale=float(cascades) to mirror
    that behavior (the renderer does by default); None keeps dt_max
    consistent with training.
    """
    N = rays_o.shape[0]
    K, S = n_candidates, n_samples
    step_scale = scale if dt_scale is None else dt_scale
    cd = partial(calc_dt, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size,
                 scale=step_scale)
    lt = partial(lattice_t, exp_step_factor=exp_step_factor,
                 max_samples=max_samples, grid_size=grid_size,
                 scale=step_scale)

    two_level = occ_coarse is not None and cascades == 1

    if two_level:
        F = COARSE_FACTOR
        CG = grid_size // F
        K1 = pl_cdiv(K, F)
        jj = (jnp.arange(K1, dtype=jnp.int32) * F)[None, :]
        t_seg = lt(t_cur[:, None], jj)
        pos_s = rays_o[:, None, :] + t_seg[..., None] * rays_d[:, None, :]
        mb = min(0.5, scale)
        nc = jnp.clip(0.5 * (pos_s / mb + 1.0) * CG, 0.0, CG - 1.0)
        nc = nc.astype(jnp.int32)
        cflat = (nc[..., 0] * CG + nc[..., 1]) * CG + nc[..., 2]
        seg_elig = _coarse_test(occ_coarse, cflat) & (t_seg < t2[:, None])
        nseg_raw = jnp.sum(seg_elig.astype(jnp.int32), axis=1)
        nseg = jnp.minimum(nseg_raw, seg_cap)
        truncated = nseg_raw > seg_cap
        # row-local sort selection (round 4): sorting the per-row key
        # (elig ? col : K1 + col) packs the eligible columns to the front
        # in order — one vectorized (N, K1) sort instead of log2(K1)
        # rounds of (N, seg_cap) search gathers. Exact-equal to the old
        # binary search (keys unique per row).
        keyS = jnp.where(
            seg_elig,
            jnp.broadcast_to(jnp.arange(K1, dtype=jnp.int32)[None, :],
                             (N, K1)),
            K1 + jnp.broadcast_to(jnp.arange(K1, dtype=jnp.int32)[None, :],
                                  (N, K1)))
        skeyS = jax.lax.sort(keyS, dimension=1, is_stable=False)
        sel_pad = skeyS[:, :seg_cap] if seg_cap <= K1 else jnp.concatenate(
            [skeyS, jnp.full((N, seg_cap - K1), 2 * K1, jnp.int32)], axis=1)
        sel_j = jnp.where(sel_pad < K1, sel_pad, K1 - 1)
        slot_ok = jnp.arange(seg_cap, dtype=jnp.int32)[None, :] \
            < nseg[:, None]
        ks = (sel_j * F)[:, :, None] \
            + jnp.arange(F, dtype=jnp.int32)[None, None, :]
        ks = ks.reshape(N, seg_cap * F)
        slot_mask = jnp.repeat(slot_ok, F, axis=1)
        Kf = seg_cap * F
        # when truncated, everything before the (seg_cap+1)-th occupied
        # segment has been covered: the selected segments were fine-scanned
        # and the rest are coarse-empty (dilated superset => truly empty),
        # so the cursor may skip past them too
        if seg_cap < K1:
            over = jnp.where(skeyS[:, seg_cap] < K1, skeyS[:, seg_cap],
                             K1 - 1)
        else:
            over = jnp.full((N,), K1 - 1, jnp.int32)
        scan_end_k = jnp.where(truncated, over * F - 1, K - 1)
    else:
        ks = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                              (N, K))
        slot_mask = jnp.ones((N, K), bool)
        Kf = K
        scan_end_k = jnp.full((N,), K - 1, jnp.int32)

    t_cand = lt(t_cur[:, None], ks)                            # (N, Kf)
    dt_cand = cd(t_cand)
    pos = rays_o[:, None, :] + t_cand[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup(occ_flat, pos, dt_cand, scale=scale,
                           cascades=cascades, grid_size=grid_size)
    elig = occ & (t_cand < t2[:, None]) & slot_mask

    n_eff = jnp.minimum(jnp.sum(elig.astype(jnp.int32), axis=1), S)

    # row-local sort selection (see the segment pass above): the first S
    # sorted keys are the first S eligible columns, in order
    s = jnp.arange(S, dtype=jnp.int32)[None, :]
    colsF = jnp.broadcast_to(jnp.arange(Kf, dtype=jnp.int32)[None, :],
                             (N, Kf))
    keyF = jnp.where(elig, colsF, Kf + colsF)
    skeyF = jax.lax.sort(keyF, dimension=1, is_stable=False)
    q_pad = skeyF[:, :S] if S <= Kf else jnp.concatenate(
        [skeyF, jnp.full((N, S - Kf), 2 * Kf, jnp.int32)], axis=1)
    q_sel = jnp.where(q_pad < Kf, q_pad, Kf - 1)
    k_sel = jnp.take_along_axis(ks, q_sel, axis=1)             # global steps
    vmask = s < n_eff[:, None]                                 # (N, S)

    ts = lt(t_cur[:, None], k_sel)
    deltas = cd(ts)
    xyzs = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    f = vmask.astype(ts.dtype)
    ts = ts * f
    deltas = deltas * f
    xyzs = xyzs * f[..., None]

    # cursor for the next round: one lattice step past the last consumed k
    last_k = jnp.where(n_eff >= S,
                       jnp.take_along_axis(k_sel, jnp.maximum(n_eff[:, None] - 1, 0),
                                           axis=1)[:, 0],
                       scan_end_k)
    t_last = lt(t_cur, last_k)
    t_next = t_last + cd(t_last)
    # rays that scanned to/past t2 are finished; park the cursor beyond t2
    # (the lattice is monotone, so "any candidate out of range" == the last
    # scanned candidate's t >= t2)
    t_scan_end = lt(t_cur, scan_end_k)
    t_next = jnp.where((n_eff < S) & (t_scan_end >= t2), t2 + 1.0, t_next)
    return xyzs, deltas, ts, n_eff, t_next
