"""Dense segment reductions without scatter ops.

XLA's scatter on this TPU runtime is row-serialized (~90 ns/row measured —
1.37 s for the training step's 33.5M hash-gradient updates, and hints like
`unique_indices`/`indices_are_sorted` do not help: a unique sorted 6.1M-row
scatter still costs 552 ms). Sorting, by contrast, runs near memory speed
(33.5M rows x 3 operands in 156 ms). These helpers therefore build DENSE
per-row reductions from purely sort/cumsum/gather primitives:

  dense_segment_sum(idx, vals, T):
    1. one sorted array interleaves the M updates with T "query" rows using
       the packed key (row << 1) | is_query — every query slot lands right
       after the updates for its row;
    2. a cumulative sum over the sorted values makes each query slot hold
       the running total of all updates with row <= its row;
    3. a stable 1-bit partition sort pulls the T query slots to the front
       (still in row order), and adjacent differences yield per-row sums.

  No scatter anywhere; cost is two ~(M+T)-row sorts + one cumsum.

dense_segment_max works the same way, except the sort's value ordering
already places each row's maximum directly before its query slot, so step 2
is a shift instead of a cumsum.

These are the building blocks for the hash-grid backward
(ops/hashgrid.py) and the occupancy-grid scatter-max (models/ngp.py).
Reference analogue: the CUDA kernels' atomicAdd/atomicMax accumulations
(reference csrc/raymarching.cu) — redesigned for a machine without atomics.

Precision note: the cumsum runs in fp32 over up to ~40M elements; per-row
results are differences of nearby partial sums, so the absolute error is
~(total magnitude) * 6e-8. For NGP hash-gradient magnitudes this measures
~1e-4 absolute vs exact accumulation (tests/test_segments.py), well inside
Adam's eps=1e-15 noise floor for gradients of order 1e-2.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_sort_path():
    # CPU scatter is fast and exact; the sort pipeline only pays off on TPU
    return jax.default_backend() != "cpu"


# --------------------------------------------------------------------------
# MXU one-hot histogram (round 5): dense small levels leave the sort
# --------------------------------------------------------------------------
# In the stochastic-corner training regime the batched sort's row count is
# dominated by QUERY rows (T_max = 2^19 per level) rather than updates
# (M = 262k): the small dense levels (tables 4k-120k rows) pay a full
# 524k-row query pad each. For those levels the dense cotangent is cheaper
# as a literal one-hot matmul on the MXU:
#
#   d_table[t, f] = sum_n 1[idx_n == t] * g[n, f]
#     == (G^T @ A)[f, t],  A[n, t] = 1[idx_n == t]
#
# A is never materialized in HBM: a Pallas kernel builds (Tc, Mc) one-hot
# tiles in VMEM from an iota compare and accumulates G @ A^T into the
# (16, T) output across M-chunks. Update values ride in bf16 (same
# quantization class as the sort path's pack=True lane packing) and
# accumulate in f32 — no cumsum-of-40M-elements error term at all.
# FLOP cost is 2*M*T*16 effective (16 sublane rows for the bf16 tile, F=2
# useful).
#
# MEASURED NEGATIVE RESULT (round 5, scripts/tpu_segsum_mxu.py on chip):
# default OFF. The batched sort's cost is ~flat in the number of levels
# (lanes parallelize the L dim; peeling 2-6 of 16 levels left the sort at
# ~55 ms), while the histogram kernel pays ~2.5 ms/level of grid-step
# overhead (256+ (Tc, Mc) tiles each ~20 us of dispatch+DMA+A-build; the
# dot itself is ~1 us/tile): peel<=16k/64k/128k/256k measured
# 60/73/94/141 ms vs 55.5 ms sort-only. The sort's padding waste is not
# reachable this way; kept (default off) for shapes with far larger M/T
# ratios where the matmul could win.

_HIST_MC = 2048    # M-chunk (contraction tile)
_HIST_TC = 2048    # table-row tile (output lanes)
_HIST_GROWS = 16   # bf16 sublane tile for the value rows (F real + pad)


def _hist_kernel(idx_ref, g_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    tbase = pl.program_id(0) * _HIST_TC
    iota = tbase + jax.lax.broadcasted_iota(
        jnp.int32, (_HIST_TC, _HIST_MC), 0)
    a = (idx_ref[0:1, :] == iota).astype(jnp.bfloat16)      # (Tc, Mc)
    out_ref[:] += jax.lax.dot_general(
        g_ref[:], a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (16, Tc)


def mxu_segment_sum(idx, val_cols, num_rows: int, *, interpret=False):
    """out[t] = sum of vals[i] where idx[i] == t, as one-hot MXU matmuls.

    idx: (M,) int32 in [0, num_rows); val_cols: tuple of F (M,) floats.
    Returns (num_rows, F) f32. Values are quantized to bf16 (see above).
    """
    F = len(val_cols)
    assert F <= _HIST_GROWS
    (M,) = idx.shape
    mpad = (-M) % _HIST_MC
    T_pad = num_rows + ((-num_rows) % _HIST_TC)
    if mpad:
        # -1 padding rows match no table row
        idx = jnp.concatenate([idx.astype(jnp.int32),
                               jnp.full((mpad,), -1, jnp.int32)])
    else:
        idx = idx.astype(jnp.int32)
    rows = [jnp.pad(c.astype(jnp.bfloat16), (0, mpad))[None]
            for c in val_cols]
    if F < _HIST_GROWS:
        rows.append(jnp.zeros((_HIST_GROWS - F, M + mpad), jnp.bfloat16))
    g = jnp.concatenate(rows, axis=0)
    grid = (T_pad // _HIST_TC, (M + mpad) // _HIST_MC)
    out = pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _HIST_MC), lambda t, m: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HIST_GROWS, _HIST_MC), lambda t, m: (0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_HIST_GROWS, _HIST_TC), lambda t, m: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_HIST_GROWS, T_pad), jnp.float32),
        interpret=interpret,
    )(idx[None], g)
    return out[:F, :num_rows].T


def _mxu_hist_max_size():
    # default 0 = off (measured slower at the training shape; see above)
    return int(os.environ.get("ARNERF_MXU_HIST", "0"))


def dense_segment_sum(idx, vals, num_rows: int, method: str = "auto"):
    """out[t] = sum of vals[i] where idx[i] == t; shape (num_rows, F).

    idx: (M,) int32 in [0, num_rows); vals: (M, F) float.
    method: "auto" (backend-dependent), "sort", or "scatter".
    """
    if method == "auto":
        method = "sort" if _use_sort_path() else "scatter"
    if method == "scatter":
        return jnp.zeros((num_rows, vals.shape[1]), vals.dtype).at[idx].add(vals)

    M, F = vals.shape
    T = num_rows
    key = jnp.concatenate([
        idx.astype(jnp.int32) << 1,
        (jnp.arange(T, dtype=jnp.int32) << 1) | 1,
    ])
    cols = [jnp.concatenate([vals[:, j].astype(jnp.float32),
                             jnp.zeros((T,), jnp.float32)]) for j in range(F)]
    s = jax.lax.sort((key, *cols), num_keys=1)
    s_key, s_cols = s[0], s[1:]
    cs = [jnp.cumsum(c) for c in s_cols]
    # stable partition: queries (LSB 1) to the front, in row order
    part = jax.lax.sort(((s_key & 1) ^ 1, *cs), num_keys=1)
    C = jnp.stack([p[:T] for p in part[1:]], axis=1)
    out = jnp.diff(C, axis=0, prepend=jnp.zeros((1, F), C.dtype))
    return out.astype(vals.dtype)


def dense_segment_sum_batched(idx, val_cols, sizes, method: str = "auto",
                              stable: bool = False, pack: bool = True,
                              group: bool = False):
    """Per-level dense segment sums in one batched pipeline.

    idx:      (L, M) int32, level-LOCAL rows (idx[l] in [0, sizes[l]))
    val_cols: tuple of F arrays, each (L, M) — one per feature column.
              (Separate 2-D columns rather than one (L, M, F) tensor: a
              trailing F=2 dim tile-pads 2 -> 128 on TPU if materialized.)
    sizes: static per-level row counts
    Returns (sum(sizes), F): level outputs concatenated in order — the
    hash-table layout of ops/hashgrid.py.

    Rationale: XLA sort cost is superlinear in row count, so L independent
    sorts of (M + T_l) rows (batched along the leading dim of one lax.sort)
    beat one global (L*M + sum(T_l))-row sort. Levels whose row space is
    smaller than max(sizes) are padded with INT32_MAX query keys, which
    sort to the end of each row and are sliced away after the partition.

    stable=False (default): both sorts run is_stable=False — neither needs
    stability (updates to one row commute up to fp32 cumsum reordering,
    ~1e-4 of the reference magnitudes; the partition composes the query
    flag with the row index into one totally-ordered key, so query order
    survives an unstable sort). Measured 87 -> 71 ms at the training shape
    (scripts/tpu_step_anatomy_r4.py).

    pack=True (default, F == 2 only): the two value columns ride the first
    sort bitcast into ONE int32 lane (bf16 each) — 3 sort operands become
    2; the cumsum still runs in f32 after unpacking. Quantizes individual
    updates to bf16 (~0.4% relative), noise-level next to the stochastic-
    corner gradient estimator and far under Adam's update scale; use
    pack=False where exact f32 updates matter (the non-stoch exact path
    keeps its call-site default). Measured 71 -> 58 ms.
    """
    F = len(val_cols)
    L, M = val_cols[0].shape
    if method == "auto":
        method = "sort" if _use_sort_path() else "scatter"
    if method == "scatter":
        outs = [jnp.zeros((sizes[l], F), val_cols[0].dtype).at[idx[l]].add(
                    jnp.stack([c[l] for c in val_cols], axis=1))
                for l in range(L)]
        return jnp.concatenate(outs, axis=0)

    # MXU peel (round 5, DEFAULT OFF — measured slower, see module note;
    # enable via ARNERF_MXU_HIST=<max_rows>): the prefix
    # of levels whose table fits under ARNERF_MXU_HIST (default 64k rows)
    # computes its dense cotangent as one-hot MXU matmuls instead of
    # paying a T_max = 2^19 query pad in the batched sort — in the
    # stochastic regime queries are 2/3 of all sorted rows, and for the
    # small dense levels ~all of that pad is waste. pack=True only: the
    # MXU path quantizes updates to bf16 exactly like the sort's lane
    # packing, so the exact-f32 path (pack=False) keeps the sort.
    if pack and F <= _HIST_GROWS and jax.default_backend() == "tpu":
        mxu = _mxu_hist_max_size()
        kk = 0
        while kk < L and sizes[kk] <= mxu:
            kk += 1
        if 0 < kk:
            peeled = [mxu_segment_sum(
                idx[l], tuple(c[l] for c in val_cols), sizes[l])
                for l in range(kk)]
            if kk == L:
                rest = jnp.zeros((0, F), peeled[0].dtype)
            else:
                rest = dense_segment_sum_batched(
                    idx[kk:], tuple(c[kk:] for c in val_cols), sizes[kk:],
                    method="sort", stable=stable, pack=True, group=group)
            return jnp.concatenate(
                [p.astype(val_cols[0].dtype) for p in peeled] + [rest],
                axis=0)

    # level grouping (default OFF — measured SLOWER on chip): splitting
    # the batch into two contiguous runs removes ~17% of sorted rows
    # (query padding to the batch T_max), but two narrower batched sorts
    # lose to one wide one — 66.6 vs 56.3 ms at the bench shape
    # (scripts/tpu_segsum_group.py; lane parallelism across the L dim +
    # per-sort fixed cost beat the row saving). Kept as an option for
    # future shapes where the padding fraction is larger.
    if group and L > 1 and min(sizes) < max(sizes):
        best_k, best_rows = 0, L * (M + max(sizes))
        for k in range(1, L):
            rows = k * (M + max(sizes[:k])) + (L - k) * (M + max(sizes[k:]))
            if rows < best_rows:
                best_k, best_rows = k, rows
        if best_k and best_rows <= 0.85 * L * (M + max(sizes)):
            a = dense_segment_sum_batched(
                idx[:best_k], tuple(c[:best_k] for c in val_cols),
                sizes[:best_k], method="sort", stable=stable, pack=pack,
                group=False)
            b = dense_segment_sum_batched(
                idx[best_k:], tuple(c[best_k:] for c in val_cols),
                sizes[best_k:], method="sort", stable=stable, pack=pack,
                group=False)
            return jnp.concatenate([a, b], axis=0)

    T_max = max(sizes)
    qk = (jnp.arange(T_max, dtype=jnp.int32) << 1) | 1          # (T_max,)
    sizes_a = jnp.asarray(sizes, jnp.int32)[:, None]
    qkeys = jnp.where(jnp.arange(T_max)[None, :] < sizes_a,
                      qk[None, :], jnp.int32(0x7FFFFFFF))       # (L, T_max)
    keys = jnp.concatenate([idx.astype(jnp.int32) << 1, qkeys], axis=1)
    if pack and F == 2:
        b0 = jax.lax.bitcast_convert_type(
            val_cols[0].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        b1 = jax.lax.bitcast_convert_type(
            val_cols[1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        packed = jnp.concatenate(
            [(b0 | (b1 << 16)).astype(jnp.int32),
             jnp.zeros((L, T_max), jnp.int32)], axis=1)
        s_key, s_packed = jax.lax.sort((keys, packed), num_keys=1,
                                       dimension=1, is_stable=stable)
        up = s_packed.astype(jnp.uint32)
        v0 = jax.lax.bitcast_convert_type(
            (up & 0xFFFF).astype(jnp.uint16), jnp.bfloat16) \
            .astype(jnp.float32)
        v1 = jax.lax.bitcast_convert_type(
            (up >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        cs = [jnp.cumsum(v0, axis=1), jnp.cumsum(v1, axis=1)]
    else:
        cols = [jnp.concatenate(
            [c.astype(jnp.float32), jnp.zeros((L, T_max))], axis=1)
            for c in val_cols]
        s = jax.lax.sort((keys, *cols), num_keys=1, dimension=1,
                         is_stable=stable)
        s_key, s_cols = s[0], s[1:]
        cs = [jnp.cumsum(c, axis=1) for c in s_cols]
    # partition per level: query slots (LSB 1) to the front, in row order.
    # The composed key (flag in bit 30, row in the low bits) is a total
    # order, so stability is not required; INT32_MAX padding maps to
    # flag=query, row=0x3FFFFFFF — after every real query (row < 2^30 by
    # the int32 key layout), so the first T_max slots are exactly
    # [T_l real queries, padding...]
    pkey = ((((s_key & 1) ^ 1) << 30) | (s_key >> 1)).astype(jnp.int32)
    part = jax.lax.sort((pkey, *cs), num_keys=1, dimension=1,
                        is_stable=stable)
    # per-level diff along the row axis, then concatenate level slices;
    # stack features LAST (small (total, F) output is materialized once)
    outs = []
    for j in range(F):
        C = part[1 + j][:, :T_max]                               # (L, T_max)
        outs.append(jnp.diff(C, axis=1,
                             prepend=jnp.zeros((L, 1), C.dtype)))
    flat_cols = [jnp.concatenate([o[l, :sizes[l]] for l in range(L)])
                 for o in outs]
    return jnp.stack(flat_cols, axis=1).astype(val_cols[0].dtype)


def dense_segment_max(idx, vals, num_rows: int, fill=0.0,
                      method: str = "auto"):
    """out[t] = max of vals[i] where idx[i] == t (or `fill` if none).

    idx: (M,) int32 in [0, num_rows); vals: (M,) float.
    """
    if method == "auto":
        method = "sort" if _use_sort_path() else "scatter"
    if method == "scatter":
        return jnp.full((num_rows,), fill, vals.dtype).at[idx].max(vals)

    M = idx.shape[0]
    T = num_rows
    key = jnp.concatenate([
        idx.astype(jnp.int32) << 1,
        (jnp.arange(T, dtype=jnp.int32) << 1) | 1,
    ])
    v = jnp.concatenate([vals, jnp.full((T,), -jnp.inf, vals.dtype)])
    # secondary sort on value: within a row's update group the max sorts
    # last, i.e. immediately before the row's query slot
    s_key, s_val = jax.lax.sort((key, v), num_keys=2)
    prev_val = jnp.concatenate([jnp.full((1,), -jnp.inf, s_val.dtype),
                                s_val[:-1]])
    prev_key = jnp.concatenate([jnp.full((1,), -1, s_key.dtype), s_key[:-1]])
    # valid iff the preceding slot is an update of the same row
    valid = (prev_key == (s_key & ~1)).astype(jnp.float32)
    part = jax.lax.sort(((s_key & 1) ^ 1, prev_val, valid), num_keys=1)
    mx, ok = part[1][:T], part[2][:T]
    return jnp.where(ok > 0, mx, jnp.asarray(fill, vals.dtype))
