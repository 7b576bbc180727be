"""Multiresolution hash-grid encoding, TPU-native.

Replaces tinycudann's "Grid/Hash" encoding that the reference's NGP field
uses (reference: models/networks.py:37-57, config L=16 levels, F=2 features
per level, T=2^19 table entries, N_min=16, growth factor b).

Design (TPU-first):
  * All L levels are evaluated with ONE vectorized gather into a single
    concatenated table: indices (N, L, 8) -> rows (F,) each. XLA lowers this
    to the TPU gather engine; the trilinear blend fuses into VPU ops.
  * Levels whose dense vertex count fits in T are dense-indexed (like tcnn),
    the rest use the standard instant-NGP spatial hash
    (x ^ y*2654435761 ^ z*805459861) mod T with T a power of two.
  * The backward (scatter-add of corner gradients into the table) is left to
    JAX autodiff; a custom Pallas VJP can be slotted in transparently later
    since this op is a pure function of (table, x).

Table layout: one (total_entries, F) fp32 array; per-level offsets are static
Python ints baked into the compiled program.
"""

from dataclasses import dataclass, field
from functools import partial
import math

import numpy as np
import jax
import jax.numpy as jnp

# instant-NGP spatial-hash primes (dim 0 uses the identity, i.e. prime 1)
_PRIME_Y = np.uint32(2654435761)
_PRIME_Z = np.uint32(805459861)

# the 8 trilinear corner offsets, (8, 3)
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.3819  # b = exp(ln(2048*scale/N_min)/(L-1))
    # derived, filled in __post_init__
    scales: tuple = field(default=None)
    resolutions: tuple = field(default=None)
    hashed: tuple = field(default=None)
    offsets: tuple = field(default=None)
    total_entries: int = field(default=None)

    def __post_init__(self):
        T = 1 << self.log2_hashmap_size
        scales, resolutions, hashed, offsets = [], [], [], []
        off = 0
        for l in range(self.n_levels):
            # tcnn convention: scale = b^l * N_min - 1; resolution = ceil(scale)+1
            s = self.base_resolution * (self.per_level_scale ** l) - 1.0
            r = int(math.ceil(s)) + 1
            dense_size = r ** 3
            is_hashed = dense_size > T
            size = T if is_hashed else dense_size
            scales.append(s)
            resolutions.append(r)
            hashed.append(is_hashed)
            offsets.append(off)
            off += size
        object.__setattr__(self, "scales", tuple(scales))
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "hashed", tuple(hashed))
        object.__setattr__(self, "offsets", tuple(offsets))
        object.__setattr__(self, "total_entries", off)

    @property
    def level_sizes(self):
        offs = list(self.offsets) + [self.total_entries]
        return tuple(offs[l + 1] - offs[l] for l in range(self.n_levels))

    @property
    def out_dim(self):
        return self.n_levels * self.n_features


def ngp_growth_factor(scale: float, n_levels: int = 16, n_min: int = 16,
                      max_res_factor: float = 2048.0) -> float:
    """b = exp(ln(2048*scale/N_min)/(L-1)) — reference: models/networks.py:34."""
    return float(np.exp(np.log(max_res_factor * scale / n_min) / (n_levels - 1)))


def hashgrid_init(key, cfg: HashGridConfig, dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching tcnn's hash-table initialization."""
    return jax.random.uniform(
        key, (cfg.total_entries, cfg.n_features), dtype=dtype,
        minval=-1e-4, maxval=1e-4)


def _level_indices(cfg: HashGridConfig):
    """Static per-level constants as numpy arrays (baked into the program)."""
    scales = np.asarray(cfg.scales, dtype=np.float32)                 # (L,)
    res = np.asarray(cfg.resolutions, dtype=np.int32)                 # (L,)
    hashed = np.asarray(cfg.hashed, dtype=bool)                       # (L,)
    offsets = np.asarray(cfg.offsets, dtype=np.uint32)                # (L,)
    return scales, res, hashed, offsets


def _indices_weights(x: jnp.ndarray, cfg: HashGridConfig):
    """Per-sample table rows + trilinear corner weights (pure ALU).

    Returns flat (N, L, 8) int32 rows, cw = 3-tuple of (N, L, 8) per-dim
    corner weights, and the `inside` mask (N, 3) where x wasn't clamped.

    Everything is computed as separate per-axis arrays: tensors with a
    trailing length-3 dim tile-pad 3 -> 128 on TPU, and XLA's remat pass
    materializing one (N, L, 8, 3) index tensor cost 9 GB (16x padding) at
    a 393k-sample step — the OOM bisected in scripts/tpu_bisect.py.
    """
    scales, res, hashed, offsets = _level_indices(cfg)
    T_mask = np.uint32((1 << cfg.log2_hashmap_size) - 1)

    inside = (x > 0.0) & (x < 1.0)
    x = jnp.clip(x, 0.0, 1.0)
    res_f = res.astype(np.float32)[None, :]
    i0, frac = [], []
    for d in range(3):
        # position in each level's grid, tcnn convention pos = x*s + 0.5
        pos_d = x[:, d:d + 1] * scales[None, :] + 0.5                 # (N, L)
        # keep the +1 corner in range for dense levels
        i0_d = jnp.clip(jnp.floor(pos_d), 0.0, res_f - 2)
        frac.append(pos_d - i0_d)
        i0.append(i0_d.astype(jnp.uint32))

    cb = [np.ascontiguousarray(_CORNERS[:, d]) for d in range(3)]     # (8,) each
    ix = i0[0][:, :, None] + jnp.asarray(cb[0], jnp.uint32)[None, None, :]
    iy = i0[1][:, :, None] + jnp.asarray(cb[1], jnp.uint32)[None, None, :]
    iz = i0[2][:, :, None] + jnp.asarray(cb[2], jnp.uint32)[None, None, :]

    r = res.astype(np.uint32)[None, :, None]
    dense_idx = ix + iy * r + iz * (r * r)
    hash_idx = (ix ^ (iy * _PRIME_Y) ^ (iz * _PRIME_Z)) & T_mask
    idx = jnp.where(hashed[None, :, None], hash_idx, dense_idx)
    flat = (idx + offsets[None, :, None]).astype(jnp.int32)           # (N, L, 8)

    # per-dim corner weights: frac or (1-frac) per corner bit
    cw = tuple(
        jnp.where(jnp.asarray(cb[d] > 0)[None, None, :],
                  frac[d][:, :, None], 1.0 - frac[d][:, :, None])     # (N, L, 8)
        for d in range(3))
    return flat, cw, inside


def _table_fetch(table, flat_1d, cfg: HashGridConfig):
    """Gather feature rows for flat 1-D entry indices -> (M, F).

    Measured negative result (round 2, kept as a record): packing 64
    entries into 128-float rows and lane-selecting after a whole-row
    gather — motivated by microbenchmarks where >=256B-row gathers from
    <~100 MB tables ran 2x faster per row — is 5x SLOWER at the real
    encode shapes (175 ms vs 33 ms for 4M fetches) and the chunked
    variant OOMs (XLA materializes the full (M, 128) row temp through
    lax.map). The per-entry gather below is the fastest known form.
    """
    return table[flat_1d]


def _encode_fwd_impl(table, x, cfg: HashGridConfig):
    flat, cw, _ = _indices_weights(x, cfg)
    n = x.shape[0]
    feats = _table_fetch(table, flat.reshape(-1), cfg).reshape(
        n, cfg.n_levels, 8, cfg.n_features)
    w = cw[0] * cw[1] * cw[2]                                         # (N, L, 8)
    out = jnp.sum(feats * w[..., None].astype(feats.dtype), axis=2)   # (N, L, F)
    return out.reshape(n, cfg.out_dim)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode(table, x, cfg: HashGridConfig):
    return _encode_fwd_impl(table, x, cfg)


def _encode_fwd(table, x, cfg):
    # residuals are just the primals: indices/weights are recomputed in the
    # backward (pure ALU + one gather — cheaper than 268 MB of saved
    # (N, L, 8) rows/weights round-tripping HBM)
    return _encode_fwd_impl(table, x, cfg), (table, x)


def _encode_bwd(cfg, res, gout):
    """Scatter-free backward.

    d_table uses dense_segment_sum (sort+cumsum pipeline, ops/segments.py):
    XLA's native scatter-add for the 33.5M corner updates of a training
    step costs 1.37 s on this TPU runtime vs ~0.35 s for the sort path.
    d_x is the trilinear derivative (gather-side only).
    """
    from .segments import dense_segment_sum_batched
    table, x = res
    n = x.shape[0]
    L, F = cfg.n_levels, cfg.n_features
    scales = np.asarray(cfg.scales, dtype=np.float32)
    offsets = np.asarray(cfg.offsets, dtype=np.int32)

    flat, cw, inside = _indices_weights(x, cfg)
    g = gout.reshape(n, L, F).astype(jnp.float32)                     # (N, L, F)

    # --- table cotangent: sum_{n} w[n,l,c] * g[n,l,:] into row flat[n,l,c].
    # Batched per level (level-local rows): L independent (N*8 + T_l)-row
    # sorts beat one global sort — XLA sort cost is superlinear
    # (measured 384 ms vs 476 ms at the training shape). Per-feature
    # columns stay separate (L, M) 2-D arrays: a trailing F=2 dim would
    # tile-pad 2 -> 128 if materialized.
    w = (cw[0] * cw[1] * cw[2]).astype(jnp.float32)
    upd_cols = tuple(
        jnp.transpose(w * g[:, :, None, f], (1, 0, 2)).reshape(L, n * 8)
        for f in range(F))
    local = jnp.transpose(flat - offsets[None, :, None],
                          (1, 0, 2)).reshape(L, n * 8)
    # pack=False: the w*g products are genuinely f32 (trilinear weights);
    # the exact path exists for final-quality polish (anneal finish,
    # --optimize_ext), so its updates stay unquantized. Sorts are still
    # unstable (update order within a row only permutes the fp32 cumsum,
    # ~1e-4 relative — the module-docstring error class).
    d_table = dense_segment_sum_batched(local, upd_cols, cfg.level_sizes,
                                        pack=False).astype(table.dtype)

    # --- x cotangent: d out / d frac via per-dim weight products
    feats = _table_fetch(table, flat.reshape(-1), cfg).reshape(
        n, L, 8, F).astype(jnp.float32)
    s_c = jnp.sum(feats * g[:, :, None, :], axis=-1)                  # (N, L, 8)
    pe = (cw[1] * cw[2], cw[0] * cw[2], cw[0] * cw[1])
    d_x_cols = []
    for d in range(3):
        sign_d = jnp.asarray(np.where(_CORNERS[:, d] > 0, 1.0, -1.0),
                             jnp.float32)                             # (8,)
        dfrac_d = jnp.sum(s_c * sign_d[None, None, :] * pe[d], axis=2)
        d_x_cols.append(jnp.sum(dfrac_d * scales[None, :], axis=1))   # (N,)
    d_x = jnp.stack(d_x_cols, axis=-1)
    d_x = jnp.where(inside, d_x, 0.0).astype(x.dtype)
    return d_table, d_x


_encode.defvjp(_encode_fwd, _encode_bwd)


# --------------------------------------------------------------------------
# Stochastic-corner encoding: 1 of 8 trilinear corners per (sample, level)
# --------------------------------------------------------------------------
# The training step's cost is dominated by per-row gather/update issue rate
# (~6.3 ns/row measured — DESIGN.md), and the exact encode issues
# N x L x 8 rows forward plus as many backward updates. Sampling ONE corner
# per (sample, level) with probability equal to its trilinear weight is the
# single-sample Monte-Carlo estimator of the trilerp (E[f_sel] = sum_c w_c
# f_c): the corner weights factor per axis, so each axis independently picks
# its +1 bit with probability frac_d. This cuts forward rows AND backward
# segment-sum update volume 8x. The same estimator is already validated for
# rendering by rendering_baked.py's stochastic interp.
#
# Gradient semantics: for a FIXED seed the forward is an exact (sparse)
# linear gather, so d_table below is the exact gradient of the sampled
# forward — training optimizes the expectation of the objective over corner
# draws (a smoothed objective, dropout-style). Boundary caveat: in the
# outermost cell sliver (pos > res-1) the exact path extrapolates with a
# negative corner-0 weight; P = clip(frac, 0, 1) saturates to the boundary
# vertex there instead — biased only in that sliver. d_x is returned as ZERO:
# the sampled forward is piecewise-constant in x (the position influences
# only the sampling probabilities), so callers that need position gradients
# (pose refinement --optimize_ext, render_surface_normal) must use the
# deterministic path (seed=None). Enforced by the trainer, which disables
# stochastic corners when optimize_ext is set.


def _stoch_indices(x: jnp.ndarray, seed, cfg: HashGridConfig):
    """One sampled corner row per (sample, level): (N, L) int32 flat rows."""
    from .rng import hash_uniform
    scales, res, hashed, offsets = _level_indices(cfg)
    T_mask = np.uint32((1 << cfg.log2_hashmap_size) - 1)
    n, L = x.shape[0], cfg.n_levels

    x = jnp.clip(x, 0.0, 1.0)
    res_f = res.astype(np.float32)[None, :]
    # per-(sample, level) counter for the hash RNG
    lin = (jnp.arange(n, dtype=jnp.uint32)[:, None] * np.uint32(L)
           + jnp.arange(L, dtype=jnp.uint32)[None, :])          # (N, L)
    idx_axes = []
    for d in range(3):
        pos_d = x[:, d:d + 1] * scales[None, :] + 0.5            # (N, L)
        i0_d = jnp.clip(jnp.floor(pos_d), 0.0, res_f - 2)
        frac_d = pos_d - i0_d
        u_d = hash_uniform(lin, seed, stream=d + 1)
        bit = (u_d < frac_d).astype(jnp.uint32)                  # P = frac_d
        idx_axes.append(i0_d.astype(jnp.uint32) + bit)
    ix, iy, iz = idx_axes
    r = res.astype(np.uint32)[None, :]
    dense_idx = ix + iy * r + iz * (r * r)
    hash_idx = (ix ^ (iy * _PRIME_Y) ^ (iz * _PRIME_Z)) & T_mask
    idx = jnp.where(hashed[None, :], hash_idx, dense_idx)
    return (idx + offsets[None, :]).astype(jnp.int32)            # (N, L)


def _encode_stoch_fwd_impl(table, x, seed, cfg: HashGridConfig):
    flat = _stoch_indices(x, seed, cfg)
    n = x.shape[0]
    feats = _table_fetch(table, flat.reshape(-1), cfg).reshape(
        n, cfg.n_levels, cfg.n_features)
    return feats.reshape(n, cfg.out_dim)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _encode_stoch(table, x, seed, cfg: HashGridConfig):
    return _encode_stoch_fwd_impl(table, x, seed, cfg)


def _encode_stoch_fwd(table, x, seed, cfg):
    # residuals: recompute the sampled indices in the backward (pure ALU +
    # hash) instead of saving (N, L) rows across the whole forward
    return _encode_stoch_fwd_impl(table, x, seed, cfg), (table, x, seed)


def _encode_stoch_bwd(cfg, res, gout):
    from .segments import dense_segment_sum_batched
    table, x, seed = res
    n = x.shape[0]
    L, F = cfg.n_levels, cfg.n_features
    offsets = np.asarray(cfg.offsets, dtype=np.int32)

    flat = _stoch_indices(x, seed, cfg)                          # (N, L)
    g = gout.reshape(n, L, F).astype(jnp.float32)
    local = jnp.transpose(flat - offsets[None, :], (1, 0))       # (L, N)
    upd_cols = tuple(jnp.transpose(g[:, :, f], (1, 0)) for f in range(F))
    # pack=True (default): these update values are raw upstream cotangents
    # that already lived in compute_dtype (bf16 in production), so the
    # bf16 sort-lane packing is near-lossless here; 3 sort operands -> 2
    # (measured 87 -> 58 ms at the b32 training shape,
    # scripts/tpu_step_anatomy_r4.py).
    d_table = dense_segment_sum_batched(local, upd_cols,
                                        cfg.level_sizes).astype(table.dtype)
    d_x = jnp.zeros_like(x)   # piecewise-constant in x; see module note
    d_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return d_table, d_x, d_seed


_encode_stoch.defvjp(_encode_stoch_fwd, _encode_stoch_bwd)


@partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray,
                    cfg: HashGridConfig, seed=None) -> jnp.ndarray:
    """Encode positions with the multiresolution hash grid.

    table: (total_entries, F) parameters
    x:     (N, 3) positions in [0, 1]^3 (out-of-range is clamped)
    seed:  None for the exact 8-corner trilerp; a traced uint32 scalar for
           the stochastic single-corner estimator (8x fewer gather/update
           rows, trilinear in expectation — see the module note above).
    Returns (N, L*F) features, level-major like tcnn.

    The exact path is differentiable in both table (scatter-free custom
    backward) and x (trilinear derivative, used by render_surface_normal);
    the stochastic path only in table.
    """
    if seed is None:
        return _encode(table, x, cfg)
    return _encode_stoch(table, x, seed, cfg)
