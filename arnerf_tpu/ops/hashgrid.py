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


@partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray,
                    cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions with the multiresolution hash grid.

    table: (total_entries, F) parameters
    x:     (N, 3) positions in [0, 1]^3 (out-of-range is clamped)
    Returns (N, L*F) features, level-major like tcnn.
    """
    scales, res, hashed, offsets = _level_indices(cfg)
    T_mask = np.uint32((1 << cfg.log2_hashmap_size) - 1)

    x = jnp.clip(x, 0.0, 1.0)
    # (N, L, 3): position in each level's grid, tcnn convention pos = x*s + 0.5
    pos = x[:, None, :] * scales[None, :, None] + 0.5
    i0 = jnp.floor(pos)
    # keep the +1 corner in range for dense levels
    i0 = jnp.clip(i0, 0.0, (res[None, :, None] - 2).astype(jnp.float32))
    frac = pos - i0
    i0 = i0.astype(jnp.uint32)

    corners = jnp.asarray(_CORNERS, dtype=jnp.uint32)                 # (8, 3)
    idx3 = i0[:, :, None, :] + corners[None, None, :, :]              # (N, L, 8, 3)

    ix, iy, iz = idx3[..., 0], idx3[..., 1], idx3[..., 2]
    r = res.astype(np.uint32)[None, :, None]
    dense_idx = ix + iy * r + iz * (r * r)
    hash_idx = (ix ^ (iy * _PRIME_Y) ^ (iz * _PRIME_Z)) & T_mask
    idx = jnp.where(hashed[None, :, None], hash_idx, dense_idx)
    flat = (idx + offsets[None, :, None]).astype(jnp.int32)           # (N, L, 8)

    feats = table[flat]                                               # (N, L, 8, F)

    # trilinear weights: prod over dims of (1-frac) or frac per corner
    cw = jnp.where(jnp.asarray(_CORNERS, dtype=jnp.float32)[None, None, :, :] > 0,
                   frac[:, :, None, :], 1.0 - frac[:, :, None, :])    # (N, L, 8, 3)
    w = cw[..., 0] * cw[..., 1] * cw[..., 2]                          # (N, L, 8)

    out = jnp.sum(feats * w[..., None], axis=2)                       # (N, L, F)
    return out.reshape(x.shape[0], cfg.out_dim)
