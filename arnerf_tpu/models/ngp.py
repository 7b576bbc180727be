"""The NGP radiance field + occupancy-grid maintenance, functional style.

TPU-native rebuild of the reference's `NGP` nn.Module
(reference: models/networks.py:12-281). The model is a pure function of a
params pytree; the occupancy grid is an explicit `GridState` pytree updated
by pure functions — both live on device and are threaded through the jitted
training step.

Components and their reference counterparts:
  * hash-grid + sigma MLP ............. tcnn NetworkWithInputEncoding
                                        (networks.py:37-57)
  * SH deg-4 direction encoding ....... tcnn SphericalHarmonics (:59-66)
  * rgb MLP (64x2, sigmoid/none) ...... tcnn FullyFusedMLP (:68-78)
  * per-channel tonemapper MLPs ....... HDR-NeRF heads (:80-93)
  * density / forward ................. (:95-165)
  * get_all_cells / sampling .......... (:167-207)
  * mark_invisible_cells .............. (:209-250)
  * update_density_grid + packbits .... (:252-281)
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.hashgrid import (HashGridConfig, hashgrid_init, hashgrid_encode,
                            ngp_growth_factor)
from ..ops.sh import sh_encode
from ..ops.trunc_exp import trunc_exp
from ..ops.packbits import packbits
from .mlp import mlp_init, mlp_apply

NEAR_DISTANCE = 0.01  # reference: models/rendering.py:10


@dataclass(frozen=True)
class NGPConfig:
    scale: float = 0.5
    rgb_act: str = "Sigmoid"        # 'Sigmoid' | 'None' (HDR log-radiance)
    use_raw_hdr: bool = False
    grid_size: int = 128
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    sigma_hidden: int = 64
    sigma_out: int = 16
    rgb_hidden: int = 64
    # 'bfloat16' halves hash-table gather bandwidth and runs the MLPs on the
    # MXU in bf16 (fp32 accumulation); parameters stay fp32 for Adam
    compute_dtype: str = "float32"
    # evaluate the sigma+rgb MLP pair as one Pallas kernel with VMEM-resident
    # weights/activations (tinycudann FullyFusedMLP equivalent,
    # ops/fused_head.py); False = plain XLA matmuls
    fused_head: bool = False
    # single-corner stochastic hash-grid gathers on the TRAINING paths
    # (render_train + density-grid updates): 8x fewer gather/update rows,
    # trilinear in expectation (ops/hashgrid.py stochastic-corner note).
    # Inference/eval paths stay exact regardless. Incompatible with
    # --optimize_ext (position gradients are zero under the estimator);
    # the trainer disables it there.
    stoch_corners: bool = False

    @property
    def cdtype(self):
        import jax.numpy as _jnp
        return _jnp.bfloat16 if self.compute_dtype == "bfloat16" \
            else _jnp.float32

    @property
    def cascades(self) -> int:
        # reference: models/networks.py:27
        return max(1 + int(np.ceil(np.log2(2 * self.scale))), 1)

    @property
    def hash_cfg(self) -> HashGridConfig:
        return HashGridConfig(
            n_levels=self.n_levels, n_features=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            per_level_scale=ngp_growth_factor(
                self.scale, self.n_levels, self.base_resolution))

    @property
    def has_tonemappers(self) -> bool:
        # reference: models/networks.py:80
        return self.rgb_act == "None" and not self.use_raw_hdr


def ngp_init(key, cfg: NGPConfig) -> dict:
    k_hash, k_sig, k_rgb, k_tm = jax.random.split(key, 4)
    params = {
        "hash_table": hashgrid_init(k_hash, cfg.hash_cfg),
        # 32 -> 64 -> 16; first output channel is the (log) density
        "sigma_mlp": mlp_init(k_sig, cfg.hash_cfg.out_dim, cfg.sigma_hidden,
                              cfg.sigma_out, 1),
        # (16 SH + 16 feat) -> 64 -> 64 -> 3
        "rgb_mlp": mlp_init(k_rgb, 16 + cfg.sigma_out, cfg.rgb_hidden, 3, 2),
    }
    if cfg.has_tonemappers:
        params["tonemappers"] = [
            mlp_init(k, 1, 64, 1, 1) for k in jax.random.split(k_tm, 3)]
    return params


@partial(jax.jit, static_argnames=("cfg", "return_feat"))
def ngp_density(params, x, cfg: NGPConfig, return_feat: bool = False,
                seed=None):
    """x: (N, 3) world positions in [-scale, scale]^3 -> sigmas (N,).

    seed: optional traced uint32 for stochastic-corner hash gathers
    (training paths only — see ops/hashgrid.py).
    reference: models/networks.py:95-108.
    """
    xn = (x + cfg.scale) / (2 * cfg.scale)
    table = params["hash_table"].astype(cfg.cdtype)
    feats = hashgrid_encode(table, xn, cfg.hash_cfg, seed=seed)
    h = mlp_apply(params["sigma_mlp"], feats, dtype=cfg.cdtype)
    sigmas = trunc_exp(h[:, 0].astype(jnp.float32))
    if return_feat:
        return sigmas, h
    return sigmas


def ngp_log_radiance_to_rgb(params, log_radiances, exposure=None):
    """HDR-NeRF tonemapping heads. reference: models/networks.py:110-131."""
    log_exposure = 0.0 if exposure is None else jnp.log(exposure)
    outs = []
    for i in range(3):
        inp = log_radiances[:, i:i + 1] + log_exposure
        outs.append(mlp_apply(params["tonemappers"][i], inp,
                              out_activation="sigmoid"))
    return jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnames=("cfg", "output_radiance"))
def ngp_forward(params, x, d, cfg: NGPConfig, exposure=None,
                output_radiance: bool = False, seed=None):
    """x, d: (N, 3) -> (sigmas (N,), rgbs (N, 3)).

    seed: optional traced uint32 for stochastic-corner hash gathers.
    reference: models/networks.py:133-165.
    """
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-12)
    d_enc = sh_encode(d)
    if cfg.fused_head:
        # single Pallas program for both MLPs (VMEM-resident weights +
        # activations); interpret mode keeps CPU tests running the same code
        from ..ops.fused_head import fused_field_head, \
            head_weights_from_params
        xn = (x + cfg.scale) / (2 * cfg.scale)
        table = params["hash_table"].astype(cfg.cdtype)
        feats = hashgrid_encode(table, xn, cfg.hash_cfg, seed=seed)
        h, rgbs = fused_field_head(
            feats, d_enc, head_weights_from_params(params), cfg.cdtype,
            jax.default_backend() == "cpu")
        sigmas = trunc_exp(h[:, 0])
        if cfg.rgb_act == "Sigmoid":
            rgbs = jax.nn.sigmoid(rgbs)
    else:
        sigmas, h = ngp_density(params, x, cfg, return_feat=True, seed=seed)
        rgb_in = jnp.concatenate([d_enc.astype(cfg.cdtype),
                                  h.astype(cfg.cdtype)], axis=1)
        act = "sigmoid" if cfg.rgb_act == "Sigmoid" else None
        rgbs = mlp_apply(params["rgb_mlp"], rgb_in, out_activation=act,
                         dtype=cfg.cdtype)

    if cfg.use_raw_hdr:
        # raw-HDR EXR training: leaky relu in training, relu for final output
        rgbs = jax.nn.relu(rgbs) if output_radiance else jax.nn.leaky_relu(rgbs)
    elif cfg.rgb_act == "None":
        if output_radiance:  # HDR map output
            rgbs = trunc_exp(jnp.clip(rgbs, 0.0, 20.0))
        else:                # LDR via the tonemapper heads
            rgbs = ngp_log_radiance_to_rgb(params, rgbs, exposure)
    return sigmas, rgbs


# --------------------------------------------------------------------------
# Occupancy grid
# --------------------------------------------------------------------------

class GridState(NamedTuple):
    density_grid: jnp.ndarray  # (C, G^3) float32; -1 marks invisible cells
    count_grid: jnp.ndarray    # (C, G^3) float32 camera-coverage fraction
    occ_flat: jnp.ndarray      # (C*G^3,) uint8 0/1, marching layout [c,x,y,z]
    bitfield: jnp.ndarray      # (C*G^3//8,) uint8 packed (parity artifact)


def grid_state_init(cfg: NGPConfig) -> GridState:
    C, G3 = cfg.cascades, cfg.grid_size ** 3
    return GridState(
        density_grid=jnp.zeros((C, G3), jnp.float32),
        count_grid=jnp.zeros((C, G3), jnp.float32),
        occ_flat=jnp.zeros((C * G3,), jnp.uint8),
        bitfield=jnp.zeros((C * G3 // 8,), jnp.uint8),
    )


def _cell_coords(idx, G: int):
    """Linear cell index -> integer (x, y, z), layout [x, y, z] row-major
    (matches ops/marching.py's flat index ((c*G + x)*G + y)*G + z)."""
    x = idx // (G * G)
    y = (idx // G) % G
    z = idx % G
    return jnp.stack([x, y, z], axis=-1)


def _cells_to_world(coords, mip, cfg: NGPConfig, key=None):
    """Grid coords (+ optional in-cell jitter) -> world xyz for cascade mip.

    reference: models/networks.py:263-267.
    """
    G = cfg.grid_size
    s = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), cfg.scale)
    half = s / G
    xyz = coords.astype(jnp.float32) / (G - 1) * 2.0 - 1.0
    xyz = xyz * (s - half)[..., None]
    if key is not None:
        xyz = xyz + (jax.random.uniform(key, xyz.shape) * 2.0 - 1.0) * half[..., None]
    return xyz


def _chunked_density(params, cfg: NGPConfig, xyz, chunk: int = 1 << 18,
                     seed=None):
    """Evaluate ngp_density over a large point set in fixed-size chunks."""
    n = xyz.shape[0]
    n_pad = (-n) % chunk
    xyz_p = jnp.concatenate([xyz, jnp.zeros((n_pad, 3), xyz.dtype)])
    xs = xyz_p.reshape(-1, chunk, 3)
    if seed is None:
        sig = jax.lax.map(lambda c: ngp_density(params, c, cfg), xs)
    else:
        # fold the chunk index into the seed: the hash RNG's counter is
        # local to each call, so chunks would otherwise share corner draws
        ci = jnp.arange(xs.shape[0], dtype=jnp.uint32)
        sig = jax.lax.map(
            lambda a: ngp_density(params, a[0], cfg, seed=seed + a[1]),
            (xs, ci))
    return sig.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("cfg", "img_w", "img_h"))
def mark_invisible_cells(state: GridState, K, poses, cfg: NGPConfig,
                         img_w: int, img_h: int) -> GridState:
    """Flag cells outside every camera frustum with density -1 (never
    occupied); store per-cell camera-coverage in count_grid.

    reference: models/networks.py:209-250.
    """
    G, C = cfg.grid_size, cfg.cascades
    G3 = G ** 3
    N_cams = poses.shape[0]
    w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)          # (N, 3, 3)
    w2c_T = -jnp.einsum("nij,nj->ni", w2c_R, poses[:, :3, 3])  # (N, 3)

    idx = jnp.arange(G3, dtype=jnp.int32)
    coords = _cell_coords(idx, G)                          # (G^3, 3)

    def per_cascade(c):
        mip = jnp.full((G3,), c, jnp.int32)
        xyz = _cells_to_world(coords, mip, cfg)            # (G^3, 3)

        def per_chunk(x):
            # x: (chunk, 3) world points
            xc = jnp.einsum("nij,mj->nmi", w2c_R, x) + w2c_T[:, None, :]
            uvd = jnp.einsum("ij,nmj->nmi", K, xc)         # (N, m, 3)
            uv = uvd[..., :2] / jnp.where(jnp.abs(uvd[..., 2:]) > 1e-9,
                                          uvd[..., 2:], 1e-9)
            in_image = ((uvd[..., 2] >= 0)
                        & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
                        & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
            covered = (uvd[..., 2] >= NEAR_DISTANCE) & in_image
            count = jnp.sum(covered, axis=0) / N_cams      # (m,)
            too_near = jnp.any((uvd[..., 2] < NEAR_DISTANCE) & in_image, axis=0)
            return count, too_near

        chunk = min(1 << 16, G3)  # G^3 is a power of two -> evenly divides
        count, too_near = jax.lax.map(
            per_chunk, xyz.reshape(-1, chunk, 3))
        count = count.reshape(-1)
        too_near = too_near.reshape(-1)
        valid = (count > 0) & (~too_near)
        # preserve any already-trained EMA density for visible cells
        # (identical to the reference's 0-init on a fresh start, but keeps
        # checkpoint resumes from wiping the grid and re-warming it)
        prior = jnp.maximum(state.density_grid[c], 0.0)
        return count, jnp.where(valid, prior, -1.0)

    counts, grids = jax.lax.map(per_cascade, jnp.arange(C))
    return state._replace(density_grid=grids, count_grid=counts)


@partial(jax.jit, static_argnames=("cfg", "warmup", "erode"))
def update_density_grid(params, state: GridState, key, cfg: NGPConfig,
                        density_threshold: float, warmup: bool,
                        decay: float = 0.95, erode: bool = False) -> GridState:
    """EMA density-grid maintenance. reference: models/networks.py:252-281.

    warmup: evaluate ALL cells. Otherwise sample G^3/4 uniform cells plus
    G^3/4 cells drawn from the currently-occupied set, per cascade (the
    occupied draw is with replacement — a scatter-max makes duplicate cells
    benign, unlike the reference's nondeterministic last-write-wins).
    """
    G, C = cfg.grid_size, cfg.cascades
    G3 = G ** 3
    k_sample, k_jitter, k_stoch = jax.random.split(key, 3)
    # stochastic-corner density probes: the EMA max-decay already treats
    # each update as a noisy re-measurement (cells are sampled at jittered
    # positions), so the single-corner estimator's extra variance is
    # absorbed by the same mechanism at 1/8 the gather rows
    seed = jax.random.bits(k_stoch, dtype=jnp.uint32) \
        if cfg.stoch_corners else None

    if warmup:
        idx = jnp.broadcast_to(jnp.arange(G3, dtype=jnp.int32), (C, G3))
    else:
        M = G3 // 4
        ku, ko = jax.random.split(k_sample)
        uniform_idx = jax.random.randint(ku, (C, M), 0, G3, jnp.int32)
        # occupied draw by inverse-CDF over the occupancy indicator
        # (NOT jax.random.categorical/choice: those materialize an
        # (M, G^3) gumbel tensor)
        from ..ops.marching import _lower_bound_rows
        occ_ind = (state.density_grid > density_threshold).astype(jnp.float32)
        cdf = jnp.cumsum(occ_ind, axis=-1)                    # (C, G3)
        totals = cdf[:, -1:]
        u = jax.random.uniform(ko, (C, M)) * jnp.maximum(totals, 1e-9)
        rows = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                                (C, M))
        occ_idx = _lower_bound_rows(cdf.reshape(-1), rows.reshape(-1),
                                    u.reshape(-1), G3).reshape(C, M)
        occ_idx = jnp.minimum(occ_idx, G3 - 1)
        idx = jnp.concatenate([uniform_idx, occ_idx.astype(jnp.int32)], axis=1)

    coords = _cell_coords(idx, G)                              # (C, m, 3)
    mips = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                            idx.shape)
    xyz = _cells_to_world(coords.reshape(-1, 3), mips.reshape(-1), cfg,
                          key=k_jitter)
    sig = _chunked_density(params, cfg, xyz,
                           seed=seed).reshape(idx.shape)         # (C, m)

    if warmup:
        # idx enumerates every cell exactly once: the "scatter" is a reshape
        tmp = sig.reshape(C, G3)
    else:
        # duplicate sampled cells are benign under max (vs the reference's
        # nondeterministic last-write-wins). TPU scatter is row-serialized
        # (~90ns/row), so use the sort-based dense segment max instead.
        from ..ops.segments import dense_segment_max
        rows = (mips.reshape(-1) * G3 + idx.reshape(-1)).astype(jnp.int32)
        # sigma >= 0 (TruncExp), so fill=0 matches the zeros-init scatter-max
        tmp = dense_segment_max(rows, sig.reshape(-1).astype(jnp.float32),
                                C * G3, fill=0.0).reshape(C, G3)

    if erode:
        # decay harder where few cameras see the cell (reference :270-272)
        decay_g = jnp.clip(decay ** (1.0 / jnp.maximum(state.count_grid, 1e-6)),
                           0.1, 0.95)
    else:
        decay_g = decay
    grid = jnp.where(state.density_grid < 0, state.density_grid,
                     jnp.maximum(state.density_grid * decay_g, tmp))

    pos = grid > 0
    mean_density = jnp.sum(jnp.where(pos, grid, 0.0)) / jnp.maximum(
        jnp.sum(pos), 1)
    thr = jnp.minimum(mean_density, density_threshold)
    occ = (grid > thr).astype(jnp.uint8)
    return GridState(
        density_grid=grid, count_grid=state.count_grid,
        occ_flat=occ.reshape(-1),
        bitfield=packbits(grid.reshape(-1), thr))


@partial(jax.jit, static_argnames=("cfg", "output_radiance", "chunk"))
def ngp_forward_chunked(params, x, d, cfg: NGPConfig, exposure=None,
                        output_radiance: bool = False, chunk: int = 1 << 18,
                        seed=None):
    """ngp_forward over large point sets via lax.map sub-chunks inside one
    program (this runtime's compiler rejects single gathers much past 2^18
    samples; training stays under that, render rounds don't)."""
    n = x.shape[0]
    if n <= chunk:
        return ngp_forward(params, x, d, cfg, exposure=exposure,
                           output_radiance=output_radiance, seed=seed)
    n_pad = (-n) % chunk
    xp = jnp.concatenate([x, jnp.zeros((n_pad, 3), x.dtype)])
    dp = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)])
    n_chunks = xp.shape[0] // chunk
    # per-chunk seed offset: the hash RNG's counter is call-local, so all
    # chunks would otherwise share their corner draws
    ci = (jnp.arange(n_chunks, dtype=jnp.uint32) if seed is not None
          else jnp.zeros((n_chunks,), jnp.uint32))

    def body(a):
        s = None if seed is None else seed + a[-1]
        kw = dict(output_radiance=output_radiance, seed=s)
        if exposure is not None:
            return ngp_forward(params, a[0], a[1], cfg, exposure=a[2], **kw)
        return ngp_forward(params, a[0], a[1], cfg, **kw)

    if exposure is not None:
        ep = jnp.concatenate([exposure,
                              jnp.ones((n_pad, 1), exposure.dtype)])
        args = (xp.reshape(-1, chunk, 3), dp.reshape(-1, chunk, 3),
                ep.reshape(-1, chunk, 1), ci)
    else:
        args = (xp.reshape(-1, chunk, 3), dp.reshape(-1, chunk, 3), ci)
    sig, col = jax.lax.map(body, args)
    return sig.reshape(-1)[:n], col.reshape(-1, 3)[:n]
