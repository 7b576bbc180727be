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

There are NO occupancy-marching structures on this path: the network
renderer's two-level march + rank-select costs ~620 gather rows per ray
per round (built for 8192-ray training batches), while here an empty
voxel costs exactly one cheap row that composites to nothing. Background
rays die on tight-AABB intersection math; compositing and early
termination reuse composite_test_step, preserving the reference's
test-loop semantics (reference rendering.py:191-233).

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
from .ops.composite import composite_test_step
from .ops.intersection import ray_aabb_intersect_single

# row layout: [sigma, r_sh(9), g_sh(9), b_sh(9), pad(4)] -> 32 channels
N_CH = 32
N_SH = 9


class BakedField(NamedTuple):
    rows: jnp.ndarray        # (B^3, 32) — z-fastest voxel rows
    resolution: int          # B (static)
    scale: float             # AABB half-extent (static)
    aabb_lo: jnp.ndarray = None   # (3,) tight bounds of occupied voxels
    aabb_hi: jnp.ndarray = None
    # coarse max-sigma mip: (ceil(B/8)^3,) uint8, 1 iff any baked voxel in
    # the 8^3 block (dilated by 1 supercell) carries density. The renderer's
    # in-program prelude marches this to find each ray's occupied [t, t]
    # interval — one coarse row costs the same ~6.3 ns as a fine row, but a
    # supercell covers 8 fine steps, so leading/trailing empty space and
    # in-box background rays get ~8x cheaper (VERDICT r2 weak #2).
    mip: jnp.ndarray = None
    # (B^3,) f32 sigma-only copy of rows[:, 0]. Random row gathers fall off
    # a measured ~128 MB table-size cliff (11 -> 38 ns/row,
    # scripts/tpu_table_cliff.py — DRAM row-cycle-bound, index order and
    # dtype don't matter), so the renderer fetches sigma for EVERY sample
    # from this 67 MB table at ~8.3 ns/row and touches the 2.1 GB SH row
    # table only for the few weight-carrying samples per ray per round.
    sigma: jnp.ndarray = None
    # Quantized OCCUPIED-ONLY color table, the v3 answer to the same cliff
    # for the color fetches themselves: `rows_q` is (1 + V, 32) int8 with
    # layout [sh27 int8, pad, f32-scale-bits(4)] (per-voxel symmetric
    # quantization, row 0 reserved all-zeros for empty voxels), and
    # `row_index` is (B^3,) int32 voxel -> compact row. At 256^3 / 22%
    # occupancy the color table shrinks 2.1 GB -> ~118 MB — under the
    # cliff — so a color fetch costs a narrow index gather (~8.3 ns) plus
    # a 32 B row gather (~11 ns) instead of one ~38 ns big-table row.
    row_index: jnp.ndarray = None
    rows_q: jnp.ndarray = None
    # Multi-cascade scenes (scale > 0.5, reference colmap/nerfpp): rows is
    # the concatenation of `cascades` B^3 grids, cascade c covering the
    # cube of half-extent min(2^(c-1), scale) (the training grid's nesting,
    # models/ngp.py _cells_to_world). Sample lookup picks the FINEST
    # cascade containing the point (mip_from_pos) — inner-region rows of
    # outer cascades are dead. cascades == 1 keeps every single-cascade
    # path bit-identical (this field is aux, like resolution/scale).
    cascades: int = 1
    # Brick-packed sigma table ((ceil(B/8)^3, 512) uint8, round 5): brick
    # (bx,by,bz) holds its 8^3 voxels' log-coded sigma in one row
    # (z-fastest within the brick). The chip's gather engine is ROW-issue
    # bound at unchanged cost up to 512 B rows (scripts/tpu_brick_probe.py:
    # 512 B int8 rows gather at the same ns/row as 4 B rows), so one brick
    # row serves every ladder sample on the ray's ~9.4-voxel chord through
    # the brick (~2.7 samples at dt = 3.46 voxels, more at finer dt) — the
    # only way past the per-sample row floor that capped the slab frame at
    # ~1 FPS (DESIGN.md round-4 survivor forensics). Codes are
    # log-quantized: code = round(24 * log2(1 + sigma)) in [0, 255]
    # (sigma up to ~1570 at 1.5% relative step; 0 -> exactly 0).
    sigma_bricks: jnp.ndarray = None
    # Chebyshev distance transform of `mip` (same (Bc^3,) layout, uint8):
    # 0 = dilated-occupied supercell, k = max-norm supercell distance to
    # the nearest one. Enables the DISTANCE-STEPPING prelude (round 4):
    # instead of probing the mip at a fixed 1-supercell stride (~113
    # probes/ray over the box diagonal at 256^3 — the measured 130-150 ms
    # frame floor, DESIGN.md "frame anatomy"), each probe advances
    # max(D-1, 1) supercells — provably empty space is skipped at the
    # distance field's rate, and empty-scene rays resolve in O(log)
    # probes (sphere tracing on the occupancy grid). None falls back to
    # the fixed-stride prelude.
    mip_dist: jnp.ndarray = None
    # Delta-bake snapshots (round 5, bake_ngp only): the trainer's EMA
    # density grid (C, G^3) np.float32 and occupancy (C*G^3,) np.uint8 AS
    # OF THIS BAKE. bake_ngp_delta re-bakes only grid cells whose EMA
    # density moved > tau, whose occupancy flipped, or whose rolling-
    # refresh stripe came up (bake_phase counts stripes), amortizing a
    # full 256^3 bake (~57 s) to seconds per 16-step training block — the
    # mid-training GUI preview the reference gets for free from its live-
    # field renderer (reference show_gui.py:82-94). Host-side numpy, never
    # enter jit.
    src_density: object = None
    src_occ: object = None
    bake_phase: int = 0
    # (B^3,) np.bool bake mask at bake time (avoids re-deriving the
    # previous mask with a second host-side resample+dilate per delta)
    src_mask: object = None

    # NamedTuple keeps this a pytree; resolution/scale ride as aux via the
    # static argnums of the jitted entry points (callers pass them split).


MIP_FACTOR = 8

# brick-packed sigma (BakedField.sigma_bricks): 8^3 voxels per row,
# log-quantized uint8: code = round(LOGQ * log2(1 + sigma)), clip [0, 255]
BRICK = 8
LOGQ = 24.0


def sigma_encode(sigma):
    """f32 sigma -> uint8 log code (0 -> exactly 0; ~1.5% relative step)."""
    c = jnp.round(LOGQ * jnp.log2(1.0 + jnp.maximum(sigma, 0.0)))
    return jnp.clip(c, 0, 255).astype(jnp.uint8)


def sigma_decode(code):
    """uint8/int32 log code -> f32 sigma."""
    return jnp.exp2(code.astype(jnp.float32) / LOGQ) - 1.0


def build_sigma_bricks(rows_sigma, B: int, mip_dist=None):
    """(B^3,) baked sigma (z-fastest) -> ((ceil(B/8))^3, 512 or 640) uint8
    brick table: row b holds brick b's 8^3 voxels z-fastest, log-coded.
    Pure jnp (device-side; ~16.8 MB at 256^3). Pad voxels (B not a
    multiple of 8) encode sigma 0.

    mip_dist (round 5): the Chebyshev distance transform at supercell ==
    brick granularity (MIP_FACTOR == BRICK). When given, the row widens to
    640 lanes (one 128-lane tile) and lane 512 carries the brick's
    distance value — the renderer's empty-space skip reads it from the
    SAME gathered row (wide-row gathers are row-issue priced, so the
    extra lanes ride free; scripts/tpu_brick_probe.py)."""
    F = BRICK
    Bb = -(-B // F)
    sig = jnp.asarray(rows_sigma).reshape(B, B, B)
    if Bb * F != B:
        sig = jnp.pad(sig, ((0, Bb * F - B),) * 3)
    codes = sigma_encode(sig).reshape(Bb, F, Bb, F, Bb, F)
    bricks = codes.transpose(0, 2, 4, 1, 3, 5).reshape(Bb ** 3, F ** 3)
    if mip_dist is None:
        return bricks
    ext = jnp.zeros((Bb ** 3, 128), jnp.uint8)
    ext = ext.at[:, 0].set(jnp.asarray(mip_dist).astype(jnp.uint8))
    return jnp.concatenate([bricks, ext], axis=1)


def build_sigma_mip(rows_sigma, B: int):
    """(B^3,) baked sigma (z-fastest) -> dilated coarse occupancy mip
    (Bc^3,) uint8 with Bc = ceil(B/8). Pure jnp: runs on device (a host
    version would fetch the 67 MB sigma grid through the ~MB/s tunnel).

    Criterion is sigma > 0: bake_field writes exactly 0 for voxels outside
    the trainer's (already conservative) occupancy mask, so the mip carves
    precisely where the bake did. Dilation by 1 supercell covers stochastic
    trilerp jitter (<= 1 fine voxel) and coarse-step discretization."""
    F = MIP_FACTOR
    Bc = -(-B // F)
    sig = jnp.asarray(rows_sigma).reshape(B, B, B) > 0
    if Bc * F != B:
        pad = Bc * F - B
        sig = jnp.pad(sig, ((0, pad),) * 3)
    coarse = jnp.any(sig.reshape(Bc, F, Bc, F, Bc, F), axis=(1, 3, 5))
    p = jnp.pad(coarse, 1)
    d = jnp.zeros_like(coarse)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                d = d | p[dx:dx + Bc, dy:dy + Bc, dz:dz + Bc]
    return d.reshape(-1).astype(jnp.uint8)


def build_mip_dist(mip, Bc: int):
    """Chebyshev (max-norm) distance transform of the dilated coarse
    occupancy mip: out[c] = 0 where mip[c] > 0, else the supercell
    distance to the nearest dilated-occupied supercell (clipped to 255;
    an empty field reads Bc everywhere). Pure jnp — runs on device at
    bake time (Bc-1 relaxation passes of a 3^3 min-filter; Bc = 32 at a
    256^3 bake, microseconds of VPU work on a 32 KB grid).

    The renderer's distance-stepping prelude advances max(D-1, 1)
    supercells per probe: from max-norm distance D, a unit-direction ray
    must travel at least (D-1) supercell widths before entering any
    occupied supercell (each world step of w_c moves at most one cell
    per axis), so the skip is conservative; within D <= 1 it degrades to
    the fixed-stride march whose slack the mip's 1-supercell dilation
    already absorbs."""
    occ = jnp.asarray(mip).reshape(Bc, Bc, Bc) > 0
    # f32 with a +inf init: the min-identity init makes reduce_window's
    # padding static (an int init trips a traced identity check), and
    # inf + 1 stays inf at the borders
    d = jnp.where(occ, 0.0, float(Bc)).astype(jnp.float32)

    def relax(_, d):
        m = jax.lax.reduce_window(d, jnp.inf, jax.lax.min,
                                  (3, 3, 3), (1, 1, 1), "SAME")
        return jnp.minimum(d, m + 1.0)

    d = jax.lax.fori_loop(0, Bc - 1, relax, d)
    return jnp.clip(d, 0, 255).reshape(-1).astype(jnp.uint8)


def build_mip_dist_mc(sigma, B: int, cascades: int):
    """Multi-cascade analogue of build_sigma_mip + build_mip_dist: ONE
    outer-cube Chebyshev distance field covering every cascade's occupancy.

    The concatenated (C*B^3,) baked sigma holds cascade c's B^3 grid over
    the nested cube of half-extent h_c = scale / 2^(C-1-c). An outer
    supercell (Bc^3 over the full cube, Bc = B / MIP_FACTOR) is marked if
    ANY cascade's written voxel intersects it: cascade c's cube spans the
    central Bc / 2^(C-1-c) supercells, each covering (F * 2^(C-1-c))^3 of
    its voxels — a reshape max-pool per cascade (powers of two nest
    exactly). Dilated 1 supercell (same slack budget as the single-cascade
    mip: trilerp jitter <= one fine voxel, probe spacing <= one supercell)
    then distance-transformed for the sphere-tracing prelude.

    Geometry is world-space only, so the prelude it feeds is cascade-
    agnostic: coarse granularity over the inner cascade merely loosens the
    [first, last] bounds, never skips occupancy."""
    F = MIP_FACTOR
    if B % F:
        raise ValueError("build_mip_dist_mc needs MIP_FACTOR | B")
    Bc = B // F
    sig = jnp.asarray(sigma).reshape(cascades, B, B, B)
    occ_out = jnp.zeros((Bc, Bc, Bc), jnp.float32)
    for c in range(cascades):
        f = 2 ** (cascades - 1 - c)            # h_outer / h_c
        m = Bc // f                            # supercells cascade c spans
        if m == 0:
            continue
        pool = F * f
        occ_c = (sig[c] > 0).astype(jnp.float32).reshape(
            m, pool, m, pool, m, pool).max(axis=(1, 3, 5))
        lo = (Bc - m) // 2
        occ_out = occ_out.at[lo:lo + m, lo:lo + m, lo:lo + m].max(occ_c)
    occ_d = jax.lax.reduce_window(occ_out, -jnp.inf, jax.lax.max,
                                  (3, 3, 3), (1, 1, 1), "SAME")
    return build_mip_dist((occ_d > 0).astype(jnp.uint8).reshape(-1), Bc)


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
               dtype=jnp.float32, mean_sigma: bool = False,
               seeded: bool = False, sh_ridge: float = 1e-3,
               quantize_colors: bool = True) -> BakedField:
    """Bake a radiance field into a dense SH voxel grid.

    field_fn(xyz (M,3), dirs (M,3)) -> (sigma (M,), rgb (M,3)); it is
    called with each voxel center repeated for `n_dirs` directions.
    occ_mask: optional (B^3,) bool (z-fastest, same layout as rows) — only
    occupied voxels are evaluated; empty rows stay zero (sigma 0).
    mean_sigma: average sigma over the n_dirs evaluations instead of taking
    the first — for stochastic field evaluations (bake_ngp stoch=True) the
    per-direction RNG counters give D independent single-corner draws, so
    the mean recovers 1/sqrt(D) of the estimator noise for free.
    seeded: field_fn additionally takes a traced uint32 seed (varied per
    chunk) — the hook bake_ngp uses to run stochastic-corner hash gathers.
    quantize_colors: additionally emit the occupied-only int8 color table
    (BakedField.rows_q/row_index) the renderer's split path prefers; ~1%
    per-voxel color error (int8 symmetric), measured invisible after
    volume integration (tests pin >38 dB vs the exact path).
    sh_ridge: Tikhonov weight on the SH projection's normal equations.
    The plain pseudoinverse is exactly-interpolating, so at low n_dirs it
    amplifies per-direction estimator noise into high-order SH ringing;
    the ridge trades that for a slightly smoothed view-dependence, which
    is what lets n_dirs drop below ~24 in fast bakes.
    """
    B = resolution
    if occ_mask is not None:
        occ_idx = np.nonzero(np.asarray(occ_mask).reshape(-1))[0]
    else:
        occ_idx = np.arange(B ** 3)
    # voxel centers are derived ON DEVICE from the (z-fastest) indices —
    # see _bake_chunk_program

    bake_chunk = _bake_chunk_program(field_fn, scale, B, n_dirs=n_dirs,
                                     chunk=chunk, seeded=seeded,
                                     mean_sigma=mean_sigma,
                                     sh_ridge=sh_ridge)
    finalize = _bake_finalize_program(scale, B, dtype)

    rows = jnp.zeros((B ** 3, N_CH), jnp.float32)
    # pad the voxel list to a chunk multiple: ONE compiled program serves
    # every chunk (a trailing partial chunk would trigger a second 20-40 s
    # remote compile that can rival the whole bake's gather time)
    V = len(occ_idx)
    n_chunks = -(-V // chunk)
    if V and V % chunk:
        pad_n = n_chunks * chunk - V
        occ_idx = np.concatenate(
            [occ_idx, np.full(pad_n, B ** 3, occ_idx.dtype)])
    occ_idx_j = jnp.asarray(occ_idx, jnp.int32)      # ONE upload
    for ci in range(n_chunks):
        rows = bake_chunk(rows, occ_idx_j, jnp.int32(ci))
    rows, aabb_lo, aabb_hi, mip, sigma, mip_dist, bricks = finalize(rows)
    row_index = rows_q = None
    if quantize_colors and V:
        rows_q, row_index = quantize_color_table(rows, occ_idx[:V], B ** 3)
    return BakedField(rows=rows, resolution=B, scale=scale,
                      aabb_lo=aabb_lo, aabb_hi=aabb_hi, mip=mip,
                      sigma=sigma, row_index=row_index, rows_q=rows_q,
                      mip_dist=mip_dist, sigma_bricks=bricks)


def _bake_chunk_program(field_fn, scale: float, B: int, *, n_dirs: int,
                        chunk: int, seeded: bool, mean_sigma: bool,
                        sh_ridge: float):
    """Build the jitted per-chunk bake program shared by bake_field and
    bake_field_delta (same shapes -> one compiled program per process via
    the persistent XLA cache).

    The whole bake ACCUMULATES ON DEVICE: round 2 composed rows on the
    host, which read back (sigma + 27 SH coeffs) per chunk — 3.7 MB x
    hundreds of chunks through the axon tunnel (~MB/s) dominated the
    measured 491 s 256^3 bake wall clock. Here each chunk scatters its
    row block into the device-resident (B^3, 32) buffer (a ~3 ms
    scatter, off any hot path), and the mip/AABB finalize is jnp too;
    the host never sees bulk data.
    Per-chunk inputs arrive as ONE device-resident index array + a chunk
    counter: round 4 measured the previous per-chunk host->device
    uploads (centers 786 KB + idx 262 KB per chunk, ~60 MB per 256^3
    bake) dominating bake wall clock through the ~MB/s tunnel. The
    chunk slices its indices on device and derives voxel centers
    arithmetically; the only per-chunk transfer is a scalar.
    """
    dirs = fibonacci_sphere(n_dirs)                              # (D, 3)
    basis = np.asarray(sh9_basis(jnp.asarray(dirs)))             # (D, 9)
    # ridge-regularized least squares: (B^T B + lam*I)^-1 B^T
    btb = basis.T @ basis + sh_ridge * np.eye(N_SH, dtype=np.float32)
    pinv = np.linalg.solve(btb, basis.T).astype(np.float32)      # (9, D)
    d_j = jnp.asarray(dirs)
    pinv_j = jnp.asarray(pinv)

    @partial(jax.jit, donate_argnums=(0,))
    def bake_chunk(rows, idx_full, ci):
        idx = jax.lax.dynamic_slice(idx_full, (ci * chunk,), (chunk,))
        idxc = jnp.minimum(idx, B ** 3 - 1)      # pad rows: math-safe clamp
        fx = ((idxc // (B * B)) % B).astype(jnp.float32)
        fy = ((idxc // B) % B).astype(jnp.float32)
        fz = (idxc % B).astype(jnp.float32)
        c = ((jnp.stack([fx, fy, fz], axis=-1) + 0.5) / B
             * 2 * scale - scale)                                # (m, 3)
        seed = ci.astype(jnp.uint32)
        m = c.shape[0]
        x_rep = jnp.repeat(c, n_dirs, axis=0)                    # (m*D, 3)
        d_rep = jnp.tile(d_j, (m, 1))
        if seeded:
            sigma, rgb = field_fn(x_rep, d_rep, seed)
        else:
            sigma, rgb = field_fn(x_rep, d_rep)
        sigma = sigma.reshape(m, n_dirs)
        sigma = jnp.mean(sigma, axis=1) if mean_sigma else sigma[:, 0]
        rgb = rgb.reshape(m, n_dirs, 3)
        coeffs = jnp.einsum("kd,mdc->mkc", pinv_j, rgb)          # (m, 9, 3)
        block = jnp.concatenate(
            [sigma[:, None].astype(jnp.float32),
             jnp.transpose(coeffs, (0, 2, 1)).reshape(m, 27)
             .astype(jnp.float32),
             jnp.zeros((m, N_CH - 28), jnp.float32)], axis=1)
        # pad entries carry idx == B^3 (out of range) -> dropped
        return rows.at[idx].set(block, mode="drop")

    return bake_chunk


def _bake_finalize_program(scale: float, B: int, dtype):
    """Build the jitted bake finalize: tight world-space bounds of
    density-carrying voxels (+1 voxel margin), the coarse sigma mip, its
    distance transform, and the brick-packed sigma table, all on device.
    Shared by bake_field and bake_field_delta."""

    @jax.jit
    def finalize(rows):
        occ3 = (rows[:, 0] > 1e-4).reshape(B, B, B)
        any_occ = jnp.any(occ3)
        vox = 2 * scale / B
        los, his = [], []
        for axis, red in ((0, (1, 2)), (1, (0, 2)), (2, (0, 1))):
            m = jnp.any(occ3, axis=red)                          # (B,)
            first = jnp.argmax(m)
            last = B - 1 - jnp.argmax(m[::-1])
            los.append(first.astype(jnp.float32) * vox - scale - vox)
            his.append((last.astype(jnp.float32) + 1) * vox - scale + vox)
        aabb_lo = jnp.where(any_occ, jnp.stack(los), jnp.full(3, -scale))
        aabb_hi = jnp.where(any_occ, jnp.stack(his), jnp.full(3, scale))
        mip = build_sigma_mip(rows[:, 0], B)
        mip_dist = build_mip_dist(mip, -(-B // MIP_FACTOR))
        return (rows.astype(dtype), aabb_lo, aabb_hi, mip,
                rows[:, 0].astype(jnp.float32), mip_dist,
                build_sigma_bricks(rows[:, 0], B, mip_dist=mip_dist))

    return finalize


def bake_field_delta(field_fn, scale: float, prev: BakedField,
                     changed_idx, removed_idx=None, occ_idx_all=None,
                     n_dirs: int = 32, chunk: int = 1 << 15,
                     dtype=jnp.float32, mean_sigma: bool = False,
                     seeded: bool = False, sh_ridge: float = 1e-3,
                     quantize_colors: bool = True) -> BakedField:
    """Incremental bake: re-evaluate only `changed_idx` voxels on top of
    `prev`'s rows, zero `removed_idx` voxels, then re-finalize the
    derived structures (AABB/mip/dist/bricks — cheap full-grid jnp) and
    re-quantize the color table over `occ_idx_all` (the FULL current
    occupied set; gathers cost ~V rows, off the bake's critical path).

    The chunk program is IDENTICAL in shape to bake_field's, so a process
    that full-baked once re-uses the compiled program; a delta bake's
    cost is (changed / all) of the full bake's field-evaluation wall plus
    ~2 s of finalize/quantize. Snapshot bookkeeping (which voxels count
    as changed) lives in bake_ngp_delta."""
    B = prev.resolution
    changed_idx = np.asarray(changed_idx, np.int64).reshape(-1)
    bake_chunk = _bake_chunk_program(field_fn, scale, B, n_dirs=n_dirs,
                                     chunk=chunk, seeded=seeded,
                                     mean_sigma=mean_sigma,
                                     sh_ridge=sh_ridge)
    finalize = _bake_finalize_program(scale, B, dtype)

    # explicit copy: bake_chunk DONATES its rows buffer; aliasing
    # prev.rows would delete the caller's field mid-use
    rows = jnp.array(prev.rows, jnp.float32, copy=True)
    if removed_idx is not None and len(removed_idx):
        rows = _zero_rows(rows, jnp.asarray(removed_idx, jnp.int32))
    V = len(changed_idx)
    n_chunks = -(-V // chunk)
    if V and V % chunk:
        changed_idx = np.concatenate(
            [changed_idx, np.full(n_chunks * chunk - V, B ** 3,
                                  changed_idx.dtype)])
    idx_j = jnp.asarray(changed_idx, jnp.int32)
    for ci in range(n_chunks):
        rows = bake_chunk(rows, idx_j, jnp.int32(ci))
    rows, aabb_lo, aabb_hi, mip, sigma, mip_dist, bricks = finalize(rows)
    row_index = rows_q = None
    if quantize_colors and occ_idx_all is not None and len(occ_idx_all):
        rows_q, row_index = quantize_color_table(rows, occ_idx_all, B ** 3)
    return BakedField(rows=rows, resolution=B, scale=scale,
                      aabb_lo=aabb_lo, aabb_hi=aabb_hi, mip=mip,
                      sigma=sigma, row_index=row_index, rows_q=rows_q,
                      mip_dist=mip_dist, sigma_bricks=bricks)


@jax.jit
def _zero_rows(rows, idx):
    return rows.at[idx].set(jnp.zeros((idx.shape[0], rows.shape[1]),
                                      rows.dtype), mode="drop")


def quantize_color_table(rows, occ_idx_np, n_rows_total: int):
    """Occupied-only int8 color table (BakedField.rows_q/row_index),
    shared by bake_field and bake_field_mc: (1 + V, 32) int8 rows with
    layout [sh27 int8, pad, f32-scale-bits(4)] (per-voxel symmetric
    quantization, row 0 reserved all-zeros for empty voxels) plus the
    (n_rows_total,) int32 voxel -> compact-row index."""
    V = len(occ_idx_np)

    # occ_j rides as a jit ARGUMENT: a closed-over (V,) device array
    # would embed as a program constant, which the axon remote
    # compiler rejects at this size (HTTP 413; round-2 rule — same
    # reason bake_field's bake_chunk takes idx as an argument).
    @jax.jit
    def build_quant(rows, occ_j):
        sh = rows[occ_j, 1:28].astype(jnp.float32)        # (V, 27)
        sc = jnp.max(jnp.abs(sh), axis=1) / 127.0         # (V,)
        q = jnp.round(sh / jnp.maximum(sc, 1e-20)[:, None]) \
            .astype(jnp.int8)
        sbits = jax.lax.bitcast_convert_type(
            sc.astype(jnp.float32), jnp.int8)             # (V, 4)
        row = jnp.concatenate(
            [q, jnp.zeros((V, N_CH - 31), jnp.int8), sbits], axis=1)
        rq = jnp.concatenate(
            [jnp.zeros((1, N_CH), jnp.int8), row], axis=0)
        ri = jnp.zeros(n_rows_total, jnp.int32).at[occ_j].set(
            jnp.arange(1, V + 1, dtype=jnp.int32))
        return rq, ri

    return build_quant(rows, jnp.asarray(occ_idx_np, jnp.int32))


def cascade_half_extents(cascades: int, scale: float):
    """World half-extent of each cascade's cube: 0.5, 1, 2, ... capped at
    scale (the training grid's nesting, models/ngp.py _cells_to_world)."""
    return [float(min(2.0 ** (c - 1) if c else 0.5, scale))
            for c in range(cascades)]


def bake_field_mc(field_fn, scale: float, cascades: int,
                  resolution: int = 128, occ_masks=None,
                  quantize_colors: bool = True,
                  keep_dense_rows: bool = True, **bake_kw):
    """Multi-cascade bake: one B^3 SH grid per nested cascade cube,
    concatenated into a single (C*B^3, 32) table (BakedField.cascades).

    occ_masks: optional list of (B^3,) bools per cascade. The per-cascade
    grids are baked by bake_field at that cascade's half-extent; the AABB
    is the union of the per-cascade tight bounds. The coarse mip is
    single-cascade machinery and stays None.

    quantize_colors (needs occ_masks — the occupied list must come from
    the host-side masks, not from fetching C*B^3 sigmas back through the
    tunnel): occupied-only int8 color table over the CONCATENATED layout,
    which is what makes the MC split renderer's color FETCHES viable at
    production resolution — the dense (C*B^3, 32) f32 table is ~6.3 GB at
    256^3 x 3 cascades, far past the ~128 MB gather cliff. Note this
    fixes gather BANDWIDTH, not HBM residency: the dense table is still
    built (and kept unless keep_dense_rows=False).

    keep_dense_rows=False drops the dense table after quantization (rows
    becomes a 1-row placeholder): the split renderer never reads it when
    rows_q exists, and at production resolution the dense table IS the
    HBM liability. Requires a successful quantization (occ_masks given);
    the unsplit/debug render paths stop working on such a field."""
    B = resolution
    halves = cascade_half_extents(cascades, scale)
    parts = []
    for c, h in enumerate(halves):
        m = occ_masks[c] if occ_masks is not None else None
        parts.append(bake_field(field_fn, h, resolution=B, occ_mask=m,
                                quantize_colors=False, **bake_kw))
    rows = jnp.concatenate([p.rows for p in parts], axis=0)
    sigma = jnp.concatenate([p.sigma for p in parts], axis=0)
    aabb_lo = jnp.min(jnp.stack([p.aabb_lo for p in parts]), axis=0)
    aabb_hi = jnp.max(jnp.stack([p.aabb_hi for p in parts]), axis=0)
    row_index = rows_q = None
    if quantize_colors and occ_masks is not None:
        occ_idx = np.concatenate(
            [np.nonzero(np.asarray(occ_masks[c]).reshape(-1))[0] + c * B ** 3
             for c in range(cascades)])
        if len(occ_idx):
            rows_q, row_index = quantize_color_table(
                rows, occ_idx, cascades * B ** 3)
    if not keep_dense_rows and rows_q is not None:
        rows = jnp.zeros((1, N_CH), rows.dtype)
    mip_dist = (build_mip_dist_mc(sigma, B, cascades)
                if B % MIP_FACTOR == 0 else None)
    return BakedField(rows=rows, resolution=B, scale=scale,
                      aabb_lo=aabb_lo, aabb_hi=aabb_hi, sigma=sigma,
                      cascades=cascades, row_index=row_index, rows_q=rows_q,
                      mip_dist=mip_dist)


def _mc_voxel_index(x, jitter, B: int, scale: float, cascades: int):
    """Stochastic-trilerp voxel row for multi-cascade tables: pick the
    finest cascade containing the point (position-only — the renderer's
    steps already scale with distance), then index that cascade's grid.
    x: (M, 3); jitter: 3-tuple of (M,) uniforms. Returns (M,) int32 into
    the concatenated (C*B^3,) layout."""
    from .ops.stepping import mip_from_pos
    c = mip_from_pos(x, cascades)                                 # (M,)
    h = jnp.minimum(jnp.exp2(c.astype(jnp.float32) - 1.0), scale)
    ids = []
    for d in range(3):
        u = (x[:, d] + h) / (2.0 * h) * B - 0.5
        ids.append(jnp.clip(jnp.floor(u + jitter[d]).astype(jnp.int32),
                            0, B - 1))
    return ((c * B + ids[0]) * B + ids[1]) * B + ids[2]


@partial(jax.jit, static_argnames=(
    "B", "scale", "cascades", "T_threshold", "n_steps_cap",
    "samples_per_round", "step_mult", "color_window", "compact"))
def render_baked_mc_uniform(rows, aabb_lo, aabb_hi, rays_o, rays_d, key, *,
                            B: int, scale: float, cascades: int,
                            T_threshold: float = 1e-2,
                            n_steps_cap: int = 512,
                            samples_per_round: int = 16,
                            step_mult: float = 1.0, t_far=None,
                            sigma=None, color_window: int = 0,
                            row_index=None, rows_q=None, mip_dist=None,
                            compact: bool = True):
    """Multi-cascade baked render chunk: distance-scaled (exponential)
    stepping so the step length tracks the LOCAL cascade's voxel size.

    Uniform stepping — correct for one cube — undersamples the inner
    cascade ~(scale/0.5)x on unbounded scenes (a scale-4 diagonal in
    n_steps crosses the inner cube in ~n_steps/8 samples), so here
    dt(t) = clip(t * g, dt0, dt_max) with g = step_mult * 2/B (one local
    voxel per step at distance t, mirroring the reference's exp stepping,
    csrc/raymarching.cu calc_dt) and dt0/dt_max the inner/outer voxel
    sizes. The round loop carries t; a tiny S-step scan builds each
    round's sample ladder (pure ALU — the gathers dominate).

    sigma + color_window > 0 enable the sigma-first SPLIT fetch (the
    single-cascade v2 fast path ported here): every sample fetches only
    4 B from the (C*B^3,) sigma table instead of a full 128 B SH row —
    unbounded scenes march a LOT of empty outer-cascade space, and this
    makes that space 32x cheaper in bytes — then exact compositing
    weights are computed from sigma alone (same cumsum math as
    composite_test_step, per-sample dts) and full rows are fetched only
    for a `color_window`-wide stride-adaptive bucket tiling of each
    ray's weight support. Weight mass is exact for any span (cumsum
    differences); only color is box-averaged when the support exceeds
    the window. opacity/depth match the unsplit path to float tolerance
    (pinned by tests/test_baked.py::test_mc_split_color_path). Note the
    rgb and opacity sample SETS differ slightly: samples with w <= 1e-4
    outside [first, last] contribute to opacity/depth but not rgb, and
    sub-threshold tail samples inside the final bucket take the bucket-
    center color — an accepted approximation (pinned to atol=4e-3 /
    >38 dB); if baked output is ever alpha-composited downstream, the
    rgb/opacity asymmetry is the term to re-check.

    mip_dist (build_mip_dist_mc) enables the same distance-stepping
    prelude as the single-cascade path — one OUTER-cube Chebyshev field
    covering every cascade's occupancy, so empty approach/exit space
    costs O(few) probes per ray instead of exponential-step rounds — and
    compact=True ports the single-cascade survivor compaction: the round
    loop runs over halving alive-first prefixes (argsort + gathers
    between phases), so saturated/exhausted rays stop paying fetch rows.
    Both default on via render_baked/baked_frame_device_fn; results are
    prelude/compaction-invariant (pinned by tests/test_baked.py).
    Single-cascade scenes keep render_baked_uniform unchanged."""
    from .ops.rng import hash_uniform3
    N = rays_o.shape[0]
    S = samples_per_round
    dn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True).clip(1e-12)
    rays_d = rays_d / dn
    hits = ray_aabb_intersect_single(rays_o, rays_d, (aabb_lo + aabb_hi) / 2,
                                     (aabb_hi - aabb_lo) / 2)
    t1 = jnp.maximum(hits[:, 0], 0.0)
    t2 = hits[:, 1]
    if t_far is not None:
        tf = t_far * dn[:, 0]
        t2 = jnp.where(t_far >= 1e-6,
                       jnp.maximum(jnp.minimum(t2, tf), t1), t2)
    seed = jax.random.bits(key, dtype=jnp.uint32)
    sh_d = sh9_basis(rays_d)                                      # (N, 9)
    use_split = color_window > 0 and sigma is not None

    g = step_mult * 2.0 / B
    dt0 = step_mult * 2.0 * 0.5 / B            # inner-cascade voxel
    dt_max = step_mult * 2.0 * scale / B       # outermost voxel
    max_rounds = -(-n_steps_cap // S)

    t_begin, t_end = t1, t2
    alive0 = (hits[:, 0] > -0.5) & (t2 > t1)
    if mip_dist is not None:
        # distance-stepping prelude on the outer-cube field (geometry is
        # world-space, so it is cascade-agnostic); margins as in the
        # single-cascade path — 1.5 outer supercells cover half-spacing +
        # trilerp jitter (<= one fine voxel <= 1/MIP_FACTOR supercell)
        w_c = MIP_FACTOR * 2.0 * scale / B
        any_occ, first_t, last_t = _prelude_dist(
            mip_dist, rays_o, rays_d, t1, t2, B, scale, compact=compact)
        t_begin = jnp.clip(first_t - 1.5 * w_c, t1, t2)
        t_end = jnp.minimum(last_t + 1.5 * w_c, t2)
        alive0 = alive0 & any_occ

    def make_phase(ro_p, rd_p, sh_p, te_p, Np, next_n):
        def cond(carry):
            *_, alive, rounds = carry
            n_alive = jnp.sum(alive.astype(jnp.int32))
            go = (n_alive > 0) & (rounds < max_rounds)
            if next_n:
                go = go & (n_alive > next_n)
            return go

        def body(carry):
            t_cur, opacity, depth, rgb, alive, rounds = carry

            def ladder(t, _):
                dt = jnp.clip(t * g, dt0, dt_max)
                return t + dt, (t + 0.5 * dt, dt)

            t_next, (ts, dts) = jax.lax.scan(ladder, t_cur, None, length=S)
            ts = jnp.transpose(ts)                                # (Np, S)
            dts = jnp.transpose(dts)
            pos = ro_p[:, None, :] + ts[..., None] * rd_p[:, None, :]
            flat_x = pos.reshape(Np * S, 3)
            ctr = (jnp.uint32(rounds) * jnp.uint32(Np * S)
                   + jnp.arange(Np * S, dtype=jnp.uint32))
            jitter = hash_uniform3(ctr, seed, stream=1)
            ii = _mc_voxel_index(flat_x, jitter, B, scale, cascades)
            in_range = (ts < te_p[:, None]) & alive[:, None]

            if not use_split:
                f = rows[ii].astype(jnp.float32)                  # (M, 32)
                sig = f[:, 0].reshape(Np, S)
                sh = f[:, 1:28].reshape(Np, S, 3, N_SH)
                col = jnp.maximum(
                    jnp.einsum("nsck,nk->nsc", sh, sh_p), 0.0)
                sig = jnp.where(in_range, sig, 0.0)
                n_eff = jnp.sum(in_range, axis=1)
                opacity, depth, rgb, still = composite_test_step(
                    sig, col, dts, ts, n_eff, opacity, depth, rgb,
                    T_threshold)
                t_cur = jnp.where(alive, t_next, t_cur)
                alive = alive & still & (t_cur < te_p)
                return (t_cur, opacity, depth, rgb, alive, rounds + 1)

            # ---- split path: narrow sigma fetch -> exact weights -------
            # identical weight math to composite_test_step (in_range IS
            # the prefix mask it derives from n_eff: ts is monotone in s
            # and the alive mask zeroes whole rows), with per-sample dts
            # instead of the single-cascade path's scalar dt.
            iiNS = ii.reshape(Np, S)
            sig = jnp.where(in_range, sigma[ii].reshape(Np, S), 0.0)
            sd = sig * dts
            sd_excl = jnp.cumsum(sd, axis=1) - sd
            T_before = (1.0 - opacity)[:, None] * jnp.exp(-sd_excl)
            alpha = 1.0 - jnp.exp(-sd)
            included = (T_before > T_threshold) & in_range
            w = alpha * T_before * included.astype(sig.dtype)     # (Np, S)
            opacity = opacity + jnp.sum(w, axis=1)
            depth = depth + jnp.sum(w * ts, axis=1)

            # big rows only over the per-ray weight support: color_window
            # stride-adaptive buckets tile [first, last] significant
            # sample; bucket weight = exact cumsum difference, bucket
            # color = the row at the bucket center (render_baked_uniform's
            # scheme).
            Wc = color_window
            sel = w > 1e-4
            any_sel = jnp.any(sel, axis=1)
            start = jnp.argmax(sel, axis=1).astype(jnp.int32)     # (Np,)
            last = (S - 1
                    - jnp.argmax(sel[:, ::-1], axis=1).astype(jnp.int32))
            span = jnp.maximum(last - start + 1, 1)
            stride = (span + Wc - 1) // Wc                        # (Np,)
            k = jnp.arange(Wc, dtype=jnp.int32)[None, :]
            b0 = start[:, None] + k * stride[:, None]             # (Np, Wc)
            b1 = jnp.minimum(b0 + stride[:, None], S)
            slot_ok = (b0 <= last[:, None]) & any_sel[:, None]
            cw = jnp.cumsum(w, axis=1)                            # (Np, S)
            hi_w = jnp.take_along_axis(cw, jnp.clip(b1 - 1, 0, S - 1),
                                       axis=1)
            lo_w = jnp.where(b0 > 0,
                             jnp.take_along_axis(
                                 cw, jnp.clip(b0 - 1, 0, S - 1), axis=1),
                             0.0)
            w_slot = (hi_w - lo_w) * slot_ok.astype(w.dtype)
            jc = jnp.clip(jnp.minimum(b0 + stride[:, None] // 2,
                                      last[:, None]), 0, S - 1)
            ii_sel = jnp.take_along_axis(iiNS, jc, axis=1)
            if rows_q is not None:
                # quantized occupied-only color path (single-cascade v3,
                # same layout): narrow voxel->compact index gather + one
                # 32 B int8 row; empty voxels hit reserved all-zero row 0.
                rix = row_index[ii_sel.reshape(-1)]
                fq = rows_q[rix]                            # (M, 32) int8
                sc = jax.lax.bitcast_convert_type(
                    fq[:, N_CH - 4:], jnp.float32)          # (M,)
                sh = (fq[:, :27].astype(jnp.float32) * sc[:, None]) \
                    .reshape(Np, Wc, 3, N_SH)
            else:
                f = rows[ii_sel.reshape(-1)].astype(jnp.float32) \
                    .reshape(Np, Wc, N_CH)
                sh = f[:, :, 1:28].reshape(Np, Wc, 3, N_SH)
            rgb_sel = jnp.maximum(
                jnp.einsum("nwck,nk->nwc", sh, sh_p), 0.0)
            rgb = rgb + jnp.sum(w_slot[..., None] * rgb_sel, axis=1)

            still = (1.0 - opacity) > T_threshold
            t_cur = jnp.where(alive, t_next, t_cur)
            alive = alive & still & (t_cur < te_p)
            return (t_cur, opacity, depth, rgb, alive, rounds + 1)

        return cond, body

    n_prelude_alive = jnp.sum(alive0.astype(jnp.int32))
    carry = (jnp.where(alive0, t_begin, t2 + 1.0), jnp.zeros(N),
             jnp.zeros(N), jnp.zeros((N, 3)), alive0, jnp.int32(0))

    # halving alive-first prefixes, as in render_baked_uniform
    sizes = [N]
    if compact:
        while len(sizes) < 7 and sizes[-1] // 2 >= 4096:
            sizes.append(sizes[-1] // 2)

    ro_p, rd_p, sh_p, te_p = rays_o, rays_d, sh_d, t_end
    perms, tails = [], []
    for pi, Np in enumerate(sizes):
        next_n = sizes[pi + 1] if pi + 1 < len(sizes) else 0
        cond, body = make_phase(ro_p, rd_p, sh_p, te_p, Np, next_n)
        carry = jax.lax.while_loop(cond, body, carry)
        if next_n:
            t_cur, opacity, depth, rgb, alive, rn = carry
            perm = jnp.argsort(
                jnp.where(alive, 0, Np) + jnp.arange(Np, dtype=jnp.int32))
            t_cur, opacity, depth = t_cur[perm], opacity[perm], depth[perm]
            rgb, alive = rgb[perm], alive[perm]
            ro_p, rd_p = ro_p[perm], rd_p[perm]
            sh_p, te_p = sh_p[perm], te_p[perm]
            perms.append(perm)
            tails.append((t_cur[next_n:], opacity[next_n:], depth[next_n:],
                          rgb[next_n:], alive[next_n:]))
            carry = (t_cur[:next_n], opacity[:next_n], depth[:next_n],
                     rgb[:next_n], alive[:next_n], rn)
            ro_p, rd_p = ro_p[:next_n], rd_p[:next_n]
            sh_p, te_p = sh_p[:next_n], te_p[:next_n]

    t_cur, opacity, depth, rgb, alive, rounds = carry
    for perm, tail in zip(reversed(perms), reversed(tails)):
        t_cur = jnp.concatenate([t_cur, tail[0]])
        opacity = jnp.concatenate([opacity, tail[1]])
        depth = jnp.concatenate([depth, tail[2]])
        rgb = jnp.concatenate([rgb, tail[3]])
        alive = jnp.concatenate([alive, tail[4]])
        inv = jnp.argsort(perm)
        t_cur, opacity, depth = t_cur[inv], opacity[inv], depth[inv]
        rgb, alive = rgb[inv], alive[inv]

    return {"opacity": opacity, "depth": depth / dn[:, 0], "rgb": rgb,
            "rounds": rounds, "n_prelude_alive": n_prelude_alive}


def _prelude_dist(mip_dist, roc, rdc, t1c, t2c, B: int, scale: float,
                  Sc: int = 8, compact: bool = True):
    """Distance-stepping coarse prelude: per ray, the first and last
    dilated-occupied supercell probes along [t1c, t2c].

    Replaces the fixed-stride ladder (Kc ~= 113 probes/ray at 256^3) with
    sphere tracing on the mip's Chebyshev distance transform: a FORWARD
    march finds the first occupied probe, a simultaneous BACKWARD march
    from the box exit finds the last — each stops at its first hit, so
    neither traverses the occupied interior, and empty space is crossed
    at max(D-1, 1) supercells per probe. Rays march in lockstep rounds of
    `Sc` probes; since one grazing ray (D ~= 1 along its whole length)
    would otherwise price the bucket at the stride-1 worst case, the loop
    compacts unresolved rays to N/4 and N/16 alive-first prefixes between
    rounds (same argsort+gather machinery as the fine loop's phases).

    Conservativeness: identical slack budget to the stride-1 ladder. Near
    occupancy D <= 1 forces 1-supercell probe spacing, and the skip bound
    is the max-norm argument in build_mip_dist; the caller applies the
    same 1.5-supercell margins (half-spacing + block4 divergence +
    trilerp jitter < 1-supercell dilation).

    Returns (any_occ, first_t, last_t) in world units, first/last being
    PROBE positions (margins are the caller's)."""
    F = MIP_FACTOR
    Bc = -(-B // F)
    wd = F * 2.0 * scale / B
    Nc = roc.shape[0]
    BIG = jnp.float32(1e30)
    # stride-1 worst case bounds the while loops (a probe advances >= wd)
    K_max = int(np.ceil(2 * np.sqrt(3.0) * scale / wd)) + 2
    hard_rounds = -(-K_max // Sc) + 1

    def cells(p):
        ids = [jnp.clip(jnp.floor((p[:, d] + scale) / (2 * scale) * B),
                        0, B - 1).astype(jnp.int32) // F for d in range(3)]
        return (ids[0] * Bc + ids[1]) * Bc + ids[2]

    def make_phase(ro_p, rd_p, t1p, t2p, next_n):
        def cond(carry):
            *_, done_f, done_b, rounds = carry
            undone = jnp.sum((~(done_f & done_b)).astype(jnp.int32))
            go = (undone > 0) & (rounds < hard_rounds)
            if next_n:
                go = go & (undone > next_n)
            return go

        def body(carry):
            tf, tb, first, last, done_f, done_b, rounds = carry

            def probe(cc, _):
                tf, tb, first, last, done_f, done_b = cc
                Df = mip_dist[cells(ro_p + tf[:, None] * rd_p)] \
                    .astype(jnp.float32)
                hit_f = (Df == 0.0) & ~done_f
                first = jnp.where(hit_f, jnp.minimum(first, tf), first)
                done_f = done_f | hit_f
                tf = jnp.where(done_f, tf,
                               tf + jnp.maximum(Df - 1.0, 1.0) * wd)
                done_f = done_f | (tf >= t2p)
                Db = mip_dist[cells(ro_p + tb[:, None] * rd_p)] \
                    .astype(jnp.float32)
                hit_b = (Db == 0.0) & ~done_b
                last = jnp.where(hit_b, jnp.maximum(last, tb), last)
                done_b = done_b | hit_b
                tb = jnp.where(done_b, tb,
                               tb - jnp.maximum(Db - 1.0, 1.0) * wd)
                done_b = done_b | (tb <= t1p)
                return (tf, tb, first, last, done_f, done_b), None

            (tf, tb, first, last, done_f, done_b), _ = jax.lax.scan(
                probe, (tf, tb, first, last, done_f, done_b),
                None, length=Sc)
            return (tf, tb, first, last, done_f, done_b, rounds + 1)

        return cond, body

    tf0 = t1c + 0.5 * wd
    tb0 = t2c - 0.5 * wd
    state = (tf0, tb0, jnp.full((Nc,), BIG), jnp.full((Nc,), -BIG),
             tf0 >= t2c, tb0 <= t1c, jnp.int32(0))

    sizes = [Nc]
    if compact:
        while len(sizes) < 3 and sizes[-1] // 4 >= 2048:
            sizes.append(sizes[-1] // 4)

    ro_p, rd_p, t1p, t2p = roc, rdc, t1c, t2c
    perms, tails = [], []
    for pi, Np in enumerate(sizes):
        next_n = sizes[pi + 1] if pi + 1 < len(sizes) else 0
        cond, body = make_phase(ro_p, rd_p, t1p, t2p, next_n)
        state = jax.lax.while_loop(cond, body, state)
        if next_n:
            tf, tb, first, last, done_f, done_b, rn = state
            done = done_f & done_b
            perm = jnp.argsort(
                jnp.where(done, Np, 0) + jnp.arange(Np, dtype=jnp.int32))
            tf, tb = tf[perm], tb[perm]
            first, last = first[perm], last[perm]
            done_f, done_b = done_f[perm], done_b[perm]
            ro_p, rd_p = ro_p[perm], rd_p[perm]
            t1p, t2p = t1p[perm], t2p[perm]
            perms.append(perm)
            tails.append((first[next_n:], last[next_n:]))
            state = (tf[:next_n], tb[:next_n], first[:next_n],
                     last[:next_n], done_f[:next_n], done_b[:next_n], rn)
            ro_p, rd_p = ro_p[:next_n], rd_p[:next_n]
            t1p, t2p = t1p[:next_n], t2p[:next_n]

    first, last = state[2], state[3]
    for perm, (tfirst, tlast) in zip(reversed(perms), reversed(tails)):
        first = jnp.concatenate([first, tfirst])
        last = jnp.concatenate([last, tlast])
        inv = jnp.argsort(perm)
        first, last = first[inv], last[inv]

    # one-sided hits (a degenerate sliver resolved by only one march):
    # symmetrize so the interval is still well-formed
    f2 = jnp.minimum(first, jnp.where(last > -BIG / 2, last, BIG))
    l2 = jnp.maximum(last, jnp.where(first < BIG / 2, first, -BIG))
    any_occ = f2 < BIG / 2
    return any_occ, f2, l2


def sample_baked(rows, xyz, sh_d, B: int, scale: float,
                 interp: str, jitter=None):
    """Evaluate the baked field. sh_d: precomputed sh9_basis(dirs) (N, 9).

    interp="stochastic": jitter = 3-tuple of (N,) uniforms in [0,1) (kept
    per-axis — a materialized (N, 3) tensor tile-pads 3 -> 128 on TPU) —
    one row per sample, trilinear in expectation. interp="trilinear":
    exact 8-row blend.
    """
    u = (xyz + scale) / (2 * scale) * B - 0.5     # voxel-center coordinates

    def fetch(ix, iy, iz):
        ii = jnp.clip(ix, 0, B - 1) * (B * B) + \
            jnp.clip(iy, 0, B - 1) * B + jnp.clip(iz, 0, B - 1)
        f = rows[ii].astype(jnp.float32)          # (N, 32)
        return f

    def decode(f):
        sigma = f[:, 0]
        sh = f[:, 1:28].reshape(-1, 3, N_SH)      # (M, 3, 9)
        if sh_d.shape[0] != f.shape[0]:
            # per-RAY basis for (rays, S)-flattened samples: reshape instead
            # of materializing a repeated (M, 9) basis
            S = f.shape[0] // sh_d.shape[0]
            sh_r = sh.reshape(sh_d.shape[0], S, 3, N_SH)
            rgb = jnp.einsum("nsck,nk->nsc", sh_r, sh_d).reshape(-1, 3)
        else:
            rgb = jnp.einsum("nck,nk->nc", sh, sh_d)
        return sigma, jnp.maximum(rgb, 0.0)

    if interp == "stochastic":
        ids = [jnp.floor(u[:, d] + jitter[d]).astype(jnp.int32)
               for d in range(3)]
        return decode(fetch(ids[0], ids[1], ids[2]))

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
    "B", "scale", "interp", "T_threshold", "n_steps", "samples_per_round",
    "max_rounds", "return_state", "compact", "color_window", "block4",
    "phase_floor", "phase_max", "phase_ratio"))
def render_baked_uniform(rows, aabb_lo, aabb_hi, rays_o, rays_d, key, *,
                         B: int, scale: float, interp: str = "stochastic",
                         T_threshold: float = 1e-2, n_steps: int = 128,
                         samples_per_round: int = 32, init_state=None,
                         max_rounds: int = 0, return_state: bool = False,
                         mip=None, compact: bool = True, sigma=None,
                         color_window: int = 8, block4: bool = False,
                         phase_floor: int = 4096, phase_max: int = 7,
                         phase_ratio: float = 2.0,
                         row_index=None, rows_q=None, t_far=None,
                         mip_dist=None):
    """Uniform-stepping baked render chunk: one compiled program per bucket,
    no host round-trips.

    Sample fetches dominate (one ~6.3 ns gather row per sample); the design
    minimizes ROWS and DISPATCHES:

      * TIGHT occupied-voxel AABB (not the scene cube) kills background
        rays with pure intersection math before any memory access.
      * With `mip` (bake_field builds it): an in-program coarse prelude
        marches the dilated (B/8)^3 max-sigma mip once per ray — ~8x fewer
        rows per unit length than fine sampling — yielding each ray's
        first/last-occupied interval [t_start, t_end]. Rays whose window
        holds no occupied supercell die before a single fine fetch (in-box
        background); survivors start fine marching AT the surface and stop
        at the last occupied supercell, so leading/trailing empty space
        costs coarse rows only. (Round-2's mip-less formulation marched
        empty space at fine rates and needed host-hop survivor compaction
        to stay afloat — the hops cost more than they saved: VERDICT r2.)
      * IN-PROGRAM survivor compaction (compact=True): a marching round
        costs the full bucket's N*S gather rows however few rays remain
        alive, and a frame's cost is rounds x N*S — set by the SLOWEST ray.
        Most rays saturate within a few rounds of their mip-given surface;
        the tail (grazing, semi-transparent) runs many more. So when the
        alive count first fits in N/4 (then N/16) the program reorders rays
        alive-first with a total-order key sort + gathers (no scatter — the
        40-90 ns/row trap, DESIGN.md) and continues the round loop on the
        static N/4 (N/16) prefix: the tail's long marches cost tail-sized
        fetches. The final permutation unwinds with argsort(perm) gathers,
        ~1-2 ms per compaction — vs ~tens of ms per spared full-bucket
        round. (This is the reference's shrinking alive-list economics,
        reference rendering.py:191-233, under XLA static shapes; round 2's
        host-hop variant paid 6.3 MB/bucket-phase over a ~20 MB/s tunnel,
        in-program it's free.)
      * Per-sample stochastic-trilerp jitter comes from the counter-based
        hash RNG (ops/rng.py), not threefry — tens of millions of uniforms
        per frame made jax.random a real cost at this volume.
      * Early ray termination exits saturated rays between rounds
        (composite_test_step), within a fixed shape.

    dt spans the tight box diagonal in n_steps. The 128 default is
    measured: on a converged checkpoint the baked frame loses only
    0.15 dB vs 192 steps (0.35 dB at 96 — bench_runs/ evidence, CPU
    quality sweep) while every fine sigma/color cost scales with the
    step count; the reference's interactive spec is max_samples=100
    (show_gui.py:86-88). State carry mirrors
    render_test_chunk: (t_cur, opacity, depth, rgb, alive, samples_done).
    The coarse prelude and compaction run only when init_state is None
    (fresh rays); state-carrying callers keep the flat loop.

    color_window (v2 fast path, needs `sigma` + interp="stochastic"):
    random row gathers fall off a measured ~128 MB table-size cliff
    (11 -> 38 ns/row, scripts/tpu_table_cliff.py), and the (B^3, 32) row
    table at 256^3 is 2.1 GB — so a round's dominant cost was S big-table
    rows per ray for samples that are mostly empty or occluded. The split
    path fetches ONLY SIGMA for all S samples from the 67 MB (B^3,) table
    (narrow gathers hold ~8.3 ns/row at any size), computes the exact
    compositing weights (opacity/depth/alive are bit-identical to the
    unsplit path), and fetches big rows just for a `color_window`-wide
    per-ray window starting at the ray's first weight-carrying sample.
    Weights decay monotonically past a surface, so a window of 8 covers
    the weight support in a 16-sample round except for >8-sample
    semi-transparent spans, whose tail color (not opacity) is dropped —
    bounded by the tail weight itself (tested vs the exact path).
    color_window=0 disables the split (exact reference semantics).
    """
    from .ops.rng import hash_uniform3
    N = rays_o.shape[0]
    use_split = (color_window > 0 and sigma is not None
                 and interp == "stochastic")
    # normalize directions INTERNALLY: every spacing guarantee below
    # (mip-prelude stride vs supercell width, block divergence, margin
    # slack) is stated in world units, but production callers pass
    # unnormalized pinhole dirs (|d| up to ~1.16 at a 45deg-fov corner),
    # which would stretch coarse-sample spacing past the dilated-footprint
    # bound. Internal t is world distance; output depth is converted back
    # to the caller's ray parameterization at the end.
    dn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True).clip(1e-12)
    rays_d = rays_d / dn
    hits = ray_aabb_intersect_single(rays_o, rays_d, (aabb_lo + aabb_hi) / 2,
                                     (aabb_hi - aabb_lo) / 2)
    t1 = jnp.maximum(hits[:, 0], 0.0)
    t2 = hits[:, 1]
    if t_far is not None:
        # per-ray far clamp in the CALLER's ray parameterization (the AR
        # dirty-rect recomposite clamps the scene march at the inserted
        # mesh's depth — reference rendering.py:38-44; scene_hits has the
        # same semantics on the network path). 0 = no mesh at this pixel.
        tf = t_far * dn[:, 0]                          # -> world distance
        t2 = jnp.where(t_far >= 1e-6,
                       jnp.maximum(jnp.minimum(t2, tf), t1), t2)
    dt = jnp.linalg.norm(aabb_hi - aabb_lo) / n_steps
    S = samples_per_round
    seed = jax.random.bits(key, dtype=jnp.uint32)

    sh_d = sh9_basis(rays_d)                                  # (N, 9)

    t_end = t2
    if (mip is not None or mip_dist is not None) and init_state is None:
        F = MIP_FACTOR
        Bc = -(-B // F)
        w_c = F * 2 * scale / B                    # supercell world width
        # Prelude row-count reductions (both provably conservative under
        # the mip's 1-supercell dilation; the slack budget is 1 supercell
        # of Chebyshev distance between a fine-occupied ray point and the
        # nearest tested coarse sample):
        #  * block4: rays arrive in 2x2 PIXEL blocks (cull_and_buckets
        #    img_wh) and only each block's first ray marches the mip at
        #    1-supercell spacing — in-block ray divergence is <= ~0.2
        #    supercell at any in-scene depth (800px, 45deg fov), leaving
        #    0.5 (half-spacing) + 0.2 + jitter < 1. 4x fewer coarse rows.
        #  * otherwise: STRIDE-2 sampling — half-spacing slack is 1.0
        #    supercell exactly, the dilated footprint of any occupied
        #    supercell spans >= 2 w_c of ray parameter. 2x fewer rows.
        if block4:
            roc = rays_o[0::4]
            rdc = rays_d[0::4]
            # block t-range = union of the HITTING members: ray 0 can MISS
            # the AABB while a sibling hits (blocks straddling the AABB
            # silhouette survive culling if ANY member hits). Marching
            # ray 0's line over that union stays conservative: clipped
            # coarse samples land within the <=0.2-supercell divergence of
            # the hitting member, inside the mip's 1-supercell dilation.
            # Members that miss must be EXCLUDED from the min: their t1
            # clamps to 0, which would anchor the static Kc-sample window
            # (one box diagonal long) at the camera and let it end before
            # the block's far geometry. All-miss (pad) blocks get an empty
            # inverted range and die in the t_c < t2c mask.
            hit4 = (t2 > t1).reshape(-1, 4)
            t1c = jnp.where(hit4, t1.reshape(-1, 4), 1e30).min(axis=1)
            t2c = jnp.where(hit4, t2.reshape(-1, 4), -1e30).max(axis=1)
            step_c = w_c
        else:
            roc, rdc, t1c, t2c = rays_o, rays_d, t1, t2
            step_c = 2 * w_c
        if mip_dist is not None:
            # distance-stepping prelude (round 4): sphere-trace the mip's
            # Chebyshev distance field forward (first hit) and backward
            # (last hit) with unresolved-ray compaction — empty space costs
            # O(few) probes instead of the fixed-stride Kc (~113 at 256^3).
            # Probe spacing near occupancy is 1 supercell (tighter than the
            # non-block4 ladder's stride 2), so the same margins hold.
            any_occ, first_t, last_t = _prelude_dist(
                mip_dist, roc, rdc, t1c, t2c, B, scale, compact=compact)
            t_start = first_t - 1.5 * w_c
            t_end = last_t + 1.5 * w_c
        else:
            # fixed-stride ladder (kept for BakedFields without mip_dist)
            # static worst-case step count: full-cube diagonal (coarse
            # samples beyond each ray's t2 are masked)
            Kc = int(np.ceil(2 * np.sqrt(3.0) * scale / step_c)) + 2
            t_c = t1c[:, None] + (jnp.arange(Kc) + 0.5) * step_c  # (Nc, Kc)
            occ_parts = []
            for d in range(3):
                p_d = roc[:, d:d + 1] + t_c * rdc[:, d:d + 1]
                f_d = jnp.clip(jnp.floor((p_d + scale) / (2 * scale) * B),
                               0, B - 1).astype(jnp.int32) // F
                occ_parts.append(f_d)
            cix = (occ_parts[0] * Bc + occ_parts[1]) * Bc + occ_parts[2]
            occ_c = (mip[cix] > 0) & (t_c < t2c[:, None])      # (Nc, Kc)
            any_occ = jnp.any(occ_c, axis=1)
            first_k = jnp.argmax(occ_c, axis=1)
            last_k = Kc - 1 - jnp.argmax(occ_c[:, ::-1], axis=1)
            # margins of 1.5 supercells around the first/last marked sample
            # centers cover the half-spacing/divergence slack + jitter
            t_start = t1c + (first_k + 0.5).astype(jnp.float32) * step_c \
                - 1.5 * w_c
            t_end = t1c + (last_k + 0.5).astype(jnp.float32) * step_c \
                + 1.5 * w_c
        if block4:
            # broadcast the block window to its 4 member rays (absolute t:
            # the rays are near-parallel, so the support interval is shared)
            any_occ = jnp.repeat(any_occ, 4)
            t_start = jnp.repeat(t_start, 4)
            t_end = jnp.repeat(t_end, 4)
        t_start = jnp.maximum(t_start, t1)
        t_end = jnp.minimum(t_end, t2)

    def make_phase(ro_p, rd_p, sh_p, te_p, Np, next_n):
        """Round loop over a static Np-ray prefix; exits when the alive set
        fits the next phase's prefix (next_n > 0) or is done."""
        def cond(carry):
            *_, alive, samples_done, rounds = carry
            n_alive = jnp.sum(alive.astype(jnp.int32))
            go = (n_alive > 0) & (samples_done < n_steps)
            if max_rounds:
                go = go & (rounds < max_rounds)
            if next_n:
                go = go & (n_alive > next_n)
            return go

        def body(carry):
            t_cur, opacity, depth, rgb, alive, samples_done, rounds = carry
            ts = t_cur[:, None] + (jnp.arange(S) + 0.5) * dt   # (Np, S)
            pos = ro_p[:, None, :] + ts[..., None] * rd_p[:, None, :]
            flat_x = pos.reshape(Np * S, 3)
            jitter = None
            if interp == "stochastic":
                ctr = (jnp.uint32(rounds) * jnp.uint32(Np * S)
                       + jnp.arange(Np * S, dtype=jnp.uint32))
                jitter = hash_uniform3(ctr, seed, stream=1)
            in_range = (ts < te_p[:, None]) & alive[:, None]

            if not use_split:
                sig, col = sample_baked(rows, flat_x, sh_p, B, scale,
                                        interp, jitter)
                n_eff = jnp.sum(in_range, axis=1)
                sig = jnp.where(in_range, sig.reshape(Np, S), 0.0)
                deltas = jnp.full((Np, S), dt)
                opacity, depth, rgb, still = composite_test_step(
                    sig, col.reshape(Np, S, 3), deltas, ts, n_eff,
                    opacity, depth, rgb, T_threshold)
                t_cur = jnp.where(alive, t_cur + S * dt, t_cur)
                alive = alive & still & (t_cur < te_p)
                return (t_cur, opacity, depth, rgb, alive,
                        samples_done + S, rounds + 1)

            # ---- split path: narrow sigma fetch -> exact weights -------
            u = (flat_x + scale) / (2 * scale) * B - 0.5
            ids = [jnp.clip(jnp.floor(u[:, d] + jitter[d]).astype(jnp.int32),
                            0, B - 1) for d in range(3)]
            ii = (ids[0] * (B * B) + ids[1] * B + ids[2]).reshape(Np, S)
            sig = jnp.where(in_range, sigma[ii], 0.0)          # (Np, S)
            # weight math == composite_test_step (in_range is the prefix
            # mask composite derives from n_eff)
            sd = sig * dt
            sd_excl = jnp.cumsum(sd, axis=1) - sd
            T_before = (1.0 - opacity)[:, None] * jnp.exp(-sd_excl)
            alpha = 1.0 - jnp.exp(-sd)
            included = (T_before > T_threshold) & in_range
            w = alpha * T_before * included.astype(sig.dtype)  # (Np, S)
            opacity = opacity + jnp.sum(w, axis=1)
            depth = depth + jnp.sum(w * ts, axis=1)

            # ---- big rows only over the per-ray weight support -----------
            # `color_window` stride-adaptive buckets tile [first, last]
            # significant sample (stride = ceil(span / Wc) <= S / Wc): each
            # bucket's weight is an EXACT cumsum difference, its color is
            # the row at the bucket center — so weight mass is preserved
            # for any span and only color is box-averaged at stride > 1
            # (the failure mode of a flat first-Wc window was dropped tail
            # color on soft/grazing spans: 28 dB vs exact).
            Wc = color_window
            sel = w > 1e-4
            any_sel = jnp.any(sel, axis=1)
            start = jnp.argmax(sel, axis=1).astype(jnp.int32)   # (Np,)
            last = (S - 1
                    - jnp.argmax(sel[:, ::-1], axis=1).astype(jnp.int32))
            span = jnp.maximum(last - start + 1, 1)
            stride = (span + Wc - 1) // Wc                      # (Np,)
            k = jnp.arange(Wc, dtype=jnp.int32)[None, :]
            b0 = start[:, None] + k * stride[:, None]           # (Np, Wc)
            b1 = jnp.minimum(b0 + stride[:, None], S)
            slot_ok = (b0 <= last[:, None]) & any_sel[:, None]
            cw = jnp.cumsum(w, axis=1)                          # (Np, S)
            hi_w = jnp.take_along_axis(cw, jnp.clip(b1 - 1, 0, S - 1),
                                       axis=1)
            lo_w = jnp.where(b0 > 0,
                             jnp.take_along_axis(
                                 cw, jnp.clip(b0 - 1, 0, S - 1), axis=1),
                             0.0)
            w_slot = (hi_w - lo_w) * slot_ok.astype(w.dtype)
            jc = jnp.clip(jnp.minimum(b0 + stride[:, None] // 2,
                                      last[:, None]), 0, S - 1)
            ii_sel = jnp.take_along_axis(ii, jc, axis=1)
            if rows_q is not None:
                # quantized occupied-only color path: narrow voxel->compact
                # index gather + one 32 B int8 row (under the gather cliff)
                # instead of a big-table row; empty voxels hit reserved
                # all-zero row 0 (scale bits 0 -> rgb 0, same as the dense
                # table's zero rows).
                rix = row_index[ii_sel.reshape(-1)]
                fq = rows_q[rix]                           # (M, 32) int8
                sc = jax.lax.bitcast_convert_type(
                    fq[:, N_CH - 4:], jnp.float32)         # (M,)
                sh = (fq[:, :27].astype(jnp.float32) * sc[:, None]) \
                    .reshape(Np, Wc, 3, N_SH)
            else:
                f = rows[ii_sel.reshape(-1)].astype(jnp.float32) \
                    .reshape(Np, Wc, N_CH)
                sh = f[:, :, 1:28].reshape(Np, Wc, 3, N_SH)
            rgb_sel = jnp.maximum(
                jnp.einsum("nwck,nk->nwc", sh, sh_p), 0.0)
            rgb = rgb + jnp.sum(w_slot[..., None] * rgb_sel, axis=1)

            still = (1.0 - opacity) > T_threshold
            t_cur = jnp.where(alive, t_cur + S * dt, t_cur)
            alive = alive & still & (t_cur < te_p)
            return (t_cur, opacity, depth, rgb, alive,
                    samples_done + S, rounds + 1)

        return cond, body

    if init_state is None:
        alive0 = (hits[:, 0] > -0.5) & (t2 > t1)
        if mip is not None or mip_dist is not None:
            alive0 = alive0 & any_occ
            t0v = jnp.where(alive0, t_start, t2 + 1.0)
        else:
            t0v = t1
        state = (t0v, jnp.zeros(N), jnp.zeros(N), jnp.zeros((N, 3)),
                 alive0, jnp.int32(0))
    else:
        state = init_state
    n_prelude_alive = jnp.sum(state[4].astype(jnp.int32))

    # phase sizes: full bucket then halving prefixes — each phase exits as
    # soon as the alive set fits the next half, so a round never runs more
    # than 2x wider than its alive set (skip compaction for small buckets /
    # state-carrying callers whose state shape must persist). A compaction
    # costs an argsort + gathers (~1-2 ms); a spared full-width round costs
    # tens of ms (frame anatomy, DESIGN.md).
    # phase ladder: alive-first prefixes shrinking by phase_ratio. A phase
    # exits as soon as its alive set fits the NEXT prefix, so a finer
    # ratio (e.g. 1.4) lets mostly-dead rounds stop paying full width at
    # ~70% alive instead of 50% — each extra phase costs one argsort
    # compaction (~1-2 ms) + compile time; a spared wide round costs tens
    # of ms of fine-gather rows (frame anatomy, DESIGN.md round 4).
    sizes = [N]
    if compact and init_state is None and not return_state:
        while len(sizes) < phase_max:
            nxt = max(phase_floor,
                      (int(sizes[-1] / phase_ratio) + 255) // 256 * 256)
            if nxt >= sizes[-1]:
                break
            sizes.append(nxt)

    ro_p, rd_p, sh_p, te_p = rays_o, rays_d, sh_d, t_end
    carry = (*state[:5], state[5], jnp.int32(0))
    perms, tails = [], []
    phase_rounds, phase_alive = [], []   # frame-anatomy counters
    for pi, Np in enumerate(sizes):
        next_n = sizes[pi + 1] if pi + 1 < len(sizes) else 0
        cond, body = make_phase(ro_p, rd_p, sh_p, te_p, Np, next_n)
        carry = jax.lax.while_loop(cond, body, carry)
        phase_rounds.append(carry[6])
        phase_alive.append(jnp.sum(carry[4].astype(jnp.int32)))
        if next_n:
            t_cur, opacity, depth, rgb, alive, sd, rn = carry
            # alive-first total-order key (strict order: no stable-sort
            # dependence); gathers only
            perm = jnp.argsort(
                jnp.where(alive, 0, Np) + jnp.arange(Np, dtype=jnp.int32))
            t_cur, opacity, depth = t_cur[perm], opacity[perm], depth[perm]
            rgb, alive = rgb[perm], alive[perm]
            ro_p, rd_p = ro_p[perm], rd_p[perm]
            sh_p, te_p = sh_p[perm], te_p[perm]
            perms.append(perm)
            tails.append((t_cur[next_n:], opacity[next_n:], depth[next_n:],
                          rgb[next_n:], alive[next_n:]))
            carry = (t_cur[:next_n], opacity[:next_n], depth[:next_n],
                     rgb[:next_n], alive[:next_n], sd, rn)
            ro_p, rd_p = ro_p[:next_n], rd_p[:next_n]
            sh_p, te_p = sh_p[:next_n], te_p[:next_n]

    t_cur, opacity, depth, rgb, alive, samples_done, rounds = carry
    # unwind compactions: concat the parked tail back, invert the perm
    for perm, tail in zip(reversed(perms), reversed(tails)):
        t_cur = jnp.concatenate([t_cur, tail[0]])
        opacity = jnp.concatenate([opacity, tail[1]])
        depth = jnp.concatenate([depth, tail[2]])
        rgb = jnp.concatenate([rgb, tail[3]])
        alive = jnp.concatenate([alive, tail[4]])
        inv = jnp.argsort(perm)
        t_cur, opacity, depth = t_cur[inv], opacity[inv], depth[inv]
        rgb, alive = rgb[inv], alive[inv]

    # depth back to the caller's (possibly unnormalized) parameterization
    out = {"opacity": opacity, "depth": depth / dn[:, 0], "rgb": rgb,
           # frame-anatomy counters (scalars; ~free to carry):
           # rounds executed and rays admitted by the coarse prelude, plus
           # the CUMULATIVE round count and alive count at each phase exit
           # (phase sizes are `sizes`) — the row-count model in DESIGN.md is
           # sum_p (rounds_p - rounds_{p-1}) * sizes_p * S
           "rounds": rounds,
           "n_prelude_alive": n_prelude_alive,
           "phase_rounds": jnp.stack(phase_rounds),
           "phase_alive": jnp.stack(phase_alive),
           "phase_sizes": jnp.asarray(sizes, jnp.int32)}
    if return_state:
        out["state"] = (t_cur, opacity, depth, rgb, alive, samples_done)
    return out


def _brick_extract(codes, off, method: str = "wheresum"):
    """Per-row lane extraction: codes (R, 512) uint8, off (R, K) int32 in
    [0, 512) -> (R, K) int32 code values.

    The gathered brick rows live in registers/VMEM-adjacent layouts; a
    second HBM row-gather per sample would re-pay the ~8-24 ns/row issue
    cost this whole design exists to avoid, so extraction is a masked
    reduce over the 512 lanes (chip-measured ~1.6 ns marginal per
    extracted value, scripts/tpu_brick_probe.py). "wheresum" fuses one
    (R, K, 512) compare+select into a single reduce; "unroll" issues K
    fused (R, 512) reduces (smaller live intermediate)."""
    c = codes.astype(jnp.int32)
    F3 = codes.shape[-1]
    if method == "unroll":
        io = jax.lax.broadcasted_iota(jnp.int32, (1, F3), 1)
        cols = [jnp.sum(jnp.where(off[:, k:k + 1] == io, c, 0), axis=1)
                for k in range(off.shape[1])]
        return jnp.stack(cols, axis=1)
    io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, F3), 2)
    return jnp.sum(jnp.where(off[:, :, None] == io, c[:, None, :], 0),
                   axis=-1)


@partial(jax.jit, static_argnames=(
    "B", "scale", "dt", "K", "T_threshold", "max_rounds", "color_window",
    "compact", "block4", "phase_floor", "phase_max", "phase_ratio",
    "dist_skip"))
def render_baked_bricks(bricks, rows, row_index, rows_q, mip,
                        aabb_lo, aabb_hi, rays_o, rays_d, key, *,
                        B: int, scale: float, dt: float, K: int,
                        T_threshold: float = 1e-2, max_rounds: int = 512,
                        color_window: int = 8, compact: bool = True,
                        block4: bool = False, phase_floor: int = 4096,
                        phase_max: int = 7, phase_ratio: float = 2.0,
                        t_far=None, dist_skip: bool = True):
    """Brick-marching baked render chunk (round 5's interactive path).

    Where render_baked_uniform pays one HBM gather ROW per SAMPLE (the
    row-issue floor that capped the slab scene at ~1 FPS — DESIGN.md
    round-4 survivor forensics), this renderer fetches one 512 B
    `sigma_bricks` row per brick-CROSSING (~9.4 voxels of chord) and
    evaluates every ladder sample inside the brick from the gathered
    lanes (VPU masked reduce, `_brick_extract`). Row count becomes
    path-length / brick-chord — independent of the quadrature step, so
    finer dt costs only cheap lane extractions. Chip evidence:
    scripts/tpu_brick_probe.py (512 B rows gather at 1-row cost;
    extraction ~1.6 ns/value marginal).

    Color rides OPACITY-QUANTILE buckets accumulated during the march:
    sample k with global transmittance T_before lands in bucket
    floor((1 - T_before) * Wc); each bucket carries exact weight mass
    (sum of w) and its weight-averaged depth. After the march, ONE
    batched fetch colors each bucket at the voxel under its mean depth —
    color granularity adapts to absorption (each bucket covers ~1/Wc of
    the ray's opacity) instead of to t-span, and the per-round color
    multiplier of the v2 split path disappears entirely (the VERDICT r4
    "two-pass / whole-ray color" ask, realized as carried bucket sums so
    no second sigma march is needed).

    Opacity/depth stay per-sample exact (same weight math as
    composite_test_step / the split path); only color is bucket-averaged
    — the same approximation class as the split path's stride buckets,
    pinned vs the oracle by tests/test_baked_bricks.py.

    Static `dt`/`K`: the ladder step is a compile-time float (host
    computes it from the tight AABB; one compile per bake) and
    K = ceil(brick diagonal / dt) + 1 bounds the samples one brick can
    hold. Single-cascade, stochastic-jitter only (the interactive spec).
    """
    from .ops.rng import hash_uniform3
    N = rays_o.shape[0]
    Wc = color_window
    F = BRICK
    Bb = -(-B // F)
    # empty-space skip available iff the table carries the dist lane
    has_dist = bool(dist_skip) and int(bricks.shape[1]) > F ** 3
    vox = 2.0 * scale / B
    dn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True).clip(1e-12)
    rays_d = rays_d / dn
    hits = ray_aabb_intersect_single(rays_o, rays_d,
                                     (aabb_lo + aabb_hi) / 2,
                                     (aabb_hi - aabb_lo) / 2)
    t1 = jnp.maximum(hits[:, 0], 0.0)
    t2 = hits[:, 1]
    if t_far is not None:
        tf = t_far * dn[:, 0]
        t2 = jnp.where(t_far >= 1e-6,
                       jnp.maximum(jnp.minimum(t2, tf), t1), t2)
    seed = jax.random.bits(key, dtype=jnp.uint32)

    # ---- coarse mip prelude (stride ladder; logic mirrors
    # render_baked_uniform's block4/stride-2 variant — same margins) ----
    Bc = -(-B // MIP_FACTOR)
    w_c = MIP_FACTOR * 2 * scale / B
    if block4:
        roc, rdc = rays_o[0::4], rays_d[0::4]
        hit4 = (t2 > t1).reshape(-1, 4)
        t1c = jnp.where(hit4, t1.reshape(-1, 4), 1e30).min(axis=1)
        t2c = jnp.where(hit4, t2.reshape(-1, 4), -1e30).max(axis=1)
        step_c = w_c
    else:
        roc, rdc, t1c, t2c = rays_o, rays_d, t1, t2
        step_c = 2 * w_c
    Kc = int(np.ceil(2 * np.sqrt(3.0) * scale / step_c)) + 2
    t_c = t1c[:, None] + (jnp.arange(Kc) + 0.5) * step_c
    occ_parts = []
    for d in range(3):
        p_d = roc[:, d:d + 1] + t_c * rdc[:, d:d + 1]
        f_d = jnp.clip(jnp.floor((p_d + scale) / (2 * scale) * B),
                       0, B - 1).astype(jnp.int32) // MIP_FACTOR
        occ_parts.append(f_d)
    cix = (occ_parts[0] * Bc + occ_parts[1]) * Bc + occ_parts[2]
    occ_c = (mip[cix] > 0) & (t_c < t2c[:, None])
    any_occ = jnp.any(occ_c, axis=1)
    first_k = jnp.argmax(occ_c, axis=1)
    last_k = Kc - 1 - jnp.argmax(occ_c[:, ::-1], axis=1)
    t_start = t1c + (first_k + 0.5).astype(jnp.float32) * step_c - 1.5 * w_c
    t_end = t1c + (last_k + 0.5).astype(jnp.float32) * step_c + 1.5 * w_c
    if block4:
        any_occ = jnp.repeat(any_occ, 4)
        t_start = jnp.repeat(t_start, 4)
        t_end = jnp.repeat(t_end, 4)
    t_start = jnp.maximum(t_start, t1)
    t_end = jnp.minimum(t_end, t2)

    alive0 = (hits[:, 0] > -0.5) & (t2 > t1) & any_occ
    # t_cur carries the NEXT unconsumed sample CENTER
    t0v = jnp.where(alive0, t_start + 0.5 * dt, t2 + 1.0)
    n_prelude_alive = jnp.sum(alive0.astype(jnp.int32))

    def make_phase(ro_p, rd_p, te_p, Np, next_n):
        def cond(carry):
            *_, alive, rounds = carry
            n_alive = jnp.sum(alive.astype(jnp.int32))
            go = (n_alive > 0) & (rounds < max_rounds)
            if next_n:
                go = go & (n_alive > next_n)
            return go

        def body(carry):
            t_cur, opacity, depth, bw, bwt, alive, rounds = carry
            pos0 = ro_p + t_cur[:, None] * rd_p                  # (Np, 3)
            v0 = jnp.clip(jnp.floor((pos0 + scale) / (2 * scale) * B),
                          0, B - 1).astype(jnp.int32)            # (Np, 3)
            bidx = v0 // F                                       # (Np, 3)
            bid = (bidx[:, 0] * Bb + bidx[:, 1]) * Bb + bidx[:, 2]
            codes = bricks[bid]                                  # (Np, 512)
            # brick exit along the ray (far slab per axis)
            blo = bidx.astype(jnp.float32) * (F * vox) - scale
            bhi = blo + F * vox
            far = jnp.where(rd_p > 0, bhi, blo)
            tax = jnp.where(jnp.abs(rd_p) > 1e-9,
                            (far - ro_p) / rd_p, jnp.inf)
            t_exit = jnp.min(tax, axis=1)                        # (Np,)
            if has_dist:
                # empty-space skip (round 5): lane 512 carries the brick's
                # Chebyshev distance to the nearest dilated-occupied
                # supercell. d >= 1 proves every brick within max-norm
                # radius d-1 empty, so the ray exits the expanded box in
                # ONE round instead of one round per crossed brick. The
                # advance stays a multiple of dt (ladder alignment and
                # the integral are unchanged — skipped samples all carry
                # sigma 0); only the per-sample jitter draws differ.
                d_sk = codes[:, F ** 3].astype(jnp.float32)      # (Np,)
                ex = jnp.maximum(d_sk - 1.0, 0.0)[:, None] * (F * vox)
                far2 = jnp.where(rd_p > 0, bhi + ex, blo - ex)
                tax2 = jnp.where(jnp.abs(rd_p) > 1e-9,
                                 (far2 - ro_p) / rd_p, jnp.inf)
                t_exit = jnp.where(d_sk >= 1.0,
                                   jnp.min(tax2, axis=1), t_exit)
            n_adv = jnp.maximum(jnp.ceil((t_exit - t_cur) / dt)
                                .astype(jnp.int32), 1)
            n_in = jnp.minimum(n_adv, K)
            # Advance is CLIPPED to the K evaluated samples: K is sized to
            # the brick EDGE (brick_render_args), so a diagonal-ish
            # crossing needs ceil(chord/dt) > K samples and the loop must
            # RE-ENTER the same brick next round for the rest — an
            # unclipped advance here silently dropped up to ~44% of the
            # samples of such crossings (r5 regression: probe SH 19% dark,
            # caught by test_generate_probe_baked_matches_network). The
            # ONE exact exception: d >= 1 proves every brick the advance
            # spans empty (sigma 0 everywhere), so the skip may overshoot
            # K — skipped samples contribute exactly nothing.
            if has_dist:
                n_step = jnp.where(d_sk >= 1.0, n_adv, n_in)
            else:
                n_step = n_in
            ks = jnp.arange(K, dtype=jnp.int32)[None, :]
            ts = t_cur[:, None] + ks.astype(jnp.float32) * dt    # (Np, K)
            in_range = (ks < n_in[:, None]) & (ts < te_p[:, None]) \
                & alive[:, None]
            ctr = (jnp.uint32(rounds) * jnp.uint32(Np * K)
                   + jnp.arange(Np * K, dtype=jnp.uint32))
            jit3 = hash_uniform3(ctr, seed, stream=1)
            pos = ro_p[:, None, :] + ts[..., None] * rd_p[:, None, :]
            u = (pos + scale) / (2 * scale) * B - 0.5            # (Np,K,3)
            offs = []
            for d in range(3):
                idd = jnp.floor(u[..., d]
                                + jit3[d].reshape(Np, K)).astype(jnp.int32)
                # stochastic corner clamped INTO the gathered brick (the
                # jitter can cross a brick face; clamping biases <= half a
                # voxel at faces — pinned vs oracle by the brick tests)
                idd = jnp.clip(idd, bidx[:, d:d + 1] * F,
                               bidx[:, d:d + 1] * F + F - 1)
                offs.append(idd - bidx[:, d:d + 1] * F)
            off = (offs[0] * F + offs[1]) * F + offs[2]          # (Np, K)
            sig = sigma_decode(_brick_extract(codes[:, :F ** 3], off))
            sig = jnp.where(in_range, sig, 0.0)
            sd = sig * dt
            sd_excl = jnp.cumsum(sd, axis=1) - sd
            T_before = (1.0 - opacity)[:, None] * jnp.exp(-sd_excl)
            alpha = 1.0 - jnp.exp(-sd)
            included = (T_before > T_threshold) & in_range
            w = alpha * T_before * included.astype(sig.dtype)    # (Np, K)
            opacity = opacity + jnp.sum(w, axis=1)
            depth = depth + jnp.sum(w * ts, axis=1)
            # opacity-quantile bucket accumulation
            b_k = jnp.clip((((1.0 - T_before) * Wc).astype(jnp.int32)),
                           0, Wc - 1)                            # (Np, K)
            ob = b_k[:, :, None] == jnp.arange(Wc,
                                               dtype=jnp.int32)[None, None]
            bw = bw + jnp.sum(w[:, :, None] * ob, axis=1)        # (Np, Wc)
            bwt = bwt + jnp.sum((w * ts)[:, :, None] * ob, axis=1)
            t_cur = jnp.where(alive,
                              t_cur + n_step.astype(jnp.float32) * dt,
                              t_cur)
            alive = alive & ((1.0 - opacity) > T_threshold) \
                & (t_cur < te_p)
            return (t_cur, opacity, depth, bw, bwt, alive, rounds + 1)

        return cond, body

    carry = (t0v, jnp.zeros(N), jnp.zeros(N), jnp.zeros((N, Wc)),
             jnp.zeros((N, Wc)), alive0, jnp.int32(0))

    sizes = [N]
    if compact:
        while len(sizes) < phase_max:
            nxt = max(phase_floor,
                      (int(sizes[-1] / phase_ratio) + 255) // 256 * 256)
            if nxt >= sizes[-1]:
                break
            sizes.append(nxt)

    ro_p, rd_p, te_p = rays_o, rays_d, t_end
    perms, tails = [], []
    phase_rounds, phase_alive = [], []
    for pi, Np in enumerate(sizes):
        next_n = sizes[pi + 1] if pi + 1 < len(sizes) else 0
        cond, body = make_phase(ro_p, rd_p, te_p, Np, next_n)
        carry = jax.lax.while_loop(cond, body, carry)
        phase_rounds.append(carry[6])
        phase_alive.append(jnp.sum(carry[5].astype(jnp.int32)))
        if next_n:
            t_cur, opacity, depth, bw, bwt, alive, rn = carry
            perm = jnp.argsort(
                jnp.where(alive, 0, Np) + jnp.arange(Np, dtype=jnp.int32))
            t_cur, opacity, depth = t_cur[perm], opacity[perm], depth[perm]
            bw, bwt, alive = bw[perm], bwt[perm], alive[perm]
            ro_p, rd_p, te_p = ro_p[perm], rd_p[perm], te_p[perm]
            perms.append(perm)
            tails.append((t_cur[next_n:], opacity[next_n:], depth[next_n:],
                          bw[next_n:], bwt[next_n:], alive[next_n:]))
            carry = (t_cur[:next_n], opacity[:next_n], depth[:next_n],
                     bw[:next_n], bwt[:next_n], alive[:next_n], rn)
            ro_p, rd_p, te_p = ro_p[:next_n], rd_p[:next_n], te_p[:next_n]

    t_cur, opacity, depth, bw, bwt, alive, rounds = carry
    for perm, tail in zip(reversed(perms), reversed(tails)):
        t_cur = jnp.concatenate([t_cur, tail[0]])
        opacity = jnp.concatenate([opacity, tail[1]])
        depth = jnp.concatenate([depth, tail[2]])
        bw = jnp.concatenate([bw, tail[3]])
        bwt = jnp.concatenate([bwt, tail[4]])
        alive = jnp.concatenate([alive, tail[5]])
        inv = jnp.argsort(perm)
        t_cur, opacity, depth = t_cur[inv], opacity[inv], depth[inv]
        bw, bwt, alive = bw[inv], bwt[inv], alive[inv]

    # ---- whole-ray color pass: one batched fetch per bucket -------------
    sh_d = sh9_basis(rays_d)                                     # (N, 9)
    t_b = bwt / jnp.maximum(bw, 1e-12)                           # (N, Wc)
    ok_b = bw > 1e-4
    pos_b = rays_o[:, None, :] + t_b[..., None] * rays_d[:, None, :]
    ub = (pos_b + scale) / (2 * scale) * B - 0.5
    vb = jnp.clip(jnp.floor(ub + 0.5), 0, B - 1).astype(jnp.int32)
    vid = ((vb[..., 0] * B + vb[..., 1]) * B + vb[..., 2]).reshape(-1)
    vid = jnp.where(ok_b.reshape(-1), vid, 0)
    if rows_q is not None:
        rix = row_index[vid]
        fq = rows_q[rix]                                   # (N*Wc, 32) int8
        sc = jax.lax.bitcast_convert_type(fq[:, N_CH - 4:], jnp.float32)
        sh = (fq[:, :27].astype(jnp.float32) * sc[:, None]) \
            .reshape(N, Wc, 3, N_SH)
    else:
        f = rows[vid].astype(jnp.float32).reshape(N, Wc, N_CH)
        sh = f[:, :, 1:28].reshape(N, Wc, 3, N_SH)
    rgb_b = jnp.maximum(jnp.einsum("nwck,nk->nwc", sh, sh_d), 0.0)
    w_eff = jnp.where(ok_b, bw, 0.0)
    rgb = jnp.sum(w_eff[..., None] * rgb_b, axis=1)

    return {"opacity": opacity, "depth": depth / dn[:, 0], "rgb": rgb,
            "rounds": rounds, "n_prelude_alive": n_prelude_alive,
            "phase_rounds": jnp.stack(phase_rounds),
            "phase_alive": jnp.stack(phase_alive),
            "phase_sizes": jnp.asarray(sizes, jnp.int32)}


def brick_render_args(baked: BakedField, n_steps: int = 128):
    """Host-side static args for render_baked_bricks: the ladder step from
    the tight AABB (rounded for compile-cache stability) and the per-brick
    sample-slot bound K = ceil(brick diagonal / dt) + 1."""
    lo = np.asarray(baked.aabb_lo, np.float64)
    hi = np.asarray(baked.aabb_hi, np.float64)
    dt = float(np.linalg.norm(hi - lo)) / n_steps
    dt = float(np.format_float_positional(dt, precision=4, unique=False,
                                          fractional=False))
    vox = 2.0 * baked.scale / baked.resolution
    K = int(np.clip(np.ceil(BRICK * np.sqrt(3.0) * vox / dt) + 1, 2, 24))
    return dt, K


def cull_and_buckets(baked: BakedField, rays_o, rays_d, chunk: int = 1 << 18,
                     img_wh=None):
    """Host-side tight-AABB cull + power-of-two bucketing.

    Returns (buckets, N, blocked) where each bucket is (sl, ro, rd, n): sl the
    original ray indices (np), ro/rd the padded device arrays, n the valid
    count. Shared by render_baked (which composes a frame with per-bucket
    readbacks) and by device-side FPS timing (which dispatches buckets and
    syncs one scalar — the tunnel readback is an axon artifact, not part of
    the renderer).

    img_wh = (W, H) with even W, H and row-major rays: cull and bucket in
    2x2 PIXEL blocks (a block survives if any member hits), emitting rays
    block-grouped — 4 consecutive slots per block — which enables the
    renderer's quarter-res mip prelude (block4=True: only each block's
    first ray marches the coarse grid). Pad blocks start far outside the
    AABB, so the prelude kills them whole."""
    from .rendering import _pow2_bucket
    N = rays_o.shape[0]
    ro_np = np.asarray(rays_o, np.float32)
    rd_np = np.asarray(rays_d, np.float32)
    lo = np.asarray(baked.aabb_lo)
    hi = np.asarray(baked.aabb_hi)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / rd_np
    ta = (lo[None, :] - ro_np) * inv
    tb = (hi[None, :] - ro_np) * inv
    t1 = np.maximum(np.minimum(ta, tb).max(axis=1), 0.0)
    t2 = np.maximum(ta, tb).min(axis=1)
    hit = t2 > t1
    blocked = False
    if img_wh is not None:
        W, H = img_wh
        if W * H == N and W % 2 == 0 and H % 2 == 0:
            blk = (np.arange(N).reshape(H // 2, 2, W // 2, 2)
                   .transpose(0, 2, 1, 3).reshape(-1, 4))      # (Nb, 4)
            idx0 = blk[hit[blk].any(axis=1)].reshape(-1)
            blocked = True
    if not blocked:
        idx0 = np.where(hit)[0]
    buckets = []
    M = len(idx0)
    if M:
        bucket = min(chunk, _pow2_bucket(M, 4096))
        for i in range(0, M, bucket):
            n = min(bucket, M - i)
            pad = bucket - n
            sl = idx0[i:i + n]
            # pad rays START far outside the AABB pointing away: the
            # prelude kills them for free and their rgb stays exactly 0
            # (a 0-origin pad sits INSIDE the object and composites color)
            ro = jnp.asarray(np.concatenate(
                [ro_np[sl], np.full((pad, 3), 1e6, np.float32)]))
            rd = jnp.asarray(np.concatenate(
                [rd_np[sl], np.ones((pad, 3), np.float32)]))
            buckets.append((sl, ro, rd, n))
    return buckets, N, blocked


def render_baked(baked: BakedField, grid_state, rays_o, rays_d, cfg, *,
                 key=None, interp: str = "stochastic",
                 T_threshold: float = 1e-2, n_steps: int = 128,
                 samples_per_round: int = 16, chunk: int = 1 << 18,
                 phase1_rounds: int = 0, max_samples=None, prehit=None,
                 dt_scale=None, exp_step_factor: float = 0.0,
                 stats: dict = None, color_window: int = 8, img_wh=None,
                 mesh_depth_map=None, dist_prelude: bool = False,
                 bricks: bool = True, display: bool = False,
                 white_bg: float = 1.0):
    """Full-frame baked render.

    bricks=True (default) routes single-cascade stochastic renders with a
    split color window through render_baked_bricks when the field carries
    a `sigma_bricks` table — the round-5 brick-marching path (one 512 B
    row per brick crossing instead of one row per sample; whole-ray
    opacity-quantile color buckets). Other configurations (trilinear,
    color_window=0, multi-cascade, old checkpoints) keep their paths.

    dist_prelude=False: the single-cascade sphere-traced distance prelude
    measured SLOWER than the vectorized stride-ladder mip prelude on the
    chip (object scene 3.21 vs 5.67 FPS, bench_runs/r4_knobs_object.log
    "mip_dist off" row — the while-loop's ~100 serial probe rounds lose
    to ONE (N, Kc) batch gather; same lesson as the sort-selection
    marcher, in reverse). Kept as an opt-in for scenes with very long
    empty approaches; multi-cascade scenes DO use the distance field
    (their alternative was no prelude at all).

    Host-side work is pure math + one output readback: rays are culled
    against the TIGHT occupied-voxel AABB in numpy (background dies with
    zero device traffic), the hitters run through render_baked_uniform in
    power-of-two buckets — ONE dispatch each, with the coarse-mip prelude
    and the full round loop inside the program. Round 2's host survivor-
    compaction phases (state readback + re-upload per phase) cost more
    than the dead-ray fetches they saved once the mip prelude existed:
    6.3 MB of state per bucket-phase over a ~20 MB/s link dwarfed the
    ~40 ms of device gathers in a phase. `phase1_rounds` is kept for
    call-compat and ignored.

    grid_state/cfg are accepted for signature-compat with render_test;
    marching structures are not used (see render_baked_uniform).
    max_samples/prehit/dt_scale are accepted and ignored for the same
    reason. Pass a dict as `stats` to receive the frame anatomy
    (rays/buckets/rounds/row counts — DESIGN.md's accounting).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    N = rays_o.shape[0]
    opacity = np.zeros(N, np.float32)
    depth = np.zeros(N, np.float32)
    if display:
        # display mode (round 5, VERDICT r4 #6): the e2e frame cost is
        # dominated by the ~20 MB/s tunnel readback (13 MB of f32 for an
        # 800x800 frame), not renderer work. A GUI consumes a u8 image,
        # so pack it ON DEVICE — background blend + clip + u8 rgb, f16
        # opacity/depth — one tiny jitted dispatch per bucket, ~5x fewer
        # readback bytes.
        rgb8 = np.zeros((N, 3), np.uint8)
        rgb8[:] = int(np.clip(white_bg, 0, 1) * 255 + 0.5)  # bg for misses
        pack = jax.jit(lambda r, o, d: (
            (jnp.clip(r + white_bg * (1.0 - o)[:, None], 0.0, 1.0)
             * 255 + 0.5).astype(jnp.uint8),
            o.astype(jnp.float16), d.astype(jnp.float16)))
    else:
        rgb = np.zeros((N, 3), np.float32)

    buckets, _, blocked = cull_and_buckets(baked, rays_o, rays_d, chunk,
                                           img_wh=img_wh)
    if stats is not None:
        stats.update(n_rays=N,
                     n_aabb_hit=sum(n for *_, n in buckets),
                     bucket=buckets[0][1].shape[0] if buckets else 0,
                     dispatches=len(buckets), rounds=[],
                     n_prelude_alive=[], samples_per_round=samples_per_round)
    # one split for all buckets (per-bucket eager splits are a ~27 ms
    # device dispatch each through the tunnel)
    keys = jax.random.split(key, max(1, len(buckets)))
    mdm_np = (np.asarray(mesh_depth_map, np.float32)
              if mesh_depth_map is not None else None)
    mc = getattr(baked, "cascades", 1) > 1
    use_bricks = (bricks and not mc and interp == "stochastic"
                  and color_window > 0
                  and getattr(baked, "sigma_bricks", None) is not None)
    if use_bricks:
        dt_b, K_b = brick_render_args(baked, n_steps)
    for (sl, ro, rd, n), k in zip(buckets, keys):
        t_far = None
        if mdm_np is not None:
            # pad value 0 = no clamp; pad rays die on the AABB cull anyway
            t_far = jnp.asarray(np.concatenate(
                [mdm_np[sl], np.zeros(ro.shape[0] - n, np.float32)]))
        if use_bricks:
            res = render_baked_bricks(
                baked.sigma_bricks, baked.rows, baked.row_index,
                baked.rows_q, baked.mip, baked.aabb_lo, baked.aabb_hi,
                ro, rd, k, B=baked.resolution, scale=baked.scale,
                dt=dt_b, K=K_b, T_threshold=T_threshold,
                color_window=color_window, block4=blocked, t_far=t_far)
        elif mc:
            res = render_baked_mc_uniform(
                baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, k,
                B=baked.resolution, scale=baked.scale,
                cascades=baked.cascades, T_threshold=T_threshold,
                samples_per_round=samples_per_round, t_far=t_far,
                sigma=baked.sigma, color_window=color_window,
                row_index=baked.row_index, rows_q=baked.rows_q,
                mip_dist=getattr(baked, "mip_dist", None))
        else:
            res = render_baked_uniform(
                baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, k,
                B=baked.resolution, scale=baked.scale, interp=interp,
                T_threshold=T_threshold, n_steps=n_steps,
                samples_per_round=samples_per_round, mip=baked.mip,
                sigma=baked.sigma, color_window=color_window, block4=blocked,
                row_index=baked.row_index, rows_q=baked.rows_q, t_far=t_far,
                mip_dist=(getattr(baked, "mip_dist", None)
                          if dist_prelude else None))
        if display:
            r8, o16, d16 = pack(res["rgb"], res["opacity"], res["depth"])
            rgb8[sl] = np.asarray(r8)[:n]
            opacity[sl] = np.asarray(o16, np.float32)[:n]
            depth[sl] = np.asarray(d16, np.float32)[:n]
        else:
            opacity[sl] = np.asarray(res["opacity"])[:n]
            depth[sl] = np.asarray(res["depth"])[:n]
            rgb[sl] = np.asarray(res["rgb"])[:n]
        if stats is not None:
            stats["rounds"].append(int(res["rounds"]))
            stats["n_prelude_alive"].append(int(res["n_prelude_alive"]))
    if display:
        return {"opacity": jnp.asarray(opacity), "depth": jnp.asarray(depth),
                "rgb_u8": rgb8}
    return {"opacity": jnp.asarray(opacity), "depth": jnp.asarray(depth),
            "rgb": jnp.asarray(rgb)}


def baked_frame_device_fn(baked: BakedField, rays_o, rays_d, *,
                          interp: str = "stochastic",
                          T_threshold: float = 1e-2, n_steps: int = 128,
                          samples_per_round: int = 16, chunk: int = 1 << 18,
                          color_window: int = 8, img_wh=None,
                          dist_prelude: bool = False, bricks: bool = True):
    """Zero-readback frame function for device-side FPS measurement.

    Culling/padding/bucketing happens once here; the returned frame(key)
    dispatches every bucket and one tiny reduce program whose scalar
    output depends on all buckets' rgb — fetching that one scalar drains
    the device queue (utils/sync.py: block_until_ready is a no-op through
    the axon tunnel) without paying the ~20 MB/s frame readback, which is
    a tunnel artifact, not renderer work. All buckets share the frame key:
    the stochastic jitter's hash-RNG counters are bucket-local, so reusing
    the seed across buckets only correlates jitter between distinct rays
    (harmless); per-bucket eager key splits would cost a ~27 ms dispatch
    each."""
    buckets, _, blocked = cull_and_buckets(baked, rays_o, rays_d, chunk,
                                           img_wh=img_wh)
    reduce_fn = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))

    mc = getattr(baked, "cascades", 1) > 1
    use_bricks = (bricks and not mc and interp == "stochastic"
                  and color_window > 0
                  and getattr(baked, "sigma_bricks", None) is not None)
    if use_bricks:
        dt_b, K_b = brick_render_args(baked, n_steps)

    def frame(key):
        outs = []
        for sl, ro, rd, n in buckets:
            if use_bricks:
                res = render_baked_bricks(
                    baked.sigma_bricks, baked.rows, baked.row_index,
                    baked.rows_q, baked.mip, baked.aabb_lo, baked.aabb_hi,
                    ro, rd, key, B=baked.resolution, scale=baked.scale,
                    dt=dt_b, K=K_b, T_threshold=T_threshold,
                    color_window=color_window, block4=blocked)
            elif mc:
                res = render_baked_mc_uniform(
                    baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
                    B=baked.resolution, scale=baked.scale,
                    cascades=baked.cascades, T_threshold=T_threshold,
                    samples_per_round=samples_per_round,
                    sigma=baked.sigma, color_window=color_window,
                    row_index=baked.row_index, rows_q=baked.rows_q,
                    mip_dist=getattr(baked, "mip_dist", None))
            else:
                res = render_baked_uniform(
                    baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
                    B=baked.resolution, scale=baked.scale, interp=interp,
                    T_threshold=T_threshold, n_steps=n_steps,
                    samples_per_round=samples_per_round, mip=baked.mip,
                    sigma=baked.sigma, color_window=color_window,
                    block4=blocked,
                    row_index=baked.row_index, rows_q=baked.rows_q,
                    mip_dist=(getattr(baked, "mip_dist", None)
                              if dist_prelude else None))
            outs.append(res["rgb"])
        return reduce_fn(outs) if outs else jnp.float32(0.0)

    return frame


def baked_frame_display_fn(baked: BakedField, rays_o, rays_d, *,
                           interp: str = "stochastic",
                           T_threshold: float = 1e-2, n_steps: int = 128,
                           samples_per_round: int = 16, chunk: int = 1 << 18,
                           color_window: int = 8, img_wh=None,
                           white_bg: float = 1.0, bricks: bool = True):
    """One-readback end-to-end frame function (VERDICT r4 #6).

    render_baked's frame loop pays THREE host fetches per bucket (rgb +
    opacity + depth, each an np.asarray that BLOCKS — so buckets can't
    even overlap on device) plus numpy assembly; through the ~MB/s axon
    tunnel that is most of the e2e frame (r5 bench: 0.62 e2e vs 1.76
    device FPS). Here the returned frame(key) dispatches every bucket
    ASYNC, then ONE jitted assemble program blends the background, packs
    u8, and gathers the buckets back into pixel order via a precomputed
    inverse index map — the caller fetches exactly one (N, 3) uint8
    image (np.asarray(frame(key))), which is the artifact a GUI consumes.
    Culling/bucketing/index-map setup runs once at closure build."""
    buckets, N, blocked = cull_and_buckets(baked, rays_o, rays_d, chunk,
                                           img_wh=img_wh)
    mc = getattr(baked, "cascades", 1) > 1
    use_bricks = (bricks and not mc and interp == "stochastic"
                  and color_window > 0
                  and getattr(baked, "sigma_bricks", None) is not None)
    if use_bricks:
        dt_b, K_b = brick_render_args(baked, n_steps)

    # pixel -> concatenated-bucket-row map; culled pixels hit the appended
    # zero row (opacity 0 -> pure background after the blend)
    total = sum(int(b[1].shape[0]) for b in buckets)
    inv = np.full((N,), total, np.int32)
    off = 0
    for sl, ro, rd, n in buckets:
        inv[np.asarray(sl)] = off + np.arange(len(np.asarray(sl)),
                                              dtype=np.int32)
        off += int(ro.shape[0])
    inv_d = jnp.asarray(inv)
    bgv = float(np.clip(white_bg, 0.0, 1.0))

    @jax.jit
    def assemble(rgbs, opacs):
        allr = jnp.concatenate(list(rgbs) + [jnp.zeros((1, 3))])
        allo = jnp.concatenate(list(opacs) + [jnp.zeros((1,))])
        rgb = allr[inv_d] + bgv * (1.0 - allo[inv_d])[:, None]
        return (jnp.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    def frame(key):
        rgbs, opacs = [], []
        for sl, ro, rd, n in buckets:
            if use_bricks:
                res = render_baked_bricks(
                    baked.sigma_bricks, baked.rows, baked.row_index,
                    baked.rows_q, baked.mip, baked.aabb_lo, baked.aabb_hi,
                    ro, rd, key, B=baked.resolution, scale=baked.scale,
                    dt=dt_b, K=K_b, T_threshold=T_threshold,
                    color_window=color_window, block4=blocked)
            elif mc:
                res = render_baked_mc_uniform(
                    baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
                    B=baked.resolution, scale=baked.scale,
                    cascades=baked.cascades, T_threshold=T_threshold,
                    samples_per_round=samples_per_round,
                    sigma=baked.sigma, color_window=color_window,
                    row_index=baked.row_index, rows_q=baked.rows_q,
                    mip_dist=getattr(baked, "mip_dist", None))
            else:
                res = render_baked_uniform(
                    baked.rows, baked.aabb_lo, baked.aabb_hi, ro, rd, key,
                    B=baked.resolution, scale=baked.scale, interp=interp,
                    T_threshold=T_threshold, n_steps=n_steps,
                    samples_per_round=samples_per_round, mip=baked.mip,
                    sigma=baked.sigma, color_window=color_window,
                    block4=blocked, row_index=baked.row_index,
                    rows_q=baked.rows_q)
            rgbs.append(res["rgb"])
            opacs.append(res["opacity"])
        if not rgbs:
            return jnp.full((N, 3), int(bgv * 255 + 0.5), jnp.uint8)
        return assemble(tuple(rgbs), tuple(opacs))

    return frame


def bake_ngp(params, grid_state, cfg, resolution: int = 256,
             n_dirs: int = 32, dtype=jnp.float32,
             chunk: int = None, stoch: str = "auto") -> BakedField:
    """Bake a trained NGP (models/ngp.py) into a BakedField.

    Occupancy comes from the trainer's grid (cascade 0); baked voxels are
    the occupied cells' neighborhoods dilated by 1 so trilinear reads at
    occupancy boundaries see real values.

    stoch ("auto" | True | False): evaluate the field with stochastic
    single-corner hash gathers (ops/hashgrid.py) — 8x fewer gather rows,
    the bake's dominant cost at ~6.3 ns/row. Per-direction RNG counters
    give n_dirs independent corner draws per voxel; sigma is averaged over
    them (mean_sigma) and the SH least-squares projection averages the rgb
    draws, so the estimator noise lands at ~1/sqrt(n_dirs) of a single
    draw and disappears under volume integration + pixel averaging.
    "auto" = on except on CPU (where gathers are cheap and tests want the
    exact path). The stochastic path also permits 8x larger chunks under
    the runtime's ~33M-gather-rows-per-program ceiling (DESIGN.md), which
    cuts dispatch count — at a 256^3 bake with ~20% occupancy the exact
    path needs ~900 dispatches at ~30 ms tunnel overhead each.

    Multi-cascade scenes (scale > 0.5, colmap/nerfpp) bake one B^3 grid
    per nested cascade cube from that cascade's occupancy slice
    (bake_field_mc) and render through the correctness-first exponential
    stepper (render_baked_mc_uniform). Round 2 refused them outright
    (ADVICE r2 — outer content was silently dropped before that).
    """
    from .models.ngp import ngp_forward
    use_stoch = stoch is True or (stoch == "auto"
                                  and jax.default_backend() != "cpu")
    if chunk is None:
        # keep chunk * n_dirs * rows-per-sample under the per-program
        # gather ceiling (~33M rows, DESIGN.md): 16 levels x (8 | 1) corners
        rows_per_sample = cfg.hash_cfg.n_levels * (1 if use_stoch else 8)
        chunk = max(1 << 12, (1 << 24) // max(1, n_dirs * rows_per_sample))
    B = resolution
    G = cfg.grid_size

    def resample_dilate(occ_xyz):
        return _resample_dilate(occ_xyz, B, G)

    # occ_flat layout is row-major [mip, x, y, z] (models/ngp.py
    # _cell_coords)
    occ_np = np.asarray(grid_state.occ_flat).reshape(cfg.cascades, G, G, G)
    masks = [resample_dilate(occ_np[c] > 0) for c in range(cfg.cascades)]

    if use_stoch:
        def field_fn(x, dirs, seed):
            return ngp_forward(params, x, dirs, cfg, seed=seed)
    else:
        def field_fn(x, dirs):
            return ngp_forward(params, x, dirs, cfg)

    # chunk * n_dirs field points per program; default keeps the peak
    # intermediate (N, L, 8, 3) index tensor well under the 16 GB HBM
    kw = dict(n_dirs=n_dirs, dtype=dtype, chunk=chunk, seeded=use_stoch,
              mean_sigma=use_stoch)
    if cfg.cascades == 1:
        baked = bake_field(field_fn, cfg.scale, resolution=B,
                           occ_mask=masks[0], **kw)
        # delta-bake snapshots (bake_ngp_delta): what the grid looked
        # like when every voxel was last evaluated
        return baked._replace(
            src_density=np.asarray(grid_state.density_grid, np.float32),
            src_occ=np.asarray(grid_state.occ_flat, np.uint8),
            bake_phase=0, src_mask=np.asarray(masks[0], bool))
    return bake_field_mc(field_fn, cfg.scale, cfg.cascades, resolution=B,
                         occ_masks=masks, **kw)


def _resample_dilate(occ_xyz, B: int, G: int, dilate: bool = True):
    """Occupancy (G, G, G) bool -> bake mask (B^3,) bool: resample to bake
    resolution FIRST, then dilate by one VOXEL (dilating at occupancy-cell
    granularity inflated a carved grid's bake set ~3x per axis — 25% of
    256^3 voxels on a converged scene). dilate=False skips the voxel
    dilation — used for the delta bake's rolling-refresh stripes, where
    dilation would double the stripe's cost without a correctness need
    (the stripe exists for appearance drift, not geometry boundaries)."""
    if B >= G:
        # upsample: nearest-cell map, exact for any B (incl. non-multiples
        # of G — np.repeat assumed B % G == 0 and broke --bake_res 192)
        ci = (np.arange(B) * G) // B
        mask = occ_xyz[np.ix_(ci, ci, ci)]
    else:
        # downsample: conservative any-pool over each voxel's bucket
        bi = (np.arange(G) * B) // G
        mask = np.zeros((B, B, B), bool)
        np.logical_or.at(mask, np.ix_(bi, bi, bi), occ_xyz)
    if not dilate:
        return mask.reshape(-1)
    p = np.pad(mask, 1)
    d = np.zeros_like(mask)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                d |= p[dx:dx + B, dy:dy + B, dz:dz + B]
    return d.reshape(-1)


def bake_ngp_delta(params, grid_state, cfg, prev: BakedField, *,
                   tau: float = 0.05, refresh_k: int = 16,
                   n_dirs: int = 32, dtype=jnp.float32, chunk: int = None,
                   stoch: str = "auto", stats: dict = None,
                   budget_cells: int = 0) -> BakedField:
    """Incremental re-bake of a trained NGP against a previous bake.

    Re-evaluates only voxels whose grid cells (a) moved in EMA density by
    more than `tau` (relative, vs the density snapshot the voxel was last
    baked from), (b) flipped occupancy, or (c) landed in this call's
    rolling-refresh stripe (cell_id % refresh_k == phase) — the stripe
    bounds appearance staleness: EVERY cell re-bakes within `refresh_k`
    delta bakes even if its density never moves (the appearance MLP
    drifts without moving sigma). Snapshots update only for re-baked
    cells, so sub-tau drift accumulates until it crosses tau rather than
    leaking under a ratcheting baseline.

    This is the mid-training preview path (VERDICT r4 #4): the reference
    GUI renders the live field during training (show_gui.py:82-94); here
    a full 256^3 bake costs ~57 s and invalidates on every density-grid
    update, so the preview re-bakes the delta in seconds instead.
    Falls back to a FULL bake_ngp when prev carries no snapshots (old
    checkpoints), resolution changed, or the scene is multi-cascade.

    n_dirs defaults to bake_ngp's: pass the same value as the full bake
    or the refreshed voxels change SH projection quality mid-preview.
    Pass a dict as `stats` to receive the delta accounting."""
    from .models.ngp import ngp_forward
    if (prev is None or getattr(prev, "src_density", None) is None
            or cfg.cascades > 1):
        return bake_ngp(params, grid_state, cfg,
                        resolution=getattr(prev, "resolution", 256),
                        n_dirs=n_dirs, dtype=dtype, chunk=chunk,
                        stoch=stoch)
    B, G = prev.resolution, cfg.grid_size
    dens_new = np.asarray(grid_state.density_grid, np.float32)
    occ_new = np.asarray(grid_state.occ_flat, np.uint8)
    d_old, o_old = prev.src_density, prev.src_occ

    rel = np.abs(dens_new - d_old) / np.maximum(
        np.maximum(np.abs(d_old), np.abs(dens_new)), 1e-2)
    moved = rel > tau
    flipped = occ_new != o_old
    geo_cells = moved.reshape(-1) | flipped
    # bounded-cost preview (budget_cells > 0): MID-training every cell's
    # density genuinely moves each block (EMA decay alone is 5%/update),
    # so the tau test marks ~everything and a "delta" bake degenerates to
    # a full one (chip-measured: 100% of voxels, ~81 s — bench r5). A
    # preview needs bounded COST with bounded STALENESS instead: keep only
    # the `budget_cells` most-moved cells (occupancy flips rank first —
    # rel is +inf there) and leave the rest DIRTY — their snapshots don't
    # advance (see below), so unserved drift re-queues next call by
    # priority, and the rolling-refresh stripe still bounds worst-case
    # staleness at refresh_k calls for appearance-only drift.
    if budget_cells > 0:
        idx = np.nonzero(geo_cells)[0]
        if len(idx) > budget_cells:
            score = np.where(flipped, np.inf, rel.reshape(-1))[idx]
            keep = idx[np.argsort(-score, kind="stable")[:budget_cells]]
            geo_cells = np.zeros_like(geo_cells)
            geo_cells[keep] = True
    phase = (int(prev.bake_phase) + 1) % max(refresh_k, 1)
    cells = geo_cells
    if refresh_k > 0:
        cells = cells | ((np.arange(cells.shape[0]) % refresh_k) == phase)

    mask_new = _resample_dilate(occ_new.reshape(G, G, G) > 0, B, G)
    mask_old = prev.src_mask if getattr(prev, "src_mask", None) is not None \
        else _resample_dilate(o_old.reshape(G, G, G) > 0, B, G)
    # geometry changes dilate (boundary trilinear reads see real values);
    # the refresh stripe does not (appearance drift has no boundary need,
    # and dilation would double the stripe's per-delta cost)
    vox_rebake = _resample_dilate(geo_cells.reshape(G, G, G), B, G)
    if refresh_k > 0:
        stripe = (np.arange(geo_cells.shape[0]) % refresh_k) == phase
        vox_rebake = vox_rebake | _resample_dilate(
            stripe.reshape(G, G, G), B, G, dilate=False)
    changed = mask_new & (vox_rebake | ~mask_old)
    removed_idx = np.nonzero(mask_old & ~mask_new)[0]
    changed_idx = np.nonzero(changed)[0]
    occ_idx_all = np.nonzero(mask_new)[0]
    if stats is not None:
        stats.update(n_changed=len(changed_idx), n_removed=len(removed_idx),
                     n_total=len(occ_idx_all), phase=phase,
                     frac=len(changed_idx) / max(1, len(occ_idx_all)))

    use_stoch = stoch is True or (stoch == "auto"
                                  and jax.default_backend() != "cpu")
    if chunk is None:
        rows_per_sample = cfg.hash_cfg.n_levels * (1 if use_stoch else 8)
        chunk = max(1 << 12, (1 << 24) // max(1, n_dirs * rows_per_sample))
    if use_stoch:
        def field_fn(x, dirs, seed):
            return ngp_forward(params, x, dirs, cfg, seed=seed)
    else:
        def field_fn(x, dirs):
            return ngp_forward(params, x, dirs, cfg)

    baked = bake_field_delta(
        field_fn, cfg.scale, prev, changed_idx, removed_idx=removed_idx,
        occ_idx_all=occ_idx_all, n_dirs=n_dirs, chunk=chunk, dtype=dtype,
        seeded=use_stoch, mean_sigma=use_stoch)
    # snapshots advance ONLY where this bake re-evaluated (cells): the
    # rest keep accumulating drift against their last-baked reference
    return baked._replace(
        src_density=np.where(cells.reshape(d_old.shape), dens_new, d_old),
        src_occ=np.where(cells, occ_new, o_old).astype(np.uint8),
        bake_phase=phase, src_mask=np.asarray(mask_new, bool))
