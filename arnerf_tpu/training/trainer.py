"""Training system: the reference's NeRFSystem (train.py:53-260) as a set of
pure jitted step functions around explicit state.

One `train_step` is a single compiled program containing on-device ray
sampling (image/pixel gathers from device-resident images), pose->ray math,
marching, field eval, compositing, losses, and the Adam update — there is no
host<->device traffic in the hot loop. The density-grid EMA update runs as
its own jitted program every `update_interval` steps (reference
train.py:174-178).

Multi-chip: `mesh` turns the step into a shard_map program — each device
samples its own ray batch (per-device RNG fold), computes grads, and joins
them with a psum over ICI; parameter/optimizer state stays replicated.
This reproduces the reference's DDP semantics (N devices => N x rays,
train.py:286-291) the SPMD way.
"""

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.ngp import (NGPConfig, ngp_init, grid_state_init,
                          mark_invisible_cells, update_density_grid)
from ..rendering import render_train, render_test, MAX_SAMPLES
from ..datasets.ray_utils import get_rays, axisangle_to_R
from .losses import NeRFLossConfig, nerf_loss, total_loss
from .metrics import psnr as psnr_fn
from . import ckpt as ckpt_lib


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8192
    lr: float = 1e-2
    num_epochs: int = 30
    steps_per_epoch: int = 1000          # reference datasets/base.py:17-19
    update_interval: int = 16            # reference train.py:59
    warmup_steps: int = 256              # reference train.py:58
    density_decay: float = 0.95
    random_bg: bool = False
    optimize_ext: bool = False
    ray_sampling_strategy: str = "all_images"
    use_exposure: bool = False
    # True fuses [grid update + steps] into one program (1 dispatch per
    # block). Round 1 shipped False as a workaround for a fused-program
    # fault on the axon runtime; the fault disappeared with the round-2
    # scatter-free pipeline + per-axis index layout (scripts/tpu_bisect.py
    # stages A-F all pass, including block(16)) — the crash correlated
    # with 16x-tile-padded (..., 8|3)-trailing remat tensors blowing HBM.
    fuse_grid_update: bool = True
    erode: bool = False                  # reference: colmap datasets only
    unit_exposure_rgb: float = 0.5       # HDR-NeRF anchor (colmap.py:94,106)
    loss: NeRFLossConfig = field(default_factory=NeRFLossConfig)
    # TPU sample-buffer budget: avg samples/ray the compact buffer can hold
    samples_per_ray_budget: int = 32
    # shrink the budget (recompile) once measured demand stays well under
    # it — the reference's late-training cost drop (see _maybe_adapt_budget)
    adaptive_budget: bool = True
    # static cap on occupied-dilated marching segments per ray (two-level
    # marcher). 64 is the uncarved worst case; every marching cost (fine
    # occupancy gathers, selection binary searches) scales with it, and a
    # carved scene needs ~2-6 — _maybe_adapt_seg_cap shrinks it toward the
    # measured per-block max (and instantly grows it back near truncation)
    seg_cap: int = 64
    # shared cross-ray segment pool (march_rays_train_pooled): seg_cap
    # becomes the pool's MEAN slots/ray (total = batch*seg_cap) instead of
    # a per-ray pad, so one grazing ray no longer sizes the whole marching
    # cost and _maybe_adapt_seg_cap tracks the batch-mean demand. Overflow
    # strides (never truncates), so at equal capacity the pool supervises
    # at least the per-ray path's samples. Single-cascade scenes only
    # (others fall back).
    seg_pool: bool = True
    # pooled-marcher compaction algorithm ("sort" | "search"). "sort"
    # replaces the per-slot binary searches with one order-preserving
    # sort + direct compacted-array reads + a scatter/cumsum slot->ray
    # map — chip-measured march 161 -> 57 ms, full grad step 262 ->
    # 157 ms at the bench shape (scripts/tpu_march_anatomy.py, 264 GB/s
    # window). Bit-identical sample sets to "search" in every regime
    # (same allocation + striding policy; pinned by test).
    march_selection: str = "sort"
    # hoist the block's marching OUT of the 16-step scan: marching depends
    # only on rays (per-step RNG) + the occupancy grid (frozen within a
    # block), never on network params, so all `update_interval` steps can
    # march in ONE batched pass before the scan, bit-identically
    # (tests/test_march_hoist.py). MEASURED SLOWER on chip — default OFF:
    # 178.6 vs 165.1 ms/step at the bench shape (0.92x,
    # bench_runs/r5_hoist_ab*.log). The sort-selection march's sorts are
    # only ~7 ms of its 63 (the rest is linear-cost gathers, which batch
    # with no amortization), while the vmapped pre-march materializes its
    # (16, ...) intermediates to HBM instead of fusing into the scan body.
    # Kept as an option for shapes where selection sorts dominate.
    march_hoist: bool = False
    # exact-corner finish: stochastic single-corner gathers train ~3x
    # faster but optimize the STOCHASTIC forward — validation/baking
    # evaluate exact trilerp, and that mismatch plus gradient noise costs
    # ~2 dB at equal steps late in training (quality-run A/B, DESIGN.md).
    # After this fraction of total_steps the trainer flips to exact
    # 8-corner gathers (one cached recompile): stoch speed where dB/step
    # is steep, exact asymptote where it is flat. 1.0 disables.
    stoch_anneal_frac: float = 0.8
    # adapt/anneal rebuilds recompile the fused block program — 10-11 s
    # each through the axon remote compiler, several per run (VERDICT r3
    # weak #3). "auto" = on accelerators, compile the NEW program in a
    # background thread while training continues on the CURRENT one and
    # swap at the next block boundary once ready (0 s of stall on the
    # training clock); on CPU (tests) rebuilds stay synchronous. True /
    # False force. Single-device path only — mesh runs rebuild in place.
    async_rebuild: str = "auto"
    s_cap: int = MAX_SAMPLES
    max_samples: int = MAX_SAMPLES
    val_batch_size: int = 1 << 20        # reference opt.py:66-67

    @property
    def total_steps(self):
        return self.num_epochs * self.steps_per_epoch


def cosine_epoch_schedule(lr0: float, num_epochs: int, steps_per_epoch: int,
                          warmup_steps: int = 0):
    """CosineAnnealingLR stepped per epoch, eta_min = lr/30
    (reference train.py:150-152), plus a linear LR ramp over the grid
    warmup. The ramp is a deliberate TPU-side deviation: the reference
    rides apex FusedAdam's fp16 dynamic grad scaler through the violent
    early steps at its benchmark lr=2e-2; our f32 Adam + bf16 field has
    no scaler, and the 800x800 benchmark-schedule run diverged
    REPEATEDLY at steps ~190-240 (non-finite loss, 8 snapshot-resumes
    exhausted — bench_runs/r4_realscale_divergence.log). The ramp
    activates only ABOVE the measured stability cliff (r3 LR sweep:
    1e-2 stable with no headroom above), so the proven lr<=1e-2
    schedules — bench races, the pinned-quality CI run — are
    bit-unchanged."""
    eta_min = lr0 / 30.0
    LR_CLIFF = 1.05e-2
    ramp_steps = warmup_steps if lr0 > LR_CLIFF else 0

    def sched(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs)
        frac = epoch.astype(jnp.float32) / num_epochs
        lr = eta_min + 0.5 * (lr0 - eta_min) * (1 + jnp.cos(jnp.pi * frac))
        if ramp_steps > 0:
            ramp = jnp.clip((step.astype(jnp.float32) + 1.0) / ramp_steps,
                            0.0, 1.0)
            lr = lr * ramp
        return lr
    return sched


def make_optimizer(tc: TrainConfig):
    sched = cosine_epoch_schedule(tc.lr, tc.num_epochs, tc.steps_per_epoch,
                                  warmup_steps=tc.warmup_steps)
    # FusedAdam(lr, eps=1e-15) equivalent (reference train.py:146)
    net_opt = optax.adam(learning_rate=sched, eps=1e-15)
    if not tc.optimize_ext:
        return net_opt, sched
    # pose refinement gets its own Adam at the reference's hard-coded 1e-6
    # (train.py:148-149)
    pose_opt = optax.adam(learning_rate=1e-6)

    def labels(params):
        return {k: (jax.tree.map(lambda _: "pose", v) if k == "pose_deltas"
                    else jax.tree.map(lambda _: "net", v))
                for k, v in params.items()}

    tx = optax.multi_transform({"net": net_opt, "pose": pose_opt}, labels)
    return tx, sched


def sample_rays(images, poses, directions, key, tc: TrainConfig,
                pose_deltas=None):
    """On-device ray-batch sampling (reference base.py:22-35 + train.py:84-97).
    images: (N_img, HW, 3|4) device array."""
    n_img, hw = images.shape[0], images.shape[1]
    k_img, k_pix = jax.random.split(key)
    if tc.ray_sampling_strategy == "same_image":
        one = jax.random.randint(k_img, (), 0, n_img)
        img_idxs = jnp.full((tc.batch_size,), one, jnp.int32)
    else:
        img_idxs = jax.random.randint(k_img, (tc.batch_size,), 0, n_img)
    pix_idxs = jax.random.randint(k_pix, (tc.batch_size,), 0, hw)

    rays = images[img_idxs, pix_idxs]                  # (B, 3|4)
    rgb_gt = rays[:, :3]
    exposure = rays[:, 3:4] if (tc.use_exposure and images.shape[-1] == 4) \
        else None
    pose = poses[img_idxs]                             # (B, 3, 4)
    if pose_deltas is not None:                        # --optimize_ext
        dR = axisangle_to_R(pose_deltas["dR"][img_idxs])
        R = dR @ pose[..., :3]
        t = pose[..., 3] + pose_deltas["dT"][img_idxs]
        pose = jnp.concatenate([R, t[..., None]], axis=-1)
    dirs = directions[pix_idxs]
    rays_o, rays_d = get_rays(dirs, pose)
    return rays_o, rays_d, rgb_gt, exposure


def _hoist_active(cfg: NGPConfig, tc: TrainConfig, seg_cap: int) -> bool:
    """Whether the hoisted block march applies (see TrainConfig.march_hoist):
    pooled sort-selection marching on a single-cascade scene, no pose
    optimization (pose grads flow through sample positions)."""
    return (tc.march_hoist and tc.seg_pool and seg_cap > 0
            and cfg.cascades == 1 and tc.march_selection == "sort"
            and not tc.optimize_ext)


def hoisted_block_march(grid_state, images, poses, directions, keys, *,
                        cfg: NGPConfig, tc: TrainConfig,
                        exp_step_factor: float, seg_cap: int):
    """March every step of a block in one batched pass (stacked over steps).

    Marching is parameter-independent: it reads only the rays (determined
    by each step's key), the occupancy grid (frozen within a block), and
    per-step noise. The per-step key splits below mirror train_step_impl /
    render_train EXACTLY, so the vmapped marcher produces bit-identical
    MarchResults to the in-step path (tests/test_march_hoist.py). The win
    is on TPU: the selection sorts are pass-latency-bound at per-step
    sizes, so one (S, n)-batched sort costs a fraction of S separate
    sorts, and build_coarse_occupancy runs once per block instead of once
    per step."""
    from ..ops.marching import (build_coarse_occupancy,
                                coarse_dilation_radius,
                                march_rays_train_pooled)
    from ..rendering import scene_hits, default_candidates

    occ_coarse = build_coarse_occupancy(
        grid_state.occ_flat, cfg.cascades, cfg.grid_size,
        dilate=coarse_dilation_radius(
            scale=cfg.scale, exp_step_factor=exp_step_factor,
            grid_size=cfg.grid_size, max_samples=tc.max_samples))
    m_cap = tc.batch_size * tc.samples_per_ray_budget

    def one(key):
        k_sample, k_render = jax.random.split(key)
        rays_o, rays_d, _, _ = sample_rays(
            images, poses, directions, k_sample, tc, None)
        k_noise, _, _ = jax.random.split(k_render, 3)
        hits = scene_hits(rays_o, rays_d, cfg)
        noise = jax.random.uniform(k_noise, (rays_o.shape[0],))
        return march_rays_train_pooled(
            rays_o, rays_d, hits, grid_state.occ_flat, noise,
            scale=cfg.scale, cascades=cfg.cascades,
            exp_step_factor=exp_step_factor, grid_size=cfg.grid_size,
            max_samples=tc.max_samples,
            n_candidates=default_candidates(cfg, exp_step_factor,
                                            tc.max_samples),
            m_cap=m_cap, s_cap=tc.s_cap, occ_coarse=occ_coarse,
            seg_pool_cap=tc.batch_size * seg_cap, selection="sort")

    return jax.vmap(one)(keys)


def train_step_impl(params, opt_state, grid_state, images, poses, directions,
                    key, step, *, cfg: NGPConfig, tc: TrainConfig, tx,
                    exp_step_factor: float, axis_name: Optional[str] = None,
                    seg_cap: int = 64, tp=None, mr=None):
    """Pure training step; when axis_name is set, gradients/metrics are
    psum-joined across the device mesh (the DDP all-reduce equivalent).
    When `tp` (a parallel.tp.TableSharding) is set, params arrive with the
    hash table row-sharded over the mesh's model axis: the loss all_gathers
    it for the forward and the gradient join respects the sharding."""
    k_sample, k_render = jax.random.split(key)
    m_cap = tc.batch_size * tc.samples_per_ray_budget

    def loss_fn(p):
        if tp is not None:
            p = tp.expand(p)   # table shard -> full table (grad: psum_scatter)
        # ray generation must live inside the loss so --optimize_ext pose
        # deltas receive gradients through rays_o/rays_d
        pose_deltas = p.get("pose_deltas") if tc.optimize_ext else None
        rays_o, rays_d, rgb_gt, exposure = sample_rays(
            images, poses, directions, k_sample, tc, pose_deltas)
        results = render_train(
            {k: v for k, v in p.items() if k != "pose_deltas"},
            grid_state, rays_o, rays_d, k_render, cfg,
            exp_step_factor=exp_step_factor, random_bg=tc.random_bg,
            m_cap=m_cap, s_cap=tc.s_cap, max_samples=tc.max_samples,
            seg_cap=seg_cap, exposure=exposure,
            # stochastic corners zero the position cotangent, which
            # --optimize_ext needs through rays_o/rays_d
            stoch=cfg.stoch_corners and not tc.optimize_ext,
            # shared segment pool sized by the batch mean (seg_cap slots/ray)
            seg_pool=(tc.batch_size * seg_cap
                      if tc.seg_pool and seg_cap > 0 else 0),
            selection=tc.march_selection,
            march_results=jax.lax.stop_gradient(mr) if mr is not None
            else None)
        ld = nerf_loss(results, rgb_gt, tc.loss)
        if tc.use_exposure:
            # anchor the tonemappers at unit exposure (reference
            # train.py:182-187)
            from ..models.ngp import ngp_log_radiance_to_rgb
            unit_rgb = ngp_log_radiance_to_rgb(
                {k2: v for k2, v in p.items() if k2 != "pose_deltas"},
                jnp.zeros((1, 3)), exposure=jnp.ones((1, 1)))
            ld["unit_exposure"] = 0.5 * (unit_rgb
                                         - tc.unit_exposure_rgb) ** 2
        return total_loss(ld), (results, rgb_gt)

    (loss, (results, rgb_gt)), grads = \
        jax.value_and_grad(loss_fn, has_aux=True)(params)
    if tp is not None:
        grads = tp.join_grads(grads)
    elif axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    metrics = {
        "loss": loss,
        "psnr": psnr_fn(results["rgb"], rgb_gt),
        "rm_s": results["rm_samples"] / tc.batch_size,
        "vr_s": results["vr_samples"] / tc.batch_size,
        # float: joined with lax.pmean under the mesh
        "nseg": results["max_nseg"].astype(jnp.float32),
        # mean occupied-dilated segments/ray (pooled marcher's adaptation
        # signal; 0 on the per-ray path)
        "nseg_avg": (results["total_nseg"].astype(jnp.float32)
                     / tc.batch_size),
    }
    if axis_name is not None:
        nseg = metrics.pop("nseg")
        metrics = jax.lax.pmean(metrics, axis_name)
        metrics["nseg"] = jax.lax.pmax(nseg, axis_name)  # truncation guard
    return params, opt_state, metrics


def scan_steps_impl(params, opt_state, grid_state, images, poses,
                    directions, keys, *, cfg: NGPConfig, tc: TrainConfig,
                    tx, exp_step_factor: float,
                    axis_name: Optional[str] = None, seg_cap: int = 64,
                    tp=None):
    """`len(keys)` training steps as one compiled scan (no grid update)."""
    mrs = None
    if _hoist_active(cfg, tc, seg_cap):
        mrs = hoisted_block_march(
            grid_state, images, poses, directions, keys, cfg=cfg, tc=tc,
            exp_step_factor=exp_step_factor, seg_cap=seg_cap)

    def body(carry, xs):
        k, mr = xs
        p, o = carry
        p, o, metrics = train_step_impl(
            p, o, grid_state, images, poses, directions, k, 0,
            cfg=cfg, tc=tc, tx=tx, exp_step_factor=exp_step_factor,
            axis_name=axis_name, seg_cap=seg_cap, tp=tp, mr=mr)
        return (p, o), metrics

    (params, opt_state), ms = jax.lax.scan(
        body, (params, opt_state), (keys, mrs))
    metrics = jax.tree.map(lambda x: x[-1], ms)
    if "nseg" in ms:
        metrics["nseg"] = jnp.max(ms["nseg"])    # block max, not last
    return params, opt_state, metrics


def train_block_impl(params, opt_state, grid_state, images, poses,
                     directions, key, *, cfg: NGPConfig, tc: TrainConfig,
                     tx, exp_step_factor: float, warmup: bool,
                     axis_name: Optional[str] = None, grid_key=None,
                     tp=None):
    """One fused block = density-grid update + `update_interval` training
    steps as a single compiled program (lax.scan over steps).

    The reference updates the grid every 16 steps (train.py:174-178), so a
    block IS that natural cadence — fusing it removes 16x the host dispatch
    per block, which matters even more through a remote TPU tunnel than on
    local PCIe."""
    k_grid, k_steps = jax.random.split(key)
    if grid_key is not None:
        # under shard_map the grid update must use a REPLICATED key so all
        # devices keep bitwise-identical occupancy state
        k_grid = grid_key
    thr = 0.01 * MAX_SAMPLES / (3 ** 0.5)
    model_params = {k: v for k, v in params.items() if k != "pose_deltas"}
    if tp is not None:
        # replicated grid update needs the full table (identical on all
        # devices: the key is replicated and all_gather is deterministic)
        model_params = tp.expand(model_params)
    grid_state = update_density_grid(
        model_params, grid_state, k_grid, cfg, density_threshold=thr,
        warmup=warmup, decay=tc.density_decay, erode=tc.erode)

    keys = jax.random.split(k_steps, tc.update_interval)
    seg_cap = 0 if warmup else tc.seg_cap
    mrs = None
    if _hoist_active(cfg, tc, seg_cap):
        mrs = hoisted_block_march(
            grid_state, images, poses, directions, keys, cfg=cfg, tc=tc,
            exp_step_factor=exp_step_factor, seg_cap=seg_cap)

    def body(carry, xs):
        k, mr = xs
        p, o = carry
        p, o, metrics = train_step_impl(
            p, o, grid_state, images, poses, directions, k, 0,
            cfg=cfg, tc=tc, tx=tx, exp_step_factor=exp_step_factor,
            axis_name=axis_name, seg_cap=seg_cap, tp=tp, mr=mr)
        return (p, o), metrics

    (params, opt_state), ms = jax.lax.scan(
        body, (params, opt_state), (keys, mrs))
    metrics = jax.tree.map(lambda x: x[-1], ms)
    if "nseg" in ms:
        metrics["nseg"] = jnp.max(ms["nseg"])    # block max, not last
    return params, opt_state, grid_state, metrics


class NeRFTrainer:
    """Owns model/optimizer/grid state and the compiled step functions."""

    def __init__(self, cfg: NGPConfig, tc: TrainConfig, dataset,
                 test_dataset=None, key=None, mesh=None):
        self.cfg = cfg
        self.tc = tc
        self._initial_budget = tc.samples_per_ray_budget  # grow-back ceiling
        self.dataset = dataset
        self.test_dataset = test_dataset
        self.mesh = mesh
        key = key if key is not None else jax.random.PRNGKey(0)
        self.key, k_init = jax.random.split(key)

        self.exp_step_factor = 1 / 256 if cfg.scale > 0.5 else 0.0

        self.params = ngp_init(k_init, cfg)
        if tc.optimize_ext:
            n = len(dataset.poses)
            self.params["pose_deltas"] = {
                "dR": jnp.zeros((n, 3)), "dT": jnp.zeros((n, 3))}
        # 2-D (data, model) mesh => hash table row-sharded over the model
        # axis (parallel/tp.py): align its row count to the axis size. The
        # padding rows sit past every level offset (never gathered; zero
        # grads) and are stripped again on checkpoint save.
        self._n_mp = (mesh.shape[mesh.axis_names[1]]
                      if mesh is not None and len(mesh.axis_names) == 2
                      else 1)
        if self._n_mp > 1:
            from ..parallel.tp import pad_table
            self.params = pad_table(self.params, self._n_mp)
        self.tx, self.lr_sched = make_optimizer(tc)
        self.opt_state = self.tx.init(self.params)
        self.grid_state = grid_state_init(cfg)
        self.step = 0
        # reference --val_batch_size chunks MODEL evals at test time
        # (opt.py:66-67); here it bounds rays-per-chunk so that
        # rays * samples_per_round stays within the same eval budget
        self.val_chunk = min(1 << 16,
                             max(4096, getattr(tc, "val_batch_size",
                                               1 << 20) // 16))

        # device-resident dataset tensors
        self.images = jnp.asarray(dataset.rays)
        self.poses = jnp.asarray(dataset.poses)
        self.directions = jnp.asarray(dataset.directions)
        self.K = jnp.asarray(dataset.K)

        self._build_steps()

    def _build_steps(self, allow_async: bool = False):
        """Rebuild the jitted step/block programs for the current tc/cfg.

        allow_async (adapt/anneal call sites only): when async rebuilds are
        on, keep executing the CURRENT block program and compile the new one
        in the background (_spawn_block_precompile). Direct callers (init,
        scripts, A/B harnesses) get the default synchronous semantics: the
        next call runs — and therefore lazily compiles — the new program."""
        # handle on the currently-executing block program for the async path
        old_block = getattr(self, "_block", None)
        kw = dict(cfg=self.cfg, tc=self.tc, tx=self.tx,
                  exp_step_factor=self.exp_step_factor)
        # train_block_impl derives its per-step seg_cap from tc internally;
        # the single-step path must bind it explicitly or the adapted
        # tc.seg_cap would be silently ignored (impl default: 64)
        step_impl = partial(train_step_impl, seg_cap=self.tc.seg_cap)
        if self.mesh is None:
            self._step = jax.jit(
                partial(step_impl, axis_name=None, **kw),
                donate_argnums=(0, 1))
            import os
            # donated params/opt/grid buffers: in-place updates, ~0.2 GB/step
            # less traffic. ARNERF_DONATE=0 opts out (callers that reuse the
            # passed-in pytrees after the call).
            donate = (0, 1, 2) if os.environ.get(
                "ARNERF_DONATE", "1") == "1" else ()
            self._block = jax.jit(
                partial(train_block_impl, axis_name=None, **kw),
                static_argnames=("warmup",), donate_argnums=donate)
            self._scan_steps = jax.jit(
                partial(scan_steps_impl, axis_name=None, **kw),
                static_argnames=("seg_cap",), donate_argnums=(0, 1))
        elif self._n_mp > 1:
            from ..parallel.tp import (make_tp_train_step,
                                       make_tp_train_block)
            te = self.cfg.hash_cfg.total_entries
            self._step = make_tp_train_step(
                self.mesh, step_impl, kw, self.params, self.opt_state, te)
            self._block = make_tp_train_block(
                self.mesh, train_block_impl, kw, self.params, self.opt_state,
                te)
        else:
            from ..parallel.dp import make_dp_train_step, make_dp_train_block
            self._step = make_dp_train_step(self.mesh, step_impl, kw)
            self._block = make_dp_train_block(self.mesh, train_block_impl,
                                              kw)
        # any rebuild supersedes an in-flight async compile (its program
        # implements an outdated tc/cfg); the generation check in
        # _maybe_swap_block discards it when it lands
        self._rebuild_gen = getattr(self, "_rebuild_gen", 0) + 1
        if (allow_async and old_block is not None and self.mesh is None
                and self.tc.fuse_grid_update and self._async_rebuild_on()):
            self._spawn_block_precompile(self._block, self._rebuild_gen)
            self._block = old_block   # execute the old program until ready

    # -- async rebuild -------------------------------------------------------
    # A budget/seg-cap/anneal rebuild only changes compiled CONSTANTS (buffer
    # sizes, corner estimator); the old program stays semantically valid for
    # the current state pytrees — shapes are identical. So instead of
    # stalling the next train_block on a 10-11 s remote compile, AOT-compile
    # the new program from ShapeDtypeStructs in a daemon thread (the host is
    # idle-waiting on the device/tunnel most of the time) and swap it in at
    # a block boundary once ready. Generation counter discards compiles that
    # a newer rebuild superseded.

    def _async_rebuild_on(self) -> bool:
        ar = getattr(self.tc, "async_rebuild", "auto")
        if ar == "auto":
            return jax.default_backend() != "cpu"
        return bool(ar)

    def _spawn_block_precompile(self, target, gen: int):
        import threading

        args = (self.params, self.opt_state, self.grid_state, self.images,
                self.poses, self.directions, self.key)
        specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.result_type(x)), args)

        def work():
            try:
                compiled = target.lower(*specs, warmup=False).compile()

                def fn(*a, warmup=False):
                    if warmup:            # rare: adapt only fires post-warmup
                        return target(*a, warmup=True)
                    return compiled(*a)
                self._pending_block = (gen, fn)
            except Exception as e:        # fall back to a lazy (sync) compile
                print(f"async rebuild precompile failed "
                      f"({type(e).__name__}: {e}); next block compiles "
                      "synchronously", flush=True)
                self._pending_block = (gen, target)

        t = threading.Thread(target=work, daemon=True,
                             name=f"arnerf-precompile-{gen}")
        t.start()
        self._precompile_thread = t

    def _maybe_swap_block(self):
        p = getattr(self, "_pending_block", None)
        if p is None:
            return
        gen, fn = p
        self._pending_block = None
        if gen == getattr(self, "_rebuild_gen", 0):
            self._block = fn

    # -- lifecycle ---------------------------------------------------------

    def on_train_start(self):
        """reference train.py:169-172."""
        w, h = self.dataset.img_wh
        self.grid_state = mark_invisible_cells(
            self.grid_state, self.K, self.poses, self.cfg, w, h)

    def maybe_update_grid(self):
        if self.step % self.tc.update_interval == 0:
            self.key, k = jax.random.split(self.key)
            # reference train.py:176: 0.01 * MAX_SAMPLES / 3**0.5
            thr = 0.01 * MAX_SAMPLES / (3 ** 0.5)
            self.grid_state = update_density_grid(
                self.params if "pose_deltas" not in self.params else
                {k2: v for k2, v in self.params.items() if k2 != "pose_deltas"},
                self.grid_state, k, self.cfg, density_threshold=thr,
                warmup=self.step < self.tc.warmup_steps,
                decay=self.tc.density_decay, erode=self.tc.erode)

    def train_step(self):
        self.maybe_update_grid()
        self.key, k = jax.random.split(self.key)
        if self.mesh is not None:
            n = len(self.mesh.devices.flatten())
            k = jax.random.split(k, n)
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, self.grid_state, self.images,
            self.poses, self.directions, k, self.step)
        self.step += 1
        return metrics

    def train_block(self):
        """[grid update + update_interval steps]; requires self.step to be
        block-aligned. Fused into one program when tc.fuse_grid_update,
        otherwise two dispatches (grid update, scanned steps)."""
        assert self.step % self.tc.update_interval == 0
        # schedule-level exact-corner finish: belongs to every block driver,
        # not just fit() — a direct train_block() loop (bench A/Bs, user
        # code) must get production anneal semantics too (idempotent;
        # frac >= 1.0 disables)
        self._maybe_anneal_stoch()
        # adopt a background-compiled rebuild, if one is ready
        self._maybe_swap_block()
        self.key, k = jax.random.split(self.key)
        if self.tc.fuse_grid_update or self.mesh is not None:
            if self.mesh is not None:
                n = len(self.mesh.devices.flatten())
                k = jax.random.split(k, n)
            (self.params, self.opt_state, self.grid_state,
             metrics) = self._block(
                self.params, self.opt_state, self.grid_state, self.images,
                self.poses, self.directions, k,
                warmup=self.step < self.tc.warmup_steps)
        else:
            self.maybe_update_grid()
            keys = jax.random.split(k, self.tc.update_interval)
            warm = self.step < self.tc.warmup_steps
            self.params, self.opt_state, metrics = self._scan_steps(
                self.params, self.opt_state, self.grid_state, self.images,
                self.poses, self.directions, keys,
                seg_cap=0 if warm else self.tc.seg_cap)
        self.step += self.tc.update_interval
        return metrics

    # -- failure detection / recovery ---------------------------------------
    # SURVEY.md §5: the reference has no fault handling (a crash loses an
    # epoch). Here, periodic host snapshots + automatic device-recovery
    # restore training after a TPU worker crash (which the time-shared axon
    # pool does produce in practice).

    def _host_snapshot(self):
        self._snap = jax.tree.map(np.asarray,
                                  (self.params, self.opt_state,
                                   self.grid_state))
        self._snap_step = self.step
        self._snap_key = np.asarray(self.key)

    def _restore_snapshot(self):
        params, opt_state, grid_state = jax.tree.map(jnp.asarray, self._snap)
        self.params, self.opt_state, self.grid_state = \
            params, opt_state, grid_state
        self.step = self._snap_step
        self.key = jnp.asarray(self._snap_key)

    def _write_disk_snapshot(self, path):
        """Crash-durable snapshot: persist the CURRENT host snapshot
        (already fetched by _host_snapshot — no extra tunnel bytes) so a
        fresh PROCESS can resume after an unrecoverable fault (the
        in-process recovery above caps at max_recoveries; pool fault
        storms in production runs exhaust it — r5 full-schedule run died
        at 8/8 with 6.5k steps unsaved)."""
        params, opt_state, grid_state = self._snap
        if self._n_mp > 1:
            from ..parallel.tp import unpad_tree
            hc = self.cfg.hash_cfg
            params, opt_state = unpad_tree(
                (params, opt_state), hc.total_entries, hc.n_features,
                self._n_mp)
        # save_ckpt's write is itself atomic (tmp + rename), so a crash
        # mid-write never corrupts the resume point
        ckpt_lib.save_ckpt(str(path), params=params, grid_state=grid_state,
                           opt_state=opt_state, step=self._snap_step)

    def _wait_for_device(self, max_wait_s=3600, poll_s=60):
        from ..utils.sync import device_sync
        t0 = time.time()
        while time.time() - t0 < max_wait_s:
            try:
                # host fetch: block_until_ready alone is a no-op through the
                # remote tunnel, so it cannot prove the device is healthy
                device_sync(jnp.ones((8, 8)).sum())
                return True
            except Exception:
                time.sleep(poll_s)
        return False

    # -- adaptive sample budget ---------------------------------------------
    # The reference marches each ray to completion (no per-ray sample cap),
    # so its per-step cost FALLS as the occupancy grid carves: late-training
    # demand on Blender scenes drops to ~10-16 samples/ray. This trainer's
    # fixed-shape buffer pays for `samples_per_ray_budget` slots per ray
    # regardless of demand; shrinking the budget once measured demand stays
    # well under it recovers the reference's late-training economics (every
    # hot cost — gathers, backward sorts, compositing — scales with the
    # buffer). Shrink-only, with hysteresis, and only to budgets that still
    # exceed demand, so marching truncation never increases.

    def _maybe_adapt_budget(self, rm_s: float, patience: int = 3,
                            floor: int = 8) -> bool:
        """rm_s: measured demanded samples/ray. Returns True on rebuild.

        Shrinks to FIT (smallest multiple of 8 holding demand + 30%
        headroom), not just by halving: typical Blender-like demand sits at
        18-25 samples/ray mid-training — above the halving rule's trigger
        (rm_s*1.3 < budget/2) but well under the 32 budget, leaving a
        quarter of every hot cost (gathers, backward sorts, compositing)
        as padding. Multiples of 8 keep the set of compiled shapes small so
        the persistent compile cache amortizes rebuilds across runs."""
        if not self.tc.adaptive_budget or self.step < self.tc.warmup_steps:
            return False
        from dataclasses import replace as _replace
        budget = self.tc.samples_per_ray_budget
        fit = max(floor, int(-(-(rm_s * 1.3) // 8)) * 8)
        if rm_s * 1.1 > budget and fit > budget:
            # demand grew back past the buffer (grid re-densified): samples
            # are being strided — restore headroom immediately, no votes
            grow = min(fit, self._initial_budget)
            if grow > budget:
                self.tc = _replace(self.tc, samples_per_ray_budget=grow)
                self._build_steps(allow_async=True)
                self._shrink_votes = 0
                print(f"sample budget {budget} -> {grow} "
                      f"(demand {rm_s:.1f}/ray)", flush=True)
                return True
        if fit <= budget - 8:
            self._shrink_votes = getattr(self, "_shrink_votes", 0) + 1
            if self._shrink_votes >= patience:
                self.tc = _replace(self.tc, samples_per_ray_budget=fit)
                self._build_steps(allow_async=True)
                self._shrink_votes = 0
                print(f"sample budget {budget} -> {fit} "
                      f"(demand {rm_s:.1f}/ray)", flush=True)
                return True
        else:
            self._shrink_votes = 0
        return False

    def _maybe_anneal_stoch(self) -> bool:
        """Exact-corner finish (tc.stoch_anneal_frac): once past the
        configured fraction of the schedule, flip cfg.stoch_corners off
        and rebuild (params/opt/grid state are untouched — stochastic
        corners are an eval-path estimator, not a parameterization).
        Returns True on the one rebuild."""
        if not self.cfg.stoch_corners or self.tc.stoch_anneal_frac >= 1.0:
            return False
        if self.step < self.tc.stoch_anneal_frac * self.tc.total_steps:
            return False
        from dataclasses import replace as _replace
        self.cfg = _replace(self.cfg, stoch_corners=False)
        self._build_steps(allow_async=True)
        print(f"stoch corners -> exact at step {self.step} "
              f"(anneal_frac {self.tc.stoch_anneal_frac})", flush=True)
        return True

    @property
    def _pool_mode(self) -> bool:
        """Shared-segment-pool marching active (tc.seg_pool wired through
        render_train; multi-cascade scenes fall back to the per-ray path)."""
        return bool(self.tc.seg_pool) and self.cfg.cascades == 1

    def seg_metric(self, metrics) -> float:
        """The segment-demand signal _maybe_adapt_seg_cap expects: the
        batch MEAN (nseg_avg) in pool mode, the per-block MAX (nseg) on
        the per-ray path."""
        key = "nseg_avg" if self._pool_mode else "nseg"
        return float(metrics.get(key, 64))

    def _maybe_adapt_seg_cap(self, nseg: float, patience: int = 3,
                             floor: int = 8) -> bool:
        """nseg: measured segment demand per ray — the per-block MAX on
        the per-ray path (pre-clamp, so values above seg_cap mean
        truncation is active), the batch MEAN in pool mode (callers use
        `seg_metric`). Shrinks the marching segment buffer toward demand
        with hysteresis; grows back IMMEDIATELY when demand approaches the
        cap, so marching exactness (two-level == single-level,
        ops/marching.py) is restored within one block of any density
        re-growth. In pool mode the shrink is to-fit in multiples of 8
        (striding, not truncation, absorbs any residual overflow)."""
        if not self.tc.adaptive_budget or self.step < self.tc.warmup_steps:
            return False
        from dataclasses import replace as _replace
        cap = self.tc.seg_cap
        if self._pool_mode:
            # capacity targets demand WITHOUT headroom: mild segment
            # striding (stride_s up to ~1.25) is measured quality-FREE
            # (r3 A/B: pool 32 at demand ~39 scored >= pool 64 at equal
            # steps, bench_runs/r3_segpool_quality_ab.log) while every
            # marching cost scales with the pool — the r4 race lost ~40%
            # march time to an eager 32 -> 56 grow at demand 38.9
            fit = max(floor, int(-(-nseg // 8)) * 8)
            grow = min(fit, 64)
            if nseg > 1.25 * cap and grow > cap:
                self.tc = _replace(self.tc, seg_cap=grow)
                self._build_steps(allow_async=True)
                self._segcap_votes = 0
                print(f"seg pool {cap} -> {grow}/ray "
                      f"(mean demand {nseg:.1f})", flush=True)
                return True
            if fit <= cap - 8:
                self._segcap_votes = getattr(self, "_segcap_votes", 0) + 1
                if self._segcap_votes >= patience:
                    self.tc = _replace(self.tc, seg_cap=fit)
                    self._build_steps(allow_async=True)
                    self._segcap_votes = 0
                    print(f"seg pool {cap} -> {fit}/ray "
                          f"(mean demand {nseg:.1f})", flush=True)
                    return True
            else:
                self._segcap_votes = 0
            return False
        if nseg > 0.75 * cap and cap < 64:
            self.tc = _replace(self.tc, seg_cap=min(64, cap * 2))
            self._build_steps(allow_async=True)
            self._segcap_votes = 0
            print(f"seg_cap {cap} -> {self.tc.seg_cap} "
                  f"(demand {nseg:.0f})", flush=True)
            return True
        half = cap // 2
        if half >= floor and nseg * 1.6 < half:
            self._segcap_votes = getattr(self, "_segcap_votes", 0) + 1
            if self._segcap_votes >= patience:
                self.tc = _replace(self.tc, seg_cap=half)
                self._build_steps(allow_async=True)
                self._segcap_votes = 0
                print(f"seg_cap {cap} -> {half} (demand {nseg:.0f})",
                      flush=True)
                return True
        else:
            self._segcap_votes = 0
        return False

    def fit(self, n_steps=None, log_every=1000, callback=None,
            use_blocks=True, snapshot_every_blocks=25, max_recoveries=8,
            disk_snapshot=None):
        self.on_train_start()
        n = n_steps if n_steps is not None else self.tc.total_steps
        t0 = time.time()
        start = self.step
        last = {}
        blocks_since_snap = 0
        recoveries = 0
        self._host_snapshot()
        if disk_snapshot:
            self._write_disk_snapshot(disk_snapshot)
        while self.step - start < n:
            remaining = n - (self.step - start)
            try:
                if use_blocks and self.step % self.tc.update_interval == 0 \
                        and remaining >= self.tc.update_interval:
                    last = self.train_block()
                    blocks_since_snap += 1
                    # a faulting accelerator can return garbage instead of
                    # raising: treat a non-finite loss as a failure so the
                    # snapshot recovery below also covers silent NaNs
                    if not np.isfinite(float(last["loss"])):
                        raise FloatingPointError(
                            f"non-finite loss at step {self.step}")
                    if blocks_since_snap >= snapshot_every_blocks:
                        self._host_snapshot()
                        if disk_snapshot:
                            self._write_disk_snapshot(disk_snapshot)
                        blocks_since_snap = 0
                    if "rm_s" in last:
                        self._maybe_adapt_budget(float(last["rm_s"]))
                    if "nseg" in last:
                        self._maybe_adapt_seg_cap(self.seg_metric(last))
                    self._maybe_anneal_stoch()
                else:
                    last = self.train_step()
            except Exception as e:  # TPU worker crash / infra failure
                recoveries += 1
                if recoveries > max_recoveries:
                    # leave the freshest resume point behind: the caller
                    # (or a supervisor loop) restarts the process and
                    # resumes from it instead of losing the run
                    if disk_snapshot:
                        self._write_disk_snapshot(disk_snapshot)
                    raise
                print(f"device failure at step {self.step} "
                      f"({type(e).__name__}); waiting for recovery "
                      f"({recoveries}/{max_recoveries})...", flush=True)
                if not self._wait_for_device():
                    raise
                self._restore_snapshot()
                # don't replay the byte-identical batch: some faults are
                # data-dependent and would recur deterministically
                self.key = jax.random.fold_in(self.key, recoveries)
                print(f"recovered; resuming from step {self.step}",
                      flush=True)
                continue
            if callback is not None:
                callback(self.step, last)
            if log_every and self.step % log_every < (
                    self.tc.update_interval if use_blocks else 1):
                m = {k: float(v) for k, v in last.items()}
                print(f"step {self.step}: "
                      + " ".join(f"{k}={v:.4g}" for k, v in m.items())
                      + f" ({(self.step - start) / (time.time() - t0):.1f}"
                      " it/s)", flush=True)
        return last

    # -- evaluation --------------------------------------------------------

    def render_pose(self, pose, dirs=None, **kwargs):
        dirs = self.directions if dirs is None else dirs
        rays_o, rays_d = get_rays(dirs, jnp.asarray(pose))
        kwargs.setdefault("chunk", self.val_chunk)
        return render_test(self.model_params, self.grid_state, rays_o, rays_d,
                           self.cfg, exp_step_factor=self.exp_step_factor,
                           **kwargs)

    @property
    def model_params(self):
        return {k: v for k, v in self.params.items() if k != "pose_deltas"}

    def validate(self, max_images=None, compute_ssim=True, stride=1,
                 **render_kwargs):
        from .metrics import ssim as ssim_fn
        # compacted fast path by default: identical compositing semantics
        # (survivor compaction only changes which buffer a ray marches in),
        # ~several-fold cheaper — validation snapshots were 46% of a
        # quality-race group's wall clock on the slow masked path
        # (VERDICT r2 weak #4)
        render_kwargs.setdefault("fast", True)
        ds = self.test_dataset or self.dataset
        w, h = ds.img_wh
        n = len(ds.poses) if max_images is None else min(max_images,
                                                         len(ds.poses))
        # stride > 1: render only every stride-th pixel in both axes and
        # score against the equally strided GT — a ~stride^2-cheaper PSNR
        # probe for mid-race snapshots (same estimator, subsampled pixel
        # set; the race's crossing is still confirmed at full spec). SSIM
        # is windowed, so it is only computed at stride 1.
        s = max(1, int(stride))
        dirs = None
        if s > 1:
            dirs = jnp.asarray(
                np.asarray(self.directions).reshape(h, w, 3)[::s, ::s]
                .reshape(-1, 3))
            hs, ws = (h + s - 1) // s, (w + s - 1) // s
        psnrs, ssims = [], []
        for i in range(n):
            out = self.render_pose(ds.poses[i], dirs=dirs, **render_kwargs)
            ph, pw = (hs, ws) if s > 1 else (h, w)
            pred = np.asarray(out["rgb"]).reshape(ph, pw, 3)
            # synthetic background is white in training (exp_step_factor==0)
            if self.exp_step_factor == 0.0:
                pred = pred + (1 - np.asarray(out["opacity"])
                               .reshape(ph, pw, 1))
            gt = np.asarray(ds.rays[i][:, :3]).reshape(h, w, 3)
            if s > 1:
                gt = gt[::s, ::s]
            psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt))))
            if compute_ssim and s == 1:
                ssims.append(float(ssim_fn(jnp.asarray(pred), jnp.asarray(gt))))
        out = {"psnr": float(np.mean(psnrs))}
        if compute_ssim and ssims:
            out["ssim"] = float(np.mean(ssims))
        return out

    # -- checkpointing -----------------------------------------------------

    def save(self, path):
        save = (ckpt_lib.save_ckpt_orbax if str(path).endswith(".orbax")
                else ckpt_lib.save_ckpt)
        params, opt_state = self.params, self.opt_state
        if self._n_mp > 1:
            # strip the model-axis alignment padding (params AND Adam
            # mu/nu): checkpoints are interchangeable between sharded and
            # unsharded runs
            from ..parallel.tp import unpad_tree
            hc = self.cfg.hash_cfg
            params, opt_state = unpad_tree(
                (params, opt_state), hc.total_entries, hc.n_features,
                self._n_mp)
        save(path, params=params, grid_state=self.grid_state,
             opt_state=opt_state, step=self.step)

    def load_weights(self, path):
        """Params-only load (reference --weight_path, train.py:139)."""
        p_tmpl = self.params
        if self._n_mp > 1:
            from ..parallel.tp import pad_tree, unpad_tree
            hc = self.cfg.hash_cfg
            p_tmpl = unpad_tree(p_tmpl, hc.total_entries, hc.n_features,
                                self._n_mp)
        params, _, _, _ = ckpt_lib.load_ckpt(path, params_template=p_tmpl)
        if self._n_mp > 1:
            params = pad_tree(params, hc.total_entries, hc.n_features,
                              self._n_mp)
        self.params = params

    def load(self, path):
        load = (ckpt_lib.load_ckpt_orbax if str(path).endswith(".orbax")
                else ckpt_lib.load_ckpt)
        p_tmpl, o_tmpl = self.params, self.opt_state
        if self._n_mp > 1:
            from ..parallel.tp import pad_tree, unpad_tree
            hc = self.cfg.hash_cfg
            p_tmpl, o_tmpl = unpad_tree(
                (p_tmpl, o_tmpl), hc.total_entries, hc.n_features,
                self._n_mp)
        params, self.grid_state, opt_state, self.step = \
            load(path, params_template=p_tmpl,
                 grid_template=self.grid_state,
                 opt_state_template=o_tmpl)
        if self._n_mp > 1:
            params, opt_state = pad_tree(
                (params, opt_state), hc.total_entries, hc.n_features,
                self._n_mp)
        self.params, self.opt_state = params, opt_state
