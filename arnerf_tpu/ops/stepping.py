"""Closed-form ray-step lattice.

The reference marches each ray serially: t += calc_dt(t) with
calc_dt(t) = clamp(t*exp_step_factor, SQRT3/max_samples, SQRT3*2*scale/grid_size)
(reference: models/csrc/raymarching.cu:11-13), skipping empty voxels by
fast-forwarding ON THE SAME LATTICE (raymarching.cu:224-233). That recurrence
has a closed form, which is the key to a TPU-native marcher: instead of a
serial DDA per ray, we evaluate the whole lattice of candidate positions
t(k), k = 0..K-1 in parallel, test occupancy vectorized, and compact.

The lattice (anchored at the per-ray start t1):
  phase 1 (dt pinned at dt_min):      t(k) = t1 + k*dt_min          while t < A
  phase 2 (exponential, dt = t*f):    t(k) = t_A * (1+f)^(k - k_A)  while t < B
  phase 3 (dt pinned at dt_max):      t(k) = B + (k - k_B)*dt_max
where A = dt_min/f, B = dt_max/f. Phase 2 is EXACT w.r.t. the reference's
discrete recurrence (t += t*f <=> geometric growth); phases 1/3 are exact
too; only the two clamp-boundary steps can differ by less than one step.
For exp_step_factor == 0 the lattice is uniform: t(k) = t1 + k*dt_min.
"""

import math

import jax.numpy as jnp

SQRT3 = 1.7320508075688772


def calc_dt(t, exp_step_factor: float, max_samples: int, grid_size: int, scale: float):
    """reference: models/csrc/raymarching.cu:11-13."""
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2 * scale / grid_size
    return jnp.clip(t * exp_step_factor, dt_min, dt_max)


def mip_from_pos(xyz, cascades: int):
    """Cascade from position magnitude: |x| in [0,.5)->0, [.5,1)->1, [1,2)->2...

    reference: models/csrc/raymarching.cu:19-23 (frexp-based).
    """
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    e = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-12)))
    return jnp.clip(e + 2, 0, cascades - 1).astype(jnp.int32)


def mip_from_dt(dt, grid_size: int, cascades: int):
    """Cascade from step size: dt in [0,1/G)->0, [1/G,2/G)->1, ...

    reference: models/csrc/raymarching.cu:29-32.
    """
    e = jnp.floor(jnp.log2(jnp.maximum(dt * grid_size, 1e-12)))
    return jnp.clip(e + 1, 0, cascades - 1).astype(jnp.int32)


def lattice_t(t1, k, exp_step_factor: float, max_samples: int,
              grid_size: int, scale: float):
    """t(k) of the step lattice anchored at t1. t1: (...,) k: broadcastable.

    Static-zero exp_step_factor yields the uniform lattice (synthetic scenes).
    """
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2 * scale / grid_size
    # calc_dt's clip(t*f, dt_min, dt_max) resolves to min(dt_min, dt_max)
    # whenever dt_min > dt_max (max_samples below ~grid_size/(2*scale)):
    # use the same effective uniform step so deltas match optical depth.
    dt_min = min(dt_min, dt_max)
    k = k.astype(jnp.float32)
    if exp_step_factor == 0.0:
        return t1 + k * dt_min
    f = exp_step_factor
    A = dt_min / f
    B = dt_max / f
    log1pf = math.log1p(f)
    # number of dt_min steps before the exponential phase begins
    k_A = jnp.maximum(0.0, (A - t1) / dt_min)
    t_A = jnp.clip(t1, A, B)  # t at the start of the exponential phase
    # number of exponential steps before dt saturates at dt_max
    k_B = k_A + jnp.maximum(0.0, jnp.log(B / jnp.maximum(t_A, 1e-12)) / log1pf)
    t_lin = t1 + k * dt_min
    t_exp = t_A * jnp.exp((k - k_A) * log1pf)
    t_sat = B + (k - k_B) * dt_max
    return jnp.where(k <= k_A, t_lin, jnp.where(k <= k_B, t_exp, t_sat))


def num_lattice_steps(t_min: float, t_max: float, exp_step_factor: float,
                      max_samples: int, grid_size: int, scale: float) -> int:
    """Static K needed so the lattice anchored at any t1 >= t_min covers t_max."""
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2 * scale / grid_size
    dt_min = min(dt_min, dt_max)  # same effective step as lattice_t/calc_dt
    if exp_step_factor == 0.0:
        return int(math.ceil((t_max - t_min) / dt_min)) + 1
    f = exp_step_factor
    A = dt_min / f
    B = dt_max / f
    k = max(0.0, (A - t_min) / dt_min)
    t = max(t_min, A)
    if t_max > t:
        k += max(0.0, math.log(min(t_max, B) / t) / math.log1p(f))
    if t_max > B:
        k += (t_max - B) / dt_max
    return int(math.ceil(k)) + 1
