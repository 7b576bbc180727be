"""Ray / AABB and ray / sphere intersection as vectorized XLA math.

TPU-native equivalent of the reference CUDA kernels
`ray_aabb_intersect_kernel` (reference: models/csrc/intersection.cu:5-100)
and `ray_sphere_intersect_kernel` (reference: models/csrc/intersection.cu:103-197).
These are embarrassingly parallel slab/quadratic tests; plain jax.numpy maps
them straight onto the VPU, so no Pallas kernel is warranted.

The main render path only ever intersects against the single scene AABB with
max_hits=1 (reference: models/rendering.py:29-30), so the fast path
`ray_aabb_intersect_single` avoids the (rays x voxels) blow-up entirely.
"""

import jax.numpy as jnp


def _slab_test(rays_o, inv_d, center, half_size):
    """Per (ray, box) slab test. Broadcasts over leading dims.

    Returns (t1, t2); (-1, -1) where there is no intersection, and t1 is
    clamped to >= 0 like the reference (intersection.cu:51).
    """
    t_lo = (center - half_size - rays_o) * inv_d
    t_hi = (center + half_size - rays_o) * inv_d
    t1 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t2 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hit = (t1 <= t2) & (t2 > 0)
    t1 = jnp.where(hit, jnp.maximum(t1, 0.0), -1.0)
    t2 = jnp.where(hit, t2, -1.0)
    return t1, t2


def ray_aabb_intersect_single(rays_o, rays_d, center, half_size):
    """Intersect N rays against ONE axis-aligned box.

    rays_o, rays_d: (N, 3); center, half_size: (3,) or (1, 3)
    Returns hits_t: (N, 2) [t1, t2], (-1, -1) on miss, t1 >= 0.
    """
    center = jnp.reshape(center, (1, 3))
    half_size = jnp.reshape(half_size, (1, 3))
    inv_d = 1.0 / rays_d
    t1, t2 = _slab_test(rays_o, inv_d, center, half_size)
    return jnp.stack([t1, t2], axis=-1)


def ray_aabb_intersect(rays_o, rays_d, centers, half_sizes, max_hits: int):
    """Full API-parity variant: N rays x V voxels, keep first `max_hits` by t1.

    Returns (hits_cnt (N,), hits_t (N, max_hits, 2), hits_voxel_idx (N, max_hits)),
    hits sorted near-to-far, -1 padding — matching `vren.ray_aabb_intersect`.
    """
    inv_d = 1.0 / rays_d
    t1, t2 = _slab_test(rays_o[:, None, :], inv_d[:, None, :],
                        centers[None, :, :], half_sizes[None, :, :])  # (N, V)
    hit = t2 > 0
    hits_cnt = jnp.sum(hit, axis=1).astype(jnp.int32)
    # sort by t1 with misses (-1) pushed to the back via +inf key
    sort_key = jnp.where(hit, t1, jnp.inf)
    order = jnp.argsort(sort_key, axis=1)[:, :max_hits]
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    t1s, t2s, hits = take(t1), take(t2), take(hit)
    hits_t = jnp.stack([jnp.where(hits, t1s, -1.0), jnp.where(hits, t2s, -1.0)], -1)
    voxel_idx = jnp.where(hits, order, -1)
    return hits_cnt, hits_t, voxel_idx


def ray_sphere_intersect(rays_o, rays_d, centers, radii, max_hits: int):
    """N rays x S spheres quadratic intersection, near-to-far, -1 padding.

    Matches `vren.ray_sphere_intersect` (reference: models/csrc/intersection.cu:103-197).
    """
    oc = rays_o[:, None, :] - centers[None, :, :]            # (N, S, 3)
    d = rays_d[:, None, :]
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    hit = (disc > 0) & (t2 > 0)
    t1 = jnp.maximum(t1, 0.0)
    hits_cnt = jnp.sum(hit, axis=1).astype(jnp.int32)
    sort_key = jnp.where(hit, t1, jnp.inf)
    order = jnp.argsort(sort_key, axis=1)[:, :max_hits]
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    t1s, t2s, hits = take(t1), take(t2), take(hit)
    hits_t = jnp.stack([jnp.where(hits, t1s, -1.0), jnp.where(hits, t2s, -1.0)], -1)
    sphere_idx = jnp.where(hits, order, -1)
    return hits_cnt, hits_t, sphere_idx
