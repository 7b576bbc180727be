"""Data-parallel training step via shard_map over a 1-D mesh.

Replaces the reference's DDP gradient all-reduce (implicit in Lightning's
DDPPlugin, reference train.py:286-291) with an explicit lax.pmean inside a
single SPMD program. Semantics match the reference's multi-GPU behavior:
each device samples its OWN batch_size rays (per-device RNG), so N devices
mean an N-fold effective ray batch (reference datasets/base.py:25-31 runs
independently per DDP rank).

Everything except the per-device RNG key is replicated; outputs (params,
opt_state, metrics) are identical on all devices by construction
(pmean-joined grads -> identical updates), declared with replicated
out_specs.
"""

from functools import partial

import jax
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(*args, **kwargs):
    """shard_map with varying-axes checking off: the hash-grid encode's
    custom VJP produces a data-varying table cotangent for the replicated
    table input (each device's partial sums), which the checker rejects.
    The explicit lax.pmean over grads inside the step performs the join the
    checker would otherwise insert automatically."""
    try:
        return _shard_map(*args, check_vma=False, **kwargs)
    except TypeError:  # older spelling
        return _shard_map(*args, check_rep=False, **kwargs)


def make_dp_train_step(mesh, train_step_impl, kw):
    axis = mesh.axis_names[0]
    fn = partial(train_step_impl, axis_name=axis, **kw)

    def local_step(params, opt_state, grid_state, images, poses, directions,
                   keys, step):
        # keys arrives as this device's (1, 2) shard -> its private key
        return fn(params, opt_state, grid_state, images, poses, directions,
                  keys[0], step)

    rep = P()
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, P(axis), rep),
        out_specs=(rep, rep, rep))
    return jax.jit(mapped, donate_argnums=(0, 1))


def make_dp_train_block(mesh, train_block_impl, kw):
    """Fused [grid update + N steps] block under shard_map. The grid update
    runs with the same key on every device (identical replicated result);
    per-step ray batches stay device-private."""
    from functools import lru_cache
    axis = mesh.axis_names[0]
    rep = P()

    @lru_cache(maxsize=None)
    def compiled(warmup: bool):
        def local_block(params, opt_state, grid_state, images, poses,
                        directions, keys, grid_key):
            return train_block_impl(
                params, opt_state, grid_state, images, poses, directions,
                keys[0], axis_name=axis, warmup=warmup, grid_key=grid_key,
                **kw)

        fn = shard_map(local_block, mesh=mesh,
                       in_specs=(rep, rep, rep, rep, rep, rep, P(axis), rep),
                       out_specs=(rep, rep, rep, rep))
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def call(params, opt_state, grid_state, images, poses, directions, keys,
             *, warmup):
        # replicated grid key derived deterministically from device 0's key
        grid_key = jax.random.fold_in(keys[0], 7)
        return compiled(bool(warmup))(params, opt_state, grid_state, images,
                                      poses, directions, keys, grid_key)

    def lower(params, opt_state, grid_state, images, poses, directions,
              keys, *, warmup):
        """jax.jit-style .lower for the sharded block — the multichip perf
        accounting (scripts/multichip_perf.py) parses the lowered StableHLO
        for collective volumes without running the program."""
        grid_key = jax.random.fold_in(keys[0], 7)
        return compiled(bool(warmup)).lower(
            params, opt_state, grid_state, images, poses, directions, keys,
            grid_key)

    call.lower = lower
    return call
