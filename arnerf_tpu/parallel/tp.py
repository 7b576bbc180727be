"""Sharded hash-table parallelism (the SURVEY §2.6 stretch goal).

The reference's only parallelism is data-parallel DDP (reference
train.py:286-291); its parameters — dominated by the ~12M-entry hash table
(reference models/networks.py:37-57 via tinycudann) — are replicated on
every GPU. On a TPU mesh the idiomatic generalization is a 2-D
``(data, model)`` mesh where the hash table (99% of the parameters and of
the Adam state) is ROW-SHARDED over the ``model`` axis, ZeRO-3 style:

- **read**: each step ``lax.all_gather``\\ s the table shards over ICI
  (~48 MB f32 — microseconds on a v5e ring) so the gather-heavy encode
  runs on a locally materialized full table;
- **grad**: JAX transposes that all_gather into a ``psum_scatter``
  automatically, so each device receives exactly its shard's gradient,
  already summed over the model axis — no hand-written collective;
- **state**: Adam's mu/nu for the table are born sharded, cutting
  per-chip optimizer+param memory for the table by the model-axis size
  (the enabler for scaling ``log2_hashmap_size`` past single-chip HBM).

Every device (on both axes) still draws its own ray batch, so the
effective batch is ``n_devices * batch_size`` exactly as in DP; a
``(dp, mp)`` run is numerically identical to a ``dp*mp`` pure-DP run with
the same per-device keys (pinned by tests/test_tp.py).

Semantics of the gradient join: pure DP takes ``pmean`` over all devices.
Here non-table leaves take ``pmean`` over both axes; the table cotangent
arrives as the mp-axis SUM of per-device grads restricted to the local
shard (the all_gather transpose), so dividing by the mp size and
``pmean``-ing over the data axis reproduces the same all-device mean.
"""

from functools import lru_cache, partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .dp import shard_map

TABLE_KEY = "hash_table"


def make_mesh_2d(n_dp: int, n_mp: int, axis_names=("data", "model")) -> Mesh:
    devs = np.asarray(jax.devices()[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(devs, axis_names)


def padded_rows(n_rows: int, n_mp: int) -> int:
    return -(-n_rows // n_mp) * n_mp


def pad_table(params: dict, n_mp: int) -> dict:
    """Pad the hash table's row count to a multiple of the model-axis size
    (shard_map needs equal shards). Padding rows sit past every level
    offset so the encode never reads them; their grads are identically
    zero, so Adam leaves them at zero."""
    t = params[TABLE_KEY]
    pad = padded_rows(t.shape[0], n_mp) - t.shape[0]
    if pad == 0:
        return params
    return {**params, TABLE_KEY: jnp.pad(t, ((0, pad), (0, 0)))}


def unpad_table(params: dict, total_entries: int) -> dict:
    t = params[TABLE_KEY]
    if t.shape[0] == total_entries:
        return params
    return {**params, TABLE_KEY: t[:total_entries]}


def unpad_tree(tree, total_entries: int, n_features: int, n_mp: int):
    """Strip model-axis alignment padding from every leaf shaped like the
    padded table (params AND optimizer mu/nu trees)."""
    padded = (padded_rows(total_entries, n_mp), n_features)

    def f(leaf):
        if getattr(leaf, "shape", None) == padded:
            return leaf[:total_entries]
        return leaf

    return jax.tree.map(f, tree)


def pad_tree(tree, total_entries: int, n_features: int, n_mp: int):
    """Inverse of unpad_tree: re-align table-shaped leaves to the mesh."""
    pad = padded_rows(total_entries, n_mp) - total_entries
    if pad == 0:
        return tree

    def f(leaf):
        if getattr(leaf, "shape", None) == (total_entries, n_features):
            return jnp.pad(leaf, ((0, pad), (0, 0)))
        return leaf

    return jax.tree.map(f, tree)


class TableSharding(NamedTuple):
    """Handler threaded through train_step_impl: expands the local table
    shard for the forward and joins gradients respecting the sharding."""
    dp_axis: str
    mp_axis: str
    n_mp: int
    total_entries: int

    @property
    def axes(self):
        return (self.dp_axis, self.mp_axis)

    def expand(self, params: dict) -> dict:
        """Local (rows/n_mp, F) shard -> full (total_entries, F) table.
        The slice drops alignment padding; its transpose re-pads the
        cotangent with zeros, and all_gather's transpose is psum_scatter —
        so autodiff delivers the reduce-scattered shard gradient."""
        full = jax.lax.all_gather(params[TABLE_KEY], self.mp_axis,
                                  axis=0, tiled=True)
        return {**params, TABLE_KEY: full[: self.total_entries]}

    def join_grads(self, grads: dict) -> dict:
        g = dict(grads)
        t = g.pop(TABLE_KEY)  # already mp-summed by the all_gather transpose
        g = jax.lax.pmean(g, self.axes)
        g[TABLE_KEY] = jax.lax.pmean(t, self.dp_axis) / self.n_mp
        return g


def _tp_specs(params, opt_state, tp: TableSharding):
    """PartitionSpec pytrees: the table leaf (and the optimizer leaves that
    mirror its padded shape — Adam's mu/nu) shard over the model axis,
    everything else replicates."""
    t_shape = params[TABLE_KEY].shape

    def spec_of(leaf):
        return (P(tp.mp_axis)
                if getattr(leaf, "shape", None) == t_shape else P())

    return (jax.tree.map(spec_of, params), jax.tree.map(spec_of, opt_state))


def make_tp_train_block(mesh: Mesh, train_block_impl, kw, params, opt_state,
                        total_entries: int):
    """Fused [grid update + N steps] block over a 2-D (data, model) mesh.

    Mirrors parallel.dp.make_dp_train_block; the table/optimizer specs are
    derived from host templates once (shapes are static across the run)."""
    dp_axis, mp_axis = mesh.axis_names
    n_mp = mesh.shape[mp_axis]
    tp = TableSharding(dp_axis, mp_axis, n_mp, total_entries)
    pspec, ospec = _tp_specs(params, opt_state, tp)
    rep = P()
    keys_spec = P((dp_axis, mp_axis))  # one private key per device

    @lru_cache(maxsize=None)
    def compiled(warmup: bool):
        def local_block(params, opt_state, grid_state, images, poses,
                        directions, keys, grid_key):
            return train_block_impl(
                params, opt_state, grid_state, images, poses, directions,
                keys[0], axis_name=tp.axes, warmup=warmup, grid_key=grid_key,
                tp=tp, **kw)

        fn = shard_map(
            local_block, mesh=mesh,
            in_specs=(pspec, ospec, rep, rep, rep, rep, keys_spec, rep),
            out_specs=(pspec, ospec, rep, rep))
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def call(params, opt_state, grid_state, images, poses, directions, keys,
             *, warmup):
        grid_key = jax.random.fold_in(keys[0], 7)
        return compiled(bool(warmup))(params, opt_state, grid_state, images,
                                      poses, directions, keys, grid_key)

    return call


def make_tp_train_step(mesh: Mesh, train_step_impl, kw, params, opt_state,
                       total_entries: int):
    dp_axis, mp_axis = mesh.axis_names
    n_mp = mesh.shape[mp_axis]
    tp = TableSharding(dp_axis, mp_axis, n_mp, total_entries)
    pspec, ospec = _tp_specs(params, opt_state, tp)
    rep = P()
    fn = partial(train_step_impl, axis_name=tp.axes, tp=tp, **kw)

    def local_step(params, opt_state, grid_state, images, poses, directions,
                   keys, step):
        return fn(params, opt_state, grid_state, images, poses, directions,
                  keys[0], step)

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, ospec, rep, rep, rep, rep, P((dp_axis, mp_axis)),
                  rep),
        out_specs=(pspec, ospec, rep))
    return jax.jit(mapped, donate_argnums=(0, 1))
