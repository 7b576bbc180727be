"""Sharded hash-table (tensor/model) parallelism tests on the virtual mesh.

The TP mode (arnerf_tpu/parallel/tp.py) row-shards the hash table over the
model axis of a 2-D (data, model) mesh, all_gathers it on read, and relies
on JAX's all_gather transpose (psum_scatter) for the gradient. Its defining
property: a (dp, mp) run is numerically the same training process as a
dp*mp pure-DP run with the same per-device keys — only the table's storage
and gradient layout change.
"""

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.parallel import make_mesh
from arnerf_tpu.parallel.tp import (
    make_mesh_2d, pad_table, padded_rows, unpad_tree, pad_tree, TABLE_KEY)


def _setup(batch_size=64):
    from arnerf_tpu.models import NGPConfig
    from arnerf_tpu.training import TrainConfig
    from arnerf_tpu.training.losses import NeRFLossConfig
    from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig

    scfg = SyntheticConfig(img_wh=(16, 16), n_train=3, n_test=1,
                           gt_samples=32)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=12, base_resolution=4)
    tc = TrainConfig(batch_size=batch_size, num_epochs=1, steps_per_epoch=10,
                     warmup_steps=0, samples_per_ray_budget=16,
                     adaptive_budget=False,
                     loss=NeRFLossConfig(grid_scale=0.5))
    return cfg, tc, ds


def _trainer(cfg, tc, ds, mesh):
    from arnerf_tpu.training import NeRFTrainer
    tr = NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0), mesh=mesh)
    tr.on_train_start()
    return tr


def test_tp_matches_dp_exactly():
    """2x2 (data, model) block == 4-device pure-DP block: same keys, same
    grid update, same joined gradient means — params must agree to float
    tolerance (collectives only reorder the sums)."""
    cfg, tc, ds = _setup()
    te = cfg.hash_cfg.total_entries

    dp = _trainer(cfg, tc, ds, make_mesh(4))
    tp = _trainer(cfg, tc, ds, make_mesh_2d(2, 2))
    for _ in range(2):
        m_dp = dp.train_block()
        m_tp = tp.train_block()

    assert np.isfinite(float(m_dp["loss"])) and np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    t_dp = np.asarray(dp.params[TABLE_KEY])
    t_tp = np.asarray(tp.params[TABLE_KEY])[:te]
    # updates are ~lr-sized (1e-2); reduction reorder noise is ~1e-7
    np.testing.assert_allclose(t_tp, t_dp, atol=2e-5, rtol=1e-3)
    for k in dp.params:
        if k == TABLE_KEY:
            continue
        a = jax.tree.leaves(dp.params[k])
        b = jax.tree.leaves(tp.params[k])
        for la, lb in zip(a, b):
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       atol=2e-5, rtol=1e-3)


def test_tp_table_is_sharded_on_device():
    """The table (and its Adam moments) must actually live sharded: each
    device holds rows/mp, not a replica."""
    cfg, tc, ds = _setup()
    tp = _trainer(cfg, tc, ds, make_mesh_2d(2, 4))
    tp.train_block()
    t = tp.params[TABLE_KEY]
    padded = padded_rows(cfg.hash_cfg.total_entries, 4)
    assert t.shape[0] == padded
    shard_rows = {s.data.shape[0] for s in t.addressable_shards}
    assert shard_rows == {padded // 4}, shard_rows
    # optimizer moments follow the same sharding (ZeRO-style)
    mus = [l for l in jax.tree.leaves(tp.opt_state)
           if getattr(l, "shape", None) == t.shape]
    assert mus, "no table-shaped optimizer leaves found"
    for mu in mus:
        assert {s.data.shape[0] for s in mu.addressable_shards} \
            == {padded // 4}


def test_tp_ckpt_interchange(tmp_path):
    """A TP trainer's checkpoint must strip alignment padding so unsharded
    runs can load it, and a TP trainer must re-pad on load."""
    cfg, tc, ds = _setup()
    te = cfg.hash_cfg.total_entries
    tp = _trainer(cfg, tc, ds, make_mesh_2d(2, 4))
    tp.train_block()
    path = str(tmp_path / "tp.npz")
    tp.save(path)

    single = _trainer(cfg, tc, ds, None)
    single.load(path)
    assert single.params[TABLE_KEY].shape[0] == te
    np.testing.assert_allclose(
        np.asarray(single.params[TABLE_KEY]),
        np.asarray(tp.params[TABLE_KEY])[:te], rtol=1e-6)

    tp2 = _trainer(cfg, tc, ds, make_mesh_2d(2, 4))
    tp2.load(path)
    assert tp2.params[TABLE_KEY].shape[0] == padded_rows(te, 4)
    m = tp2.train_block()
    assert np.isfinite(float(m["loss"]))


def test_pad_unpad_tree_roundtrip():
    te, F, mp = 101, 2, 8
    tree = {"hash_table": jnp.arange(te * F, dtype=jnp.float32).reshape(te, F),
            "other": jnp.ones((3, 5))}
    padded = pad_tree(tree, te, F, mp)
    assert padded["hash_table"].shape[0] == padded_rows(te, mp)
    assert np.all(np.asarray(padded["hash_table"])[te:] == 0)
    back = unpad_tree(padded, te, F, mp)
    np.testing.assert_array_equal(np.asarray(back["hash_table"]),
                                  np.asarray(tree["hash_table"]))
    np.testing.assert_array_equal(np.asarray(back["other"]),
                                  np.asarray(tree["other"]))
