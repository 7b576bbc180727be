"""Fused field-head Pallas kernel (ops/fused_head.py) vs the plain-XLA
formulation — interpret mode on CPU (SURVEY §7 step 1 / VERDICT r1 #5).
Reference parity target: tinycudann FullyFusedMLP pair
(reference models/networks.py:50-78)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.models import NGPConfig, ngp_init
from arnerf_tpu.models.ngp import ngp_forward
from arnerf_tpu.ops.fused_head import (fused_field_head, _head_xla,
                                       head_weights_from_params, BLOCK_N)

CFG = NGPConfig(scale=0.5, grid_size=32, n_levels=4, log2_hashmap_size=12,
                base_resolution=4)
CFG_FUSED = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                      log2_hashmap_size=12, base_resolution=4,
                      fused_head=True)


@pytest.fixture(scope="module")
def params():
    return ngp_init(jax.random.PRNGKey(0), CFG)


def _inputs(n, key=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    feats = jax.random.normal(k1, (n, CFG.hash_cfg.out_dim)) * 0.5
    sh = jax.random.normal(k2, (n, 16)) * 0.5
    return feats, sh


def test_fused_head_matches_xla_fp32(params):
    w = head_weights_from_params(params)
    for n in (8, BLOCK_N, BLOCK_N + 3):   # incl. non-multiple-of-block
        feats, sh = _inputs(n)
        h_k, rgb_k = fused_field_head(feats, sh, w, jnp.float32, True)
        h_x, rgb_x = _head_xla(feats, sh, w, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_x),
                                   rtol=1e-5, atol=1e-6)


def test_fused_head_matches_xla_bf16(params):
    w = head_weights_from_params(params)
    feats, sh = _inputs(64)
    h_k, rgb_k = fused_field_head(feats, sh, w, jnp.bfloat16, True)
    h_x, rgb_x = _head_xla(feats, sh, w, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x, np.float32),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(rgb_k),
                               np.asarray(rgb_x, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_fused_head_gradients(params):
    """custom_vjp backward (XLA recompute) vs autodiff through _head_xla."""
    w = head_weights_from_params(params)
    feats, sh = _inputs(32, key=5)

    def loss_fused(f, s, ws):
        h, rgb = fused_field_head(f, s, ws, jnp.float32, True)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(rgb))

    def loss_xla(f, s, ws):
        h, rgb = _head_xla(f, s, ws, dtype=jnp.float32)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(rgb))

    g_k = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, sh, w)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(feats, sh, w)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_ngp_forward_fused_matches_plain(params):
    x = jax.random.uniform(jax.random.PRNGKey(3), (100, 3),
                           minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(4), (100, 3))
    s_plain, rgb_plain = ngp_forward(params, x, d, CFG)
    s_fused, rgb_fused = ngp_forward(params, x, d, CFG_FUSED)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_plain),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_fused), np.asarray(rgb_plain),
                               rtol=1e-4, atol=1e-6)
    # gradients flow to every parameter group through the fused path
    g = jax.grad(lambda p: float(0) + jnp.sum(
        ngp_forward(p, x, d, CFG_FUSED)[1]))(params)
    assert float(jnp.sum(jnp.abs(g["hash_table"]))) > 0
    assert float(jnp.sum(jnp.abs(g["sigma_mlp"][0]))) > 0
    assert float(jnp.sum(jnp.abs(g["rgb_mlp"][0]))) > 0
