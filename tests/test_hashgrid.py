"""Hash-grid encoding tests: trilinear exactness, hashing, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_init, hashgrid_encode, ngp_growth_factor)


def small_cfg():
    return HashGridConfig(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)


def test_level_layout():
    cfg = small_cfg()
    # level scales: 4*2^l - 1 -> resolutions ceil(scale)+1 = 4, 8, 16, 32
    assert cfg.resolutions == (4, 8, 16, 32)
    # dense sizes 64, 512, 4096 <= 1024 only for first two -> hashed after
    assert cfg.hashed == (False, False, True, True)
    assert cfg.total_entries == 64 + 512 + 1024 + 1024


def test_default_ngp_config_matches_reference():
    b = ngp_growth_factor(0.5)  # reference: models/networks.py:34 with scale=0.5
    assert np.isclose(b, np.exp(np.log(2048 * 0.5 / 16) / 15))
    cfg = HashGridConfig(per_level_scale=b)
    assert cfg.n_levels == 16 and cfg.out_dim == 32
    # finest level resolution ~ 1024
    assert 1000 <= cfg.resolutions[-1] <= 1060


def test_trilinear_exactness_on_dense_level():
    """A table whose vertices store a linear function of position must be
    reproduced exactly by trilinear interpolation."""
    cfg = HashGridConfig(n_levels=1, n_features=2, log2_hashmap_size=12,
                         base_resolution=4, per_level_scale=2.0)
    R = cfg.resolutions[0]
    s = cfg.scales[0]
    # vertex (i,j,k) stores [i + 2j + 3k, 1]
    tab = np.zeros((cfg.total_entries, 2), np.float32)
    for k in range(R):
        for j in range(R):
            for i in range(R):
                tab[i + j * R + k * R * R] = [i + 2 * j + 3 * k, 1.0]
    rng = np.random.default_rng(3)
    # keep pos = x*s + 0.5 within [1, R-2] so no boundary clamping
    x = rng.uniform(0.5 / s, (R - 2.5) / s, size=(64, 3)).astype(np.float32)
    out = np.asarray(hashgrid_encode(jnp.asarray(tab), jnp.asarray(x), cfg))
    pos = x * s + 0.5
    expected = pos[:, 0] + 2 * pos[:, 1] + 3 * pos[:, 2]
    assert np.allclose(out[:, 0], expected, atol=1e-4)
    assert np.allclose(out[:, 1], 1.0, atol=1e-6)


def test_encode_shapes_and_determinism():
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    out = hashgrid_encode(tab, x, cfg)
    assert out.shape == (128, cfg.out_dim)
    out2 = hashgrid_encode(tab, x, cfg)
    assert np.array_equal(np.asarray(out), np.asarray(out2))
    # init range
    assert float(jnp.max(jnp.abs(tab))) <= 1e-4


def test_gradients_flow_to_table_and_positions():
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.1, maxval=0.9)

    def loss(t, xx):
        return jnp.sum(hashgrid_encode(t, xx, cfg) ** 2)

    gt, gx = jax.grad(loss, argnums=(0, 1))(tab, x)
    assert float(jnp.sum(jnp.abs(gt))) > 0
    assert gx.shape == x.shape
    # finite-difference check on the table along a random direction
    v = jax.random.normal(jax.random.PRNGKey(2), tab.shape)
    eps = 1e-3
    fd = (loss(tab + eps * v, x) - loss(tab - eps * v, x)) / (2 * eps)
    an = jnp.vdot(gt, v)
    assert np.isclose(float(fd), float(an), rtol=1e-2, atol=1e-5)
