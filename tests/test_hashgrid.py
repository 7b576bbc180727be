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


def test_custom_vjp_matches_autodiff_of_forward():
    """The scatter-free custom backward must equal raw autodiff of the
    forward implementation for BOTH cotangents (x-grad feeds
    render_surface_normal; table-grad feeds training)."""
    from arnerf_tpu.ops.hashgrid import _encode_fwd_impl
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    # include points at/near the [0,1] clamp boundary
    x = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(1), (64, 3)),
        jnp.asarray([[0.0, 0.5, 1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]),
    ])
    g = jax.random.normal(jax.random.PRNGKey(2), (x.shape[0], cfg.out_dim))

    def loss_custom(t, xx):
        return jnp.vdot(hashgrid_encode(t, xx, cfg), g)

    def loss_raw(t, xx):
        return jnp.vdot(_encode_fwd_impl(t, xx, cfg), g)

    gt_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(tab, x)
    gt_r, gx_r = jax.grad(loss_raw, argnums=(0, 1))(tab, x)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_r),
                               atol=1e-5, rtol=1e-4)
    # raw autodiff x-grad at exact boundary can keep the clip's one-sided
    # derivative; interior points must agree tightly
    np.testing.assert_allclose(np.asarray(gx_c[:64]), np.asarray(gx_r[:64]),
                               atol=1e-5, rtol=1e-4)


def test_custom_vjp_sort_path_matches_scatter_path():
    """Force the sort-based segment sum (the TPU path) on CPU and compare
    the table cotangent against the scatter path."""
    from arnerf_tpu.ops import hashgrid as hg
    from arnerf_tpu.ops.segments import dense_segment_sum
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (512, cfg.out_dim))

    flat, cw, _ = hg._indices_weights(x, cfg)
    w = cw[0] * cw[1] * cw[2]
    gr = g.reshape(512, cfg.n_levels, cfg.n_features)
    upd = (w[..., None] * gr[:, :, None, :]).reshape(-1, cfg.n_features)
    a = dense_segment_sum(flat.reshape(-1), upd, cfg.total_entries,
                          method="sort")
    b = dense_segment_sum(flat.reshape(-1), upd, cfg.total_entries,
                          method="scatter")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_position_gradient_finite_difference():
    """Trilerp is piecewise LINEAR, so for points safely interior to their
    cell at EVERY level a finite difference that stays inside the cell is
    exact. (A naive FD at random points secants across cell boundaries,
    where the gradient is discontinuous — fp64 check confirmed the analytic
    gradient, not the naive FD.)"""
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg) * 100.0  # visible signal
    scales = np.asarray(cfg.scales)

    cand = np.random.default_rng(0).uniform(0.1, 0.9, size=(4000, 3))
    frac = (cand[:, None, :] * scales[None, :, None] + 0.5) % 1.0
    ok = (np.abs(frac - 0.5) < 0.35).all(axis=(1, 2))
    x = jnp.asarray(cand[ok][:8], jnp.float32)
    assert x.shape[0] == 8

    g = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.out_dim))

    def loss(xx):
        return jnp.vdot(hashgrid_encode(tab, xx, cfg), g)

    gx = jax.grad(loss)(x)
    v = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    v = v / jnp.max(jnp.abs(v))
    eps = 0.1 / scales.max()          # stays within every level's cell
    fd = (loss(x + eps * v) - loss(x - eps * v)) / (2 * eps)
    an = float(jnp.vdot(gx, v))
    # rtol covers fp32 roundoff in the loss difference (measured ~2e-3);
    # a wrong gradient (sign/scale/boundary-mask error) is far outside it
    assert np.isclose(float(fd), an, rtol=1e-2, atol=1e-4), (float(fd), an)


# --------------------------------------------------------------------------
# Stochastic-corner estimator (ops/hashgrid.py _encode_stoch)
# --------------------------------------------------------------------------


def test_stoch_encode_shapes_and_seed_determinism():
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    s = jnp.uint32(7)
    a = hashgrid_encode(tab, x, cfg, seed=s)
    b = hashgrid_encode(tab, x, cfg, seed=s)
    c = hashgrid_encode(tab, x, cfg, seed=jnp.uint32(8))
    assert a.shape == (128, cfg.out_dim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_stoch_expectation_matches_trilerp():
    """Mean over seeds of the single-corner estimator converges to the
    exact trilinear encode (unbiasedness — the whole point of the design)."""
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg) * 1000.0
    # interior points only: in the outermost cell sliver (pos > res-1, where
    # i0 clamps to res-2 and frac > 1) the exact path linearly EXTRAPOLATES
    # with a negative corner-0 weight, which no probability sampler can
    # represent — there the stochastic path saturates to the boundary vertex
    # instead (documented in ops/hashgrid.py)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                           minval=0.05, maxval=0.8)
    exact = np.asarray(hashgrid_encode(tab, x, cfg))

    n_seeds = 2000
    f = jax.jit(lambda s: hashgrid_encode(tab, x, cfg, seed=s))
    acc = np.zeros_like(exact, dtype=np.float64)
    sq = np.zeros_like(exact, dtype=np.float64)
    for s in range(n_seeds):
        v = np.asarray(f(jnp.uint32(s * 2654435761 % (1 << 32))))
        acc += v
        sq += v.astype(np.float64) ** 2
    mean = acc / n_seeds
    std = np.sqrt(np.maximum(sq / n_seeds - mean ** 2, 0.0))
    sem = std / np.sqrt(n_seeds) + 1e-6
    z = np.abs(mean - exact) / sem
    # 64*4*2=512 entries; allow 5-sigma outliers nowhere, mean z modest
    assert z.max() < 6.0, z.max()
    assert z.mean() < 1.5, z.mean()


def test_stoch_corner_probabilities_match_weights():
    """Per-axis +1-corner selection frequency must equal frac (the trilinear
    weight factor) — checked through the encode of an axis-indicator table."""
    # single dense level; vertex (i,j,k) stores [i, j] so the encode's
    # outputs directly reveal which x/y corner was picked
    cfg = HashGridConfig(n_levels=1, n_features=2, log2_hashmap_size=12,
                         base_resolution=4, per_level_scale=2.0)
    R = cfg.resolutions[0]
    tab = np.zeros((cfg.total_entries, 2), np.float32)
    for k in range(R):
        for j in range(R):
            for i in range(R):
                tab[i + j * R + k * R * R] = [i, j]
    tab = jnp.asarray(tab)
    s0 = cfg.scales[0]
    x = jnp.asarray([[1.3 / s0, 2.2 / s0, 1.0 / s0]], jnp.float32)
    pos = np.asarray(x) * s0 + 0.5  # fracs: .8, .7, .5 (x,y,z)
    frac = pos - np.floor(pos)

    f = jax.jit(lambda s: hashgrid_encode(tab, x, cfg, seed=s))
    n_seeds = 4000
    picks = np.stack([np.asarray(f(jnp.uint32(s))) for s in range(n_seeds)])
    base = np.floor(pos)[0]
    px = (picks[:, 0, 0] - base[0]).mean()   # frequency of +1 in x
    py = (picks[:, 0, 1] - base[1]).mean()
    se = 1.0 / np.sqrt(n_seeds)
    assert abs(px - frac[0, 0]) < 4 * se, (px, frac[0, 0])
    assert abs(py - frac[0, 1]) < 4 * se, (py, frac[0, 1])


def test_stoch_table_gradient_matches_manual_accumulation():
    """Fixed seed: custom-VJP d_table == one-hot accumulation of the output
    cotangent into the sampled rows (computed in numpy from the same
    indices)."""
    from arnerf_tpu.ops import hashgrid as hg
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (256, cfg.out_dim))
    seed = jnp.uint32(1234)

    def loss(t):
        return jnp.vdot(hashgrid_encode(t, x, cfg, seed=seed), g)

    d_tab = np.asarray(jax.grad(loss)(tab))

    flat = np.asarray(hg._stoch_indices(x, seed, cfg))       # (N, L)
    gr = np.asarray(g).reshape(256, cfg.n_levels, cfg.n_features)
    ref = np.zeros((cfg.total_entries, cfg.n_features), np.float64)
    for n in range(256):
        for l in range(cfg.n_levels):
            ref[flat[n, l]] += gr[n, l]
    np.testing.assert_allclose(d_tab, ref, atol=1e-4, rtol=1e-4)


def test_stoch_position_gradient_is_zero():
    """The sampled forward is piecewise-constant in x; the VJP must return
    exactly zero for x (callers needing d_x use the exact path)."""
    cfg = small_cfg()
    tab = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (32, cfg.out_dim))

    def loss(xx):
        return jnp.vdot(hashgrid_encode(tab, xx, cfg, seed=jnp.uint32(5)), g)

    gx = np.asarray(jax.grad(loss)(x))
    assert (gx == 0).all()
