"""AR-insertion math tests: SH library, triple product, SG ops, shadow
fields, SG fitting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnerf_tpu.insert.sh_math import (
    sh9_basis, get_sh_coeff, get_sh_val, sh9_product, sh_product0,
    get_sphere_rays, get_cubemap_rays, sh2envmap, get_sh_main_direction)
from arnerf_tpu.insert.render_utils import (
    sh9_irradiance, irradiance_numerical, sg_product,
    sg_hemisphere_integral, sg_irradiance, cubemap_sample, sg_render_core,
    sh_render_core, get_f0)
from arnerf_tpu.insert.envfit import EnvOptim, sg2envmap, trans_raw_sg


def rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                       jnp.float32)


def test_sh9_orthonormality():
    d = rand_dirs(60000)
    Y = np.asarray(sh9_basis(d))
    G = Y.T @ Y / len(d) * 4 * np.pi
    assert np.allclose(G, np.eye(9), atol=0.08)


def test_sh_projection_roundtrip():
    """Projecting a band-limited function recovers its coefficients."""
    true_c = jnp.asarray(np.random.default_rng(1).normal(size=(9, 3)),
                         jnp.float32)
    d = get_sphere_rays(jax.random.PRNGKey(0), 1, 200000)[0]
    vals = get_sh_val(true_c, d)
    est = get_sh_coeff(d[None], vals[None])[0]
    assert np.allclose(np.asarray(est), np.asarray(true_c), atol=0.05)


def test_sh9_triple_product_matches_projection():
    """C_ijk a_i b_j must equal the SH projection of the pointwise product
    of the two band-limited functions."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(9,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(9,)), jnp.float32)
    prod_c = sh9_product(a[None], b[None])[0]
    # numerical projection of the product
    d = rand_dirs(200000, seed=3)
    Y = sh9_basis(d)
    fa = Y @ a
    fb = Y @ b
    proj = np.asarray(Y.T @ (fa * fb) * (4 * np.pi / len(d)))
    assert np.allclose(np.asarray(prod_c), proj, atol=0.05)


def test_sh_product0_is_dc_of_product():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(1, 9)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 9)), jnp.float32)
    full = sh9_product(a, b)[0, 0]
    dc = sh_product0(a, b)[0, 0]
    assert np.isclose(float(full), float(dc), rtol=0.02)


def test_sh9_irradiance_matches_numerical():
    rng = np.random.default_rng(5)
    shec = jnp.asarray(np.abs(rng.normal(size=(4, 9, 3))), jnp.float32)
    normals = rand_dirs(4, seed=6)
    closed = np.asarray(sh9_irradiance(normals, shec))
    d = get_sphere_rays(jax.random.PRNGKey(1), 1, 100000)[0]
    rgbs = jax.vmap(lambda c: get_sh_val(c, d))(shec)  # (4, n, 3)
    num = np.asarray(irradiance_numerical(
        rgbs, jnp.broadcast_to(d, (4, *d.shape)), normals))
    assert np.allclose(closed, num, rtol=0.1, atol=0.05)


def test_cubemap_rays_cover_sphere():
    dirs = np.asarray(get_cubemap_rays(1, 16)[0])
    assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # mean direction ~ 0 by symmetry
    assert np.abs(dirs.mean(0)).max() < 0.01


def test_cubemap_sample_constant_map():
    res = 16
    cm = jnp.ones((6, res, res, 3)) * jnp.asarray([0.2, 0.5, 0.8])
    d = rand_dirs(500, seed=7)
    out = np.asarray(cubemap_sample(cm, d, res, None, blur_cm=False))
    assert np.allclose(out, [0.2, 0.5, 0.8], atol=1e-4)


def test_cubemap_sample_face_selectivity():
    """A cubemap with face-constant colors must return each face's color for
    rays pointing at that face's center."""
    res = 8
    cols = np.arange(6, dtype=np.float32)[:, None, None, None]
    cm = jnp.broadcast_to(cols, (6, res, res, 3))
    # face order [+z, -z, +x, -x, +y, -y]
    probes = jnp.asarray([[0, 0, 1], [0, 0, -1], [1, 0, 0],
                          [-1, 0, 0], [0, 1, 0], [0, -1, 0]], jnp.float32)
    out = np.asarray(cubemap_sample(cm, probes, res, None, blur_cm=False))
    assert np.allclose(out[:, 0], np.arange(6), atol=1e-4)


def test_sg_product_pointwise():
    """SG product evaluated at directions equals the product of values."""
    rng = np.random.default_rng(8)
    sg1 = trans_raw_sg(jnp.asarray(rng.normal(size=(1, 7)), jnp.float32)
                       * jnp.asarray([1, 1, 1, 5, 1, 1, 1.0]))
    sg2 = trans_raw_sg(jnp.asarray(rng.normal(size=(1, 7)), jnp.float32)
                       * jnp.asarray([1, 1, 1, 8, 1, 1, 1.0]))
    prod = sg_product(sg1, sg2)
    d = rand_dirs(200, seed=9)

    def sg_eval(sg, d):
        return sg[:, None, -3:] * jnp.exp(
            sg[:, None, 3:4] * (jnp.sum(d[None] * sg[:, None, :3], -1,
                                        keepdims=True) - 1))

    v1 = sg_eval(sg1, d)
    v2 = sg_eval(sg2, d)
    vp = sg_eval(prod, d)
    assert np.allclose(np.asarray(vp), np.asarray(v1 * v2), rtol=1e-3,
                       atol=1e-5)


def test_sg_hemisphere_integral_total():
    """For a narrow SG centered on the normal, the hemisphere integral
    approaches the full-sphere SG integral 2*pi*mu/lambda*(1-e^-lambda)."""
    lam = 40.0
    sg = jnp.asarray([[0, 0, 1, lam, 1, 1, 1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    got = float(sg_hemisphere_integral(sg, n)[0, 0])
    full = 2 * np.pi / lam * (1 - np.exp(-lam))
    assert np.isclose(got, full, rtol=0.05)


def test_sg_irradiance_lambertian_sanity():
    """Very broad SG ~ constant light L: irradiance -> pi * L."""
    lam = 0.01
    L = 0.8
    sg = jnp.asarray([[[0, 0, 1, lam, L, L, L]]])  # (1, 1, 7)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    approx_const = L * np.exp(-lam)  # SG value averaged ~ L for tiny lambda
    irr = float(sg_irradiance(sg, n)[0, 0])
    assert np.isclose(irr, np.pi * approx_const, rtol=0.2)


def test_env_optim_fits_single_lobe():
    """EnvOptim must drive the reconstruction loss down on a 1-SG target."""
    target_sg = jnp.asarray([[0.0, 1.0, 0.0, 5.0, 1.0, 0.5, 0.2]])
    im = sg2envmap(target_sg, 32, 64)
    opt = EnvOptim(num_lgt_sgs=32, n_iter=100, key=jax.random.PRNGKey(3))
    fitted = opt.eval(im)
    recon = sg2envmap(fitted, 32, 64)
    err = float(jnp.mean((recon - im) ** 2))
    base = float(jnp.mean(im ** 2))
    assert err < 0.1 * base, (err, base)


def test_render_cores_shapes_and_range():
    n = 32
    rng = np.random.default_rng(10)
    albedo = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32)
    metal = jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.1, 0.9, (n, 1)), jnp.float32)
    normal = rand_dirs(n, 11)
    vdirs = -normal  # view along the normal
    sgs = trans_raw_sg(jnp.asarray(rng.normal(size=(16, 7)), jnp.float32))
    out = sg_render_core(albedo, metal, rough, normal, vdirs, sgs,
                         clamp01=True, self_shadow=False)
    assert out.shape == (n, 3)
    assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1

    shec = jnp.asarray(np.abs(rng.normal(size=(n, 9, 3))), jnp.float32)
    refl = jnp.ones((6 * 32 * 32, 3)) * 0.5
    out2 = sh_render_core(albedo, metal, rough, normal, vdirs, shec,
                          None, None, clamp01=True, refl_probe=refl,
                          only_spec=True)
    assert out2.shape == (n, 3)


def test_sphere_occlusion_sh():
    from arnerf_tpu.insert.shadow_fields import sphere_occlusion_sh9
    # far away: visibility ~ 1 everywhere -> DC ~ sqrt(4pi), others ~ 0
    far = sphere_occlusion_sh9(np.array([[100.0, 0, 0]]))
    assert np.isclose(far[0, 0], np.sqrt(4 * np.pi), atol=1e-2)
    assert np.abs(far[0, 1:]).max() < 1e-2
    # at distance 2: cap half-angle 30deg, solid angle 2pi(1-cos30)
    near = sphere_occlusion_sh9(np.array([[0.0, 0, 2.0]]))
    vis_frac_dc = near[0, 0] / np.sqrt(4 * np.pi)
    expected = 1 - (1 - np.cos(np.arcsin(0.5))) / 2
    assert np.isclose(vis_frac_dc, expected, atol=1e-3)
    # evaluate visibility toward the occluder (at -z from the point): ~0
    val = get_sh_val(jnp.asarray(near)[0][:, None] * jnp.ones((1, 3)),
                     jnp.asarray([[0.0, 0, -1.0]]))
    away = get_sh_val(jnp.asarray(near)[0][:, None] * jnp.ones((1, 3)),
                      jnp.asarray([[0.0, 0, 1.0]]))
    # band-2 SH can't hit 0 on a small cap, but occluded direction must be
    # clearly darker than the unoccluded one
    assert float(val[0, 0]) < 0.6 < float(away[0, 0])
    # close to the sphere (d=1.15 -> 60deg cap): strong occlusion
    close = sphere_occlusion_sh9(np.array([[0.0, 0, 1.15]]))
    val_c = get_sh_val(jnp.asarray(close)[0][:, None] * jnp.ones((1, 3)),
                       jnp.asarray([[0.0, 0, -1.0]]))
    assert float(val_c[0, 0]) < 0.25


def test_fh_table_properties():
    from arnerf_tpu.insert.sg_shadow import compute_fh_table
    tab = compute_fh_table(theta_num=64, lbd_num=32, zeta_num=64)
    assert tab.shape == (32, 64)
    assert np.all(tab >= 0)
    # monotone nondecreasing in theta_d (larger visible wedge)
    assert np.all(np.diff(tab, axis=1) >= -1e-5)
    # at theta_d = pi/2 the integral covers the full sphere band:
    # compare against direct quadrature for one lambda
    lbd = 10 ** np.linspace(-1, 4, 32)[5]
    zet = np.linspace(0, np.pi, 400)
    dlt = np.linspace(0, np.pi, 400)
    Z, D = np.meshgrid(zet, dlt, indexing="ij")
    f = np.exp(lbd * (np.sin(Z) * np.sin(D) - 1)) * np.sin(Z)
    ref = np.trapezoid(np.trapezoid(f, zet, axis=0), dlt)
    assert np.isclose(tab[5, -1], ref, rtol=0.05)
