"""PBR shading cores (SH and Spherical-Gaussian paths) + cubemap sampling.
Rebuilt from reference insert/render_utils.py, jit-friendly throughout:
the reference's boolean-mask branches (per-face cubemap scatter, rough/smooth
specular split) become gather/where selects so everything compiles to fixed
shapes on TPU.

SG format matches the reference: 7 floats = [axis(3), lambda(1), mu/rgb(3)].
"""

import numpy as np
import jax
import jax.numpy as jnp

EPS = 1e-6


def pos_dot(v1, v2):
    return jax.nn.relu(jnp.sum(v1 * v2, axis=-1, keepdims=True))


def pos_dot_eps(v1, v2):
    return jnp.clip(jnp.sum(v1 * v2, axis=-1, keepdims=True), min=EPS)


def sh9_irradiance(normals, shec, allow_neg=False):
    """Closed-form irradiance from SH9 (Ramamoorthi-Hanrahan constants;
    reference render_utils.py:19-35). normals (x,3), shec (x,9,3)."""
    c1 = 0.42904276540489171563379376569857
    c2 = 0.51166335397324424423977581244463
    c3 = 0.24770795610037568833406429782001
    c4 = 0.88622692545275801364908374167057
    x = normals[:, 0:1]
    y = normals[:, 1:2]
    z = normals[:, 2:3]
    irr = (c1 * (x ** 2 - y ** 2) * shec[:, 8]
           + c3 * (3.0 * z ** 2 - 1.0) * shec[:, 6]
           + c4 * shec[:, 0]
           + 2.0 * c1 * (shec[:, 4] * x * y + shec[:, 7] * x * z
                         + shec[:, 5] * y * z)
           + 2.0 * c2 * (shec[:, 3] * x + shec[:, 1] * y + shec[:, 2] * z))
    return irr if allow_neg else jax.nn.relu(irr)


def irradiance_numerical(rgbs, rays_d, normals, allow_neg=False):
    """MC cosine-weighted irradiance (reference render_utils.py:42-48).
    rgbs, rays_d: (x, c, 3), normals: (x, 3)."""
    d_dot_n = pos_dot(rays_d, normals[:, None, :])
    inte = jnp.sum(d_dot_n * rgbs, axis=1) * (4 * jnp.pi / rays_d.shape[1])
    return inte if allow_neg else jax.nn.relu(inte)


def get_f0(metal, albedo):
    return 0.04 * (1.0 - metal) * jnp.ones_like(albedo) + albedo * metal


def fresnel_schlick(F0, HdotV):
    return F0 + (1.0 - F0) * (1.0 - HdotV) ** 5


def fresnel_schlick_roughness(F0, NdotV, rough):
    return F0 + (jnp.maximum(jnp.broadcast_to(1.0 - rough, F0.shape), F0)
                 - F0) * (1.0 - NdotV) ** 5


def geometry_schlick_ggx(NdotV, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return NdotV / (NdotV * (1.0 - k) + k)


def geometry_blender(NdotV, roughness):
    a = roughness ** 2
    sqr = a * jnp.clip(1.0 / NdotV ** 2 - 1.0, min=0.0)
    return 0.5 * (jnp.sqrt(1.0 + sqr) - 1.0)


# ---------------------------------------------------------------------------
# texture sampling (torch grid_sample semantics: align_corners=False, border)
# ---------------------------------------------------------------------------

def tex2d(tex, samples):
    """Bilinear sample. tex: (H, W, C); samples: (x, 2) in [-1, 1] as
    (x_coord -> W axis, y_coord -> H axis)."""
    H, W = tex.shape[:2]
    gx = ((samples[:, 0] + 1.0) * W - 1.0) / 2.0
    gy = ((samples[:, 1] + 1.0) * H - 1.0) / 2.0

    def fetch(iy, ix):
        iy = jnp.clip(iy, 0, H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        return tex[iy, ix]

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    return ((1 - fx) * (1 - fy) * fetch(y0, x0)
            + fx * (1 - fy) * fetch(y0, x0 + 1)
            + (1 - fx) * fy * fetch(y0 + 1, x0)
            + fx * fy * fetch(y0 + 1, x0 + 1))


def tex3d(vol, samples):
    """Trilinear sample. vol: (D, H, W, C); samples: (x, 3) as
    (x->W, y->H, z->D) in [-1, 1]."""
    D, H, W = vol.shape[:3]
    gx = ((samples[:, 0] + 1.0) * W - 1.0) / 2.0
    gy = ((samples[:, 1] + 1.0) * H - 1.0) / 2.0
    gz = ((samples[:, 2] + 1.0) * D - 1.0) / 2.0

    def fetch(iz, iy, ix):
        iz = jnp.clip(iz, 0, D - 1)
        iy = jnp.clip(iy, 0, H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        return vol[iz, iy, ix]

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    fz = (gz - z0)[:, None]
    out = 0.0
    for dz in (0, 1):
        wz = fz if dz else 1 - fz
        for dy in (0, 1):
            wy = fy if dy else 1 - fy
            for dx in (0, 1):
                wx = fx if dx else 1 - fx
                out = out + wz * wy * wx * fetch(z0 + dz, y0 + dy, x0 + dx)
    return out


def _gaussian_blur_3x3(img):
    """Separable 3x3 gaussian (sigma per torchvision default for k=3),
    reflect-free 'same' padding via edge clamp. img: (H, W, C)."""
    sigma = 0.8  # torchvision: 0.3*((k-1)*0.5 - 1) + 0.8 = 0.8 for k=3
    x = np.array([-1.0, 0.0, 1.0])
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    k = jnp.asarray(k, img.dtype)

    def along(im, axis):
        pad = [(0, 0)] * im.ndim
        pad[axis] = (1, 1)
        imp = jnp.pad(im, pad, mode="edge")
        sl = [slice(None)] * im.ndim
        out = 0.0
        for i in range(3):
            s = list(sl)
            s[axis] = slice(i, i + im.shape[axis])
            out = out + k[i] * imp[tuple(s)]
        return out

    return along(along(img, 0), 1)


def cubemap_blur(cubemap):
    """Blur each face (cubemap: (6, r, r, 3))."""
    return jax.vmap(_gaussian_blur_3x3)(cubemap)


# face order [+z, -z, +x, -x, +y, -y]; axis -> first face of its pair
_AXIS_FACE = np.array([2, 4, 0])       # x->2/3, y->4/5, z->0/1
# uv source components per major axis (reference sel_mask)
_AXIS_UV = np.array([[1, 2], [0, 2], [0, 1]])


def _cube_face_uv(ray_d):
    """Vectorized face selection + uv in [-1,1] (replaces the reference's
    per-face boolean masking, render_utils.py:133-164)."""
    a = jnp.abs(ray_d)
    major = jnp.argmax(a, axis=-1)                         # (n,)
    max_ax = jnp.take_along_axis(a, major[:, None], axis=-1)
    d = ray_d / max_ax
    sign = jnp.take_along_axis(ray_d, major[:, None], axis=-1)[:, 0] < 0
    face = jnp.asarray(_AXIS_FACE)[major] + sign.astype(jnp.int32)
    uv_idx = jnp.asarray(_AXIS_UV)[major]                  # (n, 2)
    uv = jnp.take_along_axis(d, uv_idx, axis=-1)           # (n, 2)
    return face, uv


def cubemap_sample(cubemap, ray_d, resolution, rough=None, blur_cm=True):
    """Sample a cubemap along directions, optionally with a roughness-indexed
    blur chain (reference render_utils.py:117-167).

    cubemap: (6*r*r, 3) or (6, r, r, 3); ray_d: (n, 3); rough: (n, 1) in
    [0, 1] selecting among 5 progressively blurred mips."""
    cm = cubemap.reshape(6, resolution, resolution, 3)
    face, uv = _cube_face_uv(ray_d)
    # NOTE reference samples with (v,u) swapped via reverseHW=True
    uv_swapped = uv[:, ::-1]

    if rough is None:
        if blur_cm:
            cm = cubemap_blur(cubemap_blur(cm))
        # gather the right face per ray then bilinear-sample it:
        # fold face into a single stacked texture by offsetting the row index
        tall = cm.reshape(6 * resolution, resolution, 3)
        H = resolution
        gy = ((uv_swapped[:, 1] + 1.0) * H - 1.0) / 2.0
        gy = jnp.clip(gy, 0.0, H - 1.0) + face.astype(jnp.float32) * H
        gx = ((uv_swapped[:, 0] + 1.0) * resolution - 1.0) / 2.0
        return _bilinear_rows(tall, gy, gx, H, face)

    # roughness chain: 5 mips, trilinear over (mip, v, u)
    mips = [cm]
    for _ in range(4):
        mips.append(cubemap_blur(mips[-1]))
    stack = jnp.stack(mips, 0)                             # (5, 6, r, r, 3)
    level = jnp.clip(rough[:, 0], 0.0, 1.0) * 4.0
    l0 = jnp.floor(level).astype(jnp.int32)
    fl = (level - l0)[:, None]
    lo = _sample_mip(stack, l0, face, uv_swapped, resolution)
    hi = _sample_mip(stack, jnp.minimum(l0 + 1, 4), face, uv_swapped,
                     resolution)
    return (1 - fl) * lo + fl * hi


def _bilinear_rows(tall, gy, gx, H, face):
    """Bilinear fetch from a vertically stacked face texture with the y
    interpolation clamped within the selected face."""
    W = tall.shape[1]
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    fy = (gy - y0)[:, None]
    fx = (gx - x0)[:, None]
    y_lo = face * H
    y_hi = y_lo + H - 1

    def fetch(iy, ix):
        iy = jnp.clip(iy, y_lo, y_hi)
        ix = jnp.clip(ix, 0, W - 1)
        return tall[iy, ix]

    return ((1 - fx) * (1 - fy) * fetch(y0, x0)
            + fx * (1 - fy) * fetch(y0, x0 + 1)
            + (1 - fx) * fy * fetch(y0 + 1, x0)
            + fx * fy * fetch(y0 + 1, x0 + 1))


def _sample_mip(stack, lvl, face, uv, r):
    """stack: (5, 6, r, r, 3); per-ray (lvl, face) select + bilinear uv."""
    flat = stack.reshape(5 * 6 * r, r, 3)
    H = r
    gy = ((uv[:, 1] + 1.0) * H - 1.0) / 2.0
    gy = jnp.clip(gy, 0.0, H - 1.0)
    gx = ((uv[:, 0] + 1.0) * r - 1.0) / 2.0
    row_face = lvl * 6 + face
    gy_abs = gy + row_face.astype(jnp.float32) * H
    return _bilinear_rows(flat, gy_abs, gx, H, row_face)


def cubemap2env_map(cubemap, cm_resol, H, W):
    """Lat-long env map from a cubemap (reference render_utils.py:173-189)."""
    phi, theta = jnp.meshgrid(jnp.linspace(0.0, np.pi, H),
                              jnp.linspace(-0.5 * np.pi, 1.5 * np.pi, W),
                              indexing="ij")
    dirs = jnp.stack([jnp.cos(theta) * jnp.sin(phi), jnp.cos(phi),
                      jnp.sin(theta) * jnp.sin(phi)], -1).reshape(-1, 3)
    return cubemap_sample(cubemap, dirs, cm_resol, None, False).reshape(H, W, 3)


def reflect_dir(normal, vdirs):
    return jnp.sum(normal * vdirs, -1, keepdims=True) * normal * 2 - vdirs


def spec_shade(normal, vdirs, rough, kS, refl_probe):
    ray_refl = reflect_dir(normal, vdirs)
    return kS * cubemap_sample(refl_probe, ray_refl, 32, rough)


def sh_glossy_shade(normal, vdirs, rough, model_brdf, embed_fn, sh9, F0):
    """Neural-BRDF glossy term: an MLP predicts two SH9 filter banks whose
    dot with the light SH gives F0-scaled and additive specular colors
    (reference render_utils.py:199-210)."""
    inp = jnp.concatenate([embed_fn(normal), embed_fn(vdirs), rough], -1)
    spec = model_brdf(inp)                                 # (x, 18)
    sh_num = sh9.shape[1]
    s1 = jnp.sum(sh9 * spec[:, :sh_num, None], axis=1)
    s2 = jnp.sum(sh9 * spec[:, sh_num:, None], axis=1)
    return F0 * s1 + s2


def sh_render_core(albedo, metal, rough, normal, vdirs, sh9, embed_fn,
                   model_brdf, clamp01, refl_probe=None, only_spec=False):
    """SH shading path (reference render_utils.py:216-262): Lambertian via
    closed-form SH irradiance + glossy via neural BRDF or prefiltered
    reflection probe. The reference's rough/smooth boolean split becomes a
    jnp.where blend."""
    F0 = get_f0(metal, albedo)
    vdirs = -vdirs  # camera-to-object -> object-to-camera

    NdotV = pos_dot(normal, vdirs)
    # stabilize grazing angles (reference :222-225)
    edge = NdotV < 8e-2
    normal = jnp.where(edge, normal + vdirs / 10, normal)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)

    kS = fresnel_schlick_roughness(F0, NdotV, rough)
    kD = (1.0 - kS) * (1.0 - metal)

    diff_col = albedo / jnp.pi * sh9_irradiance(normal, sh9)

    if refl_probe is None:
        spec_col = sh_glossy_shade(normal, vdirs, rough, model_brdf,
                                   embed_fn, sh9, F0)
    elif only_spec:
        spec_col = spec_shade(normal, vdirs, rough, kS, refl_probe)
    else:
        rough_div = 0.2
        smooth = spec_shade(normal, vdirs, rough / rough_div, kS, refl_probe)
        glossy = sh_glossy_shade(normal, vdirs, rough, model_brdf,
                                 embed_fn, sh9, F0)
        spec_col = jnp.where(rough < rough_div, smooth, glossy)

    radiance = kD * diff_col + spec_col
    return jnp.clip(radiance, 0.0, 1.0) if clamp01 else jax.nn.relu(radiance)


# ---------------------------------------------------------------------------
# Spherical Gaussians
# ---------------------------------------------------------------------------

def sg_product(sg1, sg2):
    """Product of two SGs is an SG (reference render_utils.py:266-276).
    sg: (..., 7) = [axis, lambda, mu]."""
    lm = sg1[..., 3:4] + sg2[..., 3:4]
    um = (sg1[..., 3:4] * sg1[..., :3] + sg2[..., 3:4] * sg2[..., :3]) / lm
    um_len = jnp.linalg.norm(um, axis=-1, keepdims=True)
    axis = um / um_len
    lam = lm * um_len
    mu = sg1[..., -3:] * sg2[..., -3:] * jnp.exp(lm * (um_len - 1.0))
    return jnp.concatenate([axis, lam, mu], axis=-1)


def sg_hemisphere_integral(sgs, normal):
    """Analytic SG integral over the hemisphere about `normal`
    (Meder-Bruderlin style fit; reference render_utils.py:280-300)."""
    cos_beta = jnp.sum(sgs[..., :3] * normal, -1, keepdims=True)
    lam = jnp.clip(sgs[..., 3:4], min=EPS)
    inv_lam = 1.0 / lam
    t = jnp.sqrt(lam) * (1.6988 + 10.8438 * inv_lam) / (
        1.0 + 6.2201 * inv_lam + 10.2415 * inv_lam * inv_lam)
    inv_a = jnp.exp(-t)
    mask = (cos_beta >= 0).astype(sgs.dtype)
    inv_b = jnp.exp(-t * jnp.clip(cos_beta, min=0.0))
    s1 = (1.0 - inv_a * inv_b) / (1.0 - inv_a + inv_b - inv_a * inv_b)
    b = jnp.exp(t * jnp.clip(cos_beta, max=0.0))
    s2 = (b - inv_a) / ((1.0 - inv_a) * (b + 1.0))
    s = mask * s1 + (1.0 - mask) * s2
    A_b = 2.0 * jnp.pi / lam * (jnp.exp(-lam) - jnp.exp(-2.0 * lam))
    A_u = 2.0 * jnp.pi / lam * (1.0 - jnp.exp(-lam))
    return (A_b * (1.0 - s) + A_u * s) * sgs[..., -3:]


def sg_irradiance(sgs, normal, sum_lights=True):
    """Cosine-weighted irradiance via the SG-product-with-cosine-SG trick
    (reference render_utils.py:304-317). sgs: (px, lx, 7); normal: (px, 3)."""
    px = normal.shape[0]
    cos_sg = jnp.concatenate([
        normal, jnp.full((px, 1), 0.0315), jnp.full((px, 3), 32.7080)], -1)
    cos_sg = jnp.broadcast_to(cos_sg[:, None, :], sgs.shape)
    n = jnp.broadcast_to(normal[:, None, :], (*sgs.shape[:2], 3))
    lcos = sg_product(sgs, cos_sg)
    irr = sg_hemisphere_integral(lcos, n) \
        - 31.7003 * sg_hemisphere_integral(sgs, n)
    if sum_lights:
        irr = jnp.sum(irr, axis=1)
    return jax.nn.relu(irr)


def sg_render_core(albedo, metal, rough, normal, vdirs, l_sgs, clamp01,
                   self_shadow=True, refl_probe=None, only_spec=False):
    """SG shading path (reference render_utils.py:321-375): warp the GGX NDF
    to an SG about the reflection direction, multiply with the light SGs,
    integrate analytically. l_sgs: (px, lx, 7) if self_shadow (per-point
    decayed lights) else (lx, 7) shared."""
    vdirs = -vdirs
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    px = normal.shape[0]
    m2 = rough ** 2
    d_axis = reflect_dir(normal, vdirs)
    d_lam = 2.0 / m2 / (4.0 * pos_dot_eps(normal, vdirs))
    d_mu = jnp.broadcast_to(1.0 / (jnp.pi * m2), (px, 3))
    D_sg = jnp.concatenate([d_axis, d_lam, d_mu], -1)      # (px, 7)

    if l_sgs.ndim == 2:  # shared lights -> expand per point
        l_sgs = jnp.broadcast_to(l_sgs[None], (px, *l_sgs.shape))
    D_ex = jnp.broadcast_to(D_sg[:, None, :], l_sgs.shape)
    ld = sg_product(D_ex, l_sgs)
    spec_irr = sg_irradiance(ld, normal)
    diff_irr = sg_irradiance(l_sgs, normal)

    NdotV = pos_dot(normal, vdirs)
    NdotL = NdotV
    F0 = get_f0(metal, albedo)
    _F = fresnel_schlick(F0, NdotV)
    G = 1.0 / (geometry_blender(NdotV, rough) * 2.0 + 1.0)
    Moi = _F * G / (4.0 * NdotL * NdotV + EPS)

    spec_col = Moi * spec_irr
    diff_col = albedo / jnp.pi * diff_irr
    kS = fresnel_schlick_roughness(F0, NdotV, rough)
    kD = (1.0 - kS) * (1.0 - metal)
    radiance = kD * diff_col + spec_col
    return jnp.clip(radiance, 0.0, 1.0) if clamp01 else jax.nn.relu(radiance)
