#!/usr/bin/env python
"""Fit the neural glossy-BRDF MLP used by the SH shading path.

The reference ships a pretrained `insert/data/model_brdf3.tar`
(insert/main.py:90-94) without its training code. This tool regenerates an
equivalent asset from first principles:

The SH glossy shade computes  spec = F0 * (s1 . L) + (s2 . L)   where
L in R^{9x3} is the light SH and s1, s2 in R^9 are MLP outputs
(insert/render_utils.py:199-210). Writing the GGX specular integral with
Schlick Fresnel F = F0 + (1-F0) w(omega),  w = (1 - (h.v))^5:

  spec = F0 * int K(omega)(1 - w) L(omega) domega
       +       int K(omega) w      L(omega) domega,
  K = D * G * cos_l / (4 cos_v cos_l)

Because L is band-limited to SH9, each integral reduces to a dot product
with the SH projection of its kernel — EXACTLY the s1/s2 the MLP must
predict:  s1_i = int K (1-w) Y_i,   s2_i = int K w Y_i.

So we Monte-Carlo those projections for random (normal, view, roughness)
configurations and regress the MLP on them. Run:

  PYTHONPATH=. python scripts/train_brdf.py [--steps 3000] [--out PATH]
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arnerf_tpu.insert.sh_math import sh9_basis, get_sphere_rays  # noqa: E402
from arnerf_tpu.insert.insert_models import (get_embedder, mlp_skip_init,  # noqa: E402
                                             mlp_skip_apply)
from arnerf_tpu.insert.render_utils import geometry_blender  # noqa: E402

SH_ORDER = 3


def ggx_kernel_sh(normals, vdirs, roughs, key, n_mc=4096):
    """SH projections (s1, s2) of the GGX kernel for a batch of configs.
    normals, vdirs: (B, 3) unit; roughs: (B, 1). Returns (B, 9), (B, 9)."""
    B = normals.shape[0]
    omega = get_sphere_rays(key, B, n_mc)                     # (B, M, 3)
    n = normals[:, None, :]
    v = vdirs[:, None, :]
    m2 = (roughs[:, None, :] ** 2)

    cos_l = jnp.sum(omega * n, -1, keepdims=True)             # (B, M, 1)
    cos_v = jnp.clip(jnp.sum(v * n, -1, keepdims=True), 1e-4, None)
    h = omega + v
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-9)
    cos_h = jnp.clip(jnp.sum(h * n, -1, keepdims=True), 0.0, None)
    hv = jnp.clip(jnp.sum(h * v, -1, keepdims=True), 0.0, None)

    # GGX NDF
    denom = cos_h ** 2 * (m2 - 1.0) + 1.0
    D = m2 / (jnp.pi * denom ** 2 + 1e-9)
    # Blender-style geometry term, matching sg_render_core's choice
    G = 1.0 / (geometry_blender(cos_v, roughs[:, None, :]) * 2.0 + 1.0)
    w = (1.0 - hv) ** 5

    K = jnp.where(cos_l > 0, D * G / (4.0 * cos_v + 1e-9), 0.0)  # (B, M, 1)
    Y = sh9_basis(omega)                                      # (B, M, 9)
    scale = 4 * jnp.pi / omega.shape[1]
    s1 = jnp.sum(K * (1 - w) * Y, axis=1) * scale
    s2 = jnp.sum(K * w * Y, axis=1) * scale
    return s1, s2


def main():
    steps = 3000
    out = os.path.join(os.path.dirname(__file__), "..", "arnerf_tpu",
                       "insert", "data", f"model_brdf{SH_ORDER}.npz")
    args = sys.argv[1:]
    if "--steps" in args:
        steps = int(args[args.index("--steps") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    embed_fn, input_ch = get_embedder(3)
    params = mlp_skip_init(jax.random.PRNGKey(42), input_ch * 2 + 1,
                           2 * SH_ORDER ** 2, D=2, W=128)
    tx = optax.adam(optax.cosine_decay_schedule(1e-3, steps, 1e-2))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        B = 512
        n = jax.random.normal(k1, (B, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        # view in the upper hemisphere of each normal
        v = jax.random.normal(k2, (B, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = jnp.where(jnp.sum(v * n, -1, keepdims=True) < 0.05,
                      -v + 2 * n * jnp.sum(n * v, -1, keepdims=True) + 0.1 * n,
                      v)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        rough = jax.random.uniform(k3, (B, 1), minval=0.08, maxval=1.0)
        s1, s2 = ggx_kernel_sh(n, v, rough, k4)
        target = jnp.concatenate([s1, s2], -1)

        def loss_fn(p):
            inp = jnp.concatenate([embed_fn(n), embed_fn(v), rough], -1)
            pred = mlp_skip_apply(p, inp)
            return jnp.mean((pred - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if i % 200 == 0:
            print(f"step {i}/{steps} loss={float(loss):.5f}", flush=True)

    os.makedirs(os.path.dirname(out), exist_ok=True)
    blob = {}
    for i, layer in enumerate(params["layers"]):
        blob[f"w_{i}"] = np.asarray(layer["w"])
        blob[f"b_{i}"] = np.asarray(layer["b"])
    np.savez(out, **blob)
    print(f"saved neural BRDF -> {out}")


if __name__ == "__main__":
    main()
