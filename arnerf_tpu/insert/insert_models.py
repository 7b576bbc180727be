"""Global-SH inverse rendering: jointly optimize a 9-coefficient global
environment light and a positional-encoded albedo MLP from planar surface
points. Rebuilt from reference insert/insert_models.py.

TPU-first shape: the whole optimization epoch (shuffle -> batched step) runs
as jitted steps with on-device data; the per-batch program contains the
albedo MLP, the SH triple-product light composition, the log loss, the
albedo smoothness prior, gray-world/white constraints, and the Adam update.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .sh_math import sh9_product_93
from .render_utils import sh9_irradiance, irradiance_numerical
from .tonemapping import tonemapping_simple


# ---------------------------------------------------------------------------
# NeRF-style positional embedder + skip MLP (reference insert_models.py:14-89)
# ---------------------------------------------------------------------------

def get_embedder(multires, input_dims=3):
    """Returns (embed_fn, out_dim): [x, sin(2^k x), cos(2^k x)]."""
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x):
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim


def mlp_skip_init(key, input_ch, output_ch, D=2, W=64, skips=()):
    """Linear stack with optional skip concatenations, biased layers
    (reference MLP, insert_models.py:14-40)."""
    dims_in = []
    d = input_ch
    for i in range(D):
        dims_in.append(d)
        d = W + (input_ch if i in skips else 0)
    keys = jax.random.split(key, D + 1)
    layers = []
    for i, din in enumerate(dims_in):
        bound = float(np.sqrt(1.0 / din))
        layers.append({
            "w": jax.random.uniform(keys[i], (din, W), minval=-bound,
                                    maxval=bound),
            "b": jnp.zeros((W,))})
    bound = float(np.sqrt(1.0 / d))
    layers.append({
        "w": jax.random.uniform(keys[-1], (d, output_ch), minval=-bound,
                                maxval=bound),
        "b": jnp.zeros((output_ch,))})
    return {"layers": layers, "skips": tuple(skips)}


def mlp_skip_apply(params, x):
    h = x
    skips = params["skips"]
    hidden = params["layers"][:-1]
    for i, layer in enumerate(hidden):
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    out = params["layers"][-1]
    return h @ out["w"] + out["b"]


# ---------------------------------------------------------------------------
# global-SH training (precomputed-probe variant — the production path,
# reference train_global_env_prec, insert_models.py:303-415)
# ---------------------------------------------------------------------------

def _log_loss(src, dst):
    return (jnp.log((0.2935 + src) / (0.2935 + dst)) * 0.7607) ** 2


def init_global_sh(key, sh_num=9):
    """Random init with a positive DC so initial irradiance is positive
    (reference create_model, insert_models.py:112-118)."""
    k1, k2 = jax.random.split(key)
    sh = jax.random.uniform(k1, (sh_num, 3)) * 2 - 1
    return sh.at[0].set(jax.random.uniform(k2, (3,)))


def make_prec_train_step(embed_fn, *, hdr_mapping=False,
                         mat_smooth_range=1e-3, mat_smooth_weight=0.2,
                         use_probes=True, lrate=5e-3, lrate_decay=250):
    """Build (tx, jitted step) for the precomputed-probe global-SH trainer."""
    tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -lrate * (0.1 ** (s // lrate_decay))))

    @partial(jax.jit, static_argnames=("white_strong",))
    def step(params, opt_state, batch, key, white_strong: bool):
        def loss_fn(p):
            mlp, gsh = p["mlp"], p["global_sh"]
            pts, gt, nrm = batch["pts"], batch["gt"], batch["normal"]
            albedo = jax.nn.sigmoid(mlp_skip_apply(mlp, embed_fn(pts)))
            pts_sh = jnp.broadcast_to(gsh[None], (pts.shape[0], *gsh.shape))
            if use_probes:
                lg = batch["rgb_shs"] + sh9_product_93(pts_sh,
                                                       batch["opc_shs"])
            else:
                lg = pts_sh
            irr = jax.nn.leaky_relu(sh9_irradiance(nrm, lg, allow_neg=True))
            col = albedo / jnp.pi * irr
            if hdr_mapping:
                col = tonemapping_simple(col)
            loss_c = jnp.mean(_log_loss(col, gt))

            # albedo smoothness on in-plane jitters (reference :380-387)
            near = (jax.random.uniform(key, pts.shape) * 2 - 1) \
                * mat_smooth_range
            plane_near = pts + near - jnp.sum(near * nrm, -1,
                                              keepdims=True) * nrm
            albedo_near = jax.nn.sigmoid(
                mlp_skip_apply(mlp, embed_fn(plane_near)))
            loss_mat = mat_smooth_weight * jnp.mean(
                (albedo - albedo_near) ** 2)
            # discourage large albedo -> push intensity into the light
            loss_matless = jnp.mean(albedo) * 0.2
            # gray-world prior on the light (stronger early)
            w_white = 2.0 if white_strong else 1.0
            loss_white = w_white * jnp.mean(
                (gsh - gsh.mean(axis=-1, keepdims=True)) ** 2)
            return loss_c + loss_mat + loss_matless + loss_white, loss_c

        (loss, loss_c), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss_c

    return tx, step


def train_global_env_prec(pts, normal, gt, rgb_shs, opc_shs, model_save_path,
                          sh_num=9, key=None, iters=200, batch=20480 * 16,
                          ckpt_save=400, hdr_mapping=False,
                          downsample_pts_num=None, **kwargs):
    """Train global SH + albedo MLP against precomputed per-point probes
    (light at p = rgb_sh(p) + TripleProduct(global_sh, opacity_sh(p)));
    reference insert_models.py:303-415. Returns global_sh (9, 3)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_mlp, k_sh, key = jax.random.split(key, 3)
    embed_fn, input_ch = get_embedder(4)  # 3 -> 27

    params = None
    start_epoch = 0
    os.makedirs(model_save_path, exist_ok=True)
    ckpts = sorted(f for f in os.listdir(model_save_path)
                   if f.startswith("mat_sh") and f.endswith(".npz"))
    tx, step = make_prec_train_step(
        embed_fn, hdr_mapping=hdr_mapping, use_probes=rgb_shs is not None,
        **{k: v for k, v in kwargs.items()
           if k in ("mat_smooth_range", "mat_smooth_weight", "lrate",
                    "lrate_decay")})
    if ckpts:
        blob = np.load(os.path.join(model_save_path, ckpts[-1]),
                       allow_pickle=True)
        flat = {k: jnp.asarray(v) for k, v in blob.items()
                if k not in ("epoch", "skips")}
        n_layers = max(int(k.split("_")[1]) for k in flat if
                       k.startswith("w_")) + 1
        params = {"mlp": {"layers": [{"w": flat[f"w_{i}"],
                                      "b": flat[f"b_{i}"]}
                                     for i in range(n_layers)],
                          "skips": tuple(int(s) for s in blob["skips"])},
                  "global_sh": flat["global_sh"]}
        start_epoch = int(blob["epoch"])
        print(f"Load ckpt: {ckpts[-1]} (epoch {start_epoch})")
    if params is None:
        params = {"mlp": mlp_skip_init(k_mlp, input_ch, 3, D=2, W=64),
                  "global_sh": init_global_sh(k_sh, sh_num)}
    opt_state = tx.init(params)

    n = pts.shape[0]
    data = {"pts": jnp.asarray(pts), "gt": jnp.asarray(gt),
            "normal": jnp.asarray(normal)}
    if rgb_shs is not None:
        data["rgb_shs"] = jnp.asarray(rgb_shs)
        data["opc_shs"] = jnp.asarray(opc_shs)

    loss_c = np.inf
    for epoch in range(start_epoch, iters):
        if epoch % 50 == 1 or epoch == start_epoch:
            key, k = jax.random.split(key)
            perm = jax.random.permutation(k, n)
            shuffled = {kk: v[perm] for kk, v in data.items()}
        eff_n = downsample_pts_num or n
        for i in range(0, eff_n, batch):
            b = {kk: v[i:i + batch] for kk, v in shuffled.items()}
            key, k = jax.random.split(key)
            params, opt_state, loss_c = step(
                params, opt_state, b, k, white_strong=epoch < iters * 0.8)
        if epoch % 20 == 0:
            print(f"global-SH epoch {epoch}/{iters} loss={float(loss_c):.4f}")
        if epoch % ckpt_save == 0 and epoch > 0:
            save_mat_sh_ckpt(model_save_path, params, epoch)
    save_mat_sh_ckpt(model_save_path, params, iters - 1)
    return np.asarray(params["global_sh"])


def save_mat_sh_ckpt(model_save_path, params, epoch):
    blob = {"global_sh": np.asarray(params["global_sh"]),
            "epoch": np.asarray(epoch),
            "skips": np.asarray(params["mlp"]["skips"], np.int64)}
    for i, layer in enumerate(params["mlp"]["layers"]):
        blob[f"w_{i}"] = np.asarray(layer["w"])
        blob[f"b_{i}"] = np.asarray(layer["b"])
    np.savez(os.path.join(model_save_path, f"mat_sh_{epoch:06d}.npz"), **blob)


def train_global_env(pts, normal, gt, model_save_path, sh_num=9,
                     probe_fn=None, key=None, iters=200, batch=20480 * 16,
                     hdr_mapping=False, **kwargs):
    """Legacy variant re-rendering probes online through the NeRF
    (reference train_global_env, insert_models.py:140-300). probe_fn(pts) ->
    (raw_rgb (x,c,3), rays_d (x,c,3)); when None, the global SH lights the
    points directly."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_mlp, k_sh, key = jax.random.split(key, 3)
    embed_fn, input_ch = get_embedder(2)  # 3 -> 15
    params = {"mlp": mlp_skip_init(k_mlp, input_ch, 3, D=2, W=64),
              "global_sh": init_global_sh(k_sh, sh_num)}
    tx = optax.adam(kwargs.get("lrate", 5e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, b, key, irr):
        def loss_fn(p):
            albedo = jax.nn.sigmoid(
                mlp_skip_apply(p["mlp"], embed_fn(b["pts"])))
            if irr is None:
                pts_sh = jnp.broadcast_to(
                    p["global_sh"][None], (b["pts"].shape[0], sh_num, 3))
                irr_l = jax.nn.leaky_relu(
                    sh9_irradiance(b["normal"], pts_sh, allow_neg=True))
            else:
                irr_l = irr
            col = albedo / jnp.pi * irr_l
            if hdr_mapping:
                col = tonemapping_simple(col)
            loss = jnp.mean((col - b["gt"]) ** 2)
            near = (jax.random.uniform(key, b["pts"].shape) * 2 - 1) * 1e-3
            pn = b["pts"] + near - jnp.sum(near * b["normal"], -1,
                                           keepdims=True) * b["normal"]
            albedo_n = jax.nn.sigmoid(
                mlp_skip_apply(p["mlp"], embed_fn(pn)))
            loss += 0.2 * jnp.mean((albedo - albedo_n) ** 2)
            gsh = p["global_sh"]
            loss += 2 * jnp.mean((gsh - gsh.mean(-1, keepdims=True)) ** 2)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = pts.shape[0]
    data = {"pts": jnp.asarray(pts), "gt": jnp.asarray(gt),
            "normal": jnp.asarray(normal)}
    for epoch in range(iters):
        key, k = jax.random.split(key)
        perm = jax.random.permutation(k, n)
        shuffled = {kk: v[perm] for kk, v in data.items()}
        for i in range(0, n, batch):
            b = {kk: v[i:i + batch] for kk, v in shuffled.items()}
            irr = None
            if probe_fn is not None:
                raw_rgb, rays_d = probe_fn(b["pts"]
                                           + b["normal"] * 0.01)
                irr = jax.nn.leaky_relu(irradiance_numerical(
                    raw_rgb, rays_d, b["normal"], allow_neg=True))
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, b, k, irr)
    return np.asarray(params["global_sh"])
