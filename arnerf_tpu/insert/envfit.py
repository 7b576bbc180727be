"""Environment-map -> Spherical-Gaussian fitting. Rebuilt from reference
insert/envfit.py.

Two paths like the reference:
  * EnvOptim — per-probe direct Adam fit of 32 SGs in a handful of
    iterations (the path actually used at probe time, reference
    envfit.py:275-297 / main.py:348). Here the whole N_iter optimization is
    ONE jitted lax.scan — no per-iteration dispatch, so a probe fit is a
    single device program.
  * SGFittingNet / EnvTrainer — a small conv net amortizing the fit over a
    scene's env maps (disabled by default in the reference too,
    main.py:1198-1200). Implemented in flax-free plain JAX.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

TINY = 1e-8


def parse_raw_sg(sg):
    lobes = sg[..., :3] / (jnp.linalg.norm(sg[..., :3], axis=-1,
                                           keepdims=True) + TINY)
    lambdas = jnp.abs(sg[..., 3:4])
    mus = jnp.abs(sg[..., -3:])
    return lobes, lambdas, mus


def trans_raw_sg(sg):
    """Canonicalize raw SG params: unit axis, positive lambda/mu."""
    lobes, lambdas, mus = parse_raw_sg(sg)
    return jnp.concatenate([lobes, lambdas, mus], axis=-1)


def envmap_dirs(H, W, upper_hemi=False):
    phi_max = np.pi / 2 if upper_hemi else np.pi
    phi, theta = jnp.meshgrid(jnp.linspace(0.0, phi_max, H),
                              jnp.linspace(-0.5 * np.pi, 1.5 * np.pi, W),
                              indexing="ij")
    return jnp.stack([jnp.cos(theta) * jnp.sin(phi), jnp.cos(phi),
                      jnp.sin(theta) * jnp.sin(phi)], -1)      # (H, W, 3)


def sg2envmap(lgt_sgs, H, W, upper_hemi=False):
    """Render SGs to a lat-long env map (reference envfit.py:30-56)."""
    dirs = envmap_dirs(H, W, upper_hemi)[..., None, :]          # (H, W, 1, 3)
    lobes, lambdas, mus = parse_raw_sg(lgt_sgs)
    rgb = mus * jnp.exp(lambdas * (jnp.sum(dirs * lobes, -1,
                                           keepdims=True) - 1.0))
    return jnp.sum(rgb, axis=-2)                                # (H, W, 3)


@partial(jax.jit, static_argnames=("n_iter", "H", "W"))
def _fit_sgs(init_sgs, im, n_iter: int, H: int, W: int):
    tx = optax.adam(1e-1)

    def step(carry, _):
        sgs, opt_state = carry

        def loss_fn(p):
            return jnp.mean((sg2envmap(p, H, W) - im) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(sgs)
        updates, opt_state = tx.update(g, opt_state, sgs)
        sgs = optax.apply_updates(sgs, updates)
        return (sgs, opt_state), loss

    (sgs, _), losses = jax.lax.scan(step, (init_sgs, tx.init(init_sgs)),
                                    None, length=n_iter)
    return sgs, losses


class EnvOptim:
    """Direct per-probe SG fit (reference envfit.py:275-297)."""

    def __init__(self, num_lgt_sgs=32, n_iter=25, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        sgs = jax.random.normal(key, (num_lgt_sgs, 7))
        self.init_sgs = sgs.at[:, 3:4].multiply(100.0)
        self.n_iter = n_iter
        self.lgt_sgs = self.init_sgs

    def eval(self, im, warm_start=True):
        """im: (H, W, 3) env map -> fitted raw SGs (n, 7)."""
        H, W = im.shape[:2]
        init = self.lgt_sgs if warm_start else self.init_sgs
        self.lgt_sgs, _ = _fit_sgs(init, jnp.asarray(im), self.n_iter, H, W)
        return self.lgt_sgs


# ---------------------------------------------------------------------------
# Amortized CNN fitter
# ---------------------------------------------------------------------------

def _conv_init(key, cin, cout, k=3):
    w = jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(2.0 / (cin * k * k))
    return {"w": w, "b": jnp.zeros((cout,))}


def sg_net_init(key, output_sg_num=32):
    ks = jax.random.split(key, 5)
    return {
        "conv1": _conv_init(ks[0], 3, 32),
        "conv2": _conv_init(ks[1], 32, 64),
        "conv3": _conv_init(ks[2], 64, 128),
        "conv4": _conv_init(ks[3], 128, 256),
        "lin": {"w": jax.random.normal(ks[4], (256 * 8 * 8,
                                               output_sg_num * 7)) * 1e-2,
                "b": jnp.zeros((output_sg_num * 7,))},
        "n_sg": output_sg_num,
    }


def _conv_pool(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + p["b"][None, :, None,
                                                             None]
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
    return jax.nn.relu(y)


def sg_net_apply(params, im):
    """im: (B, H, W, 3) 128x128 env maps -> (B, n_sg, 7) raw SGs
    (reference SGFittingNet, envfit.py:111-135)."""
    x = jnp.transpose(im, (0, 3, 1, 2))
    for name in ("conv1", "conv2", "conv3", "conv4"):
        x = _conv_pool(params[name], x)
    x = x.reshape(x.shape[0], -1)
    out = x @ params["lin"]["w"] + params["lin"]["b"]
    return out.reshape(im.shape[0], params["n_sg"], 7)


class EnvTrainer:
    """Amortized SG fitting over a scene's env maps
    (reference envfit.py:166-272): trains SGFittingNet to reproduce each env
    map through the SG renderer."""

    def __init__(self, envmaps, output_sg_num=32, key=None, lr=4e-4):
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = sg_net_init(key, output_sg_num)
        self.n_sg = output_sg_num
        self.envmaps = jnp.asarray(envmaps)                    # (N, 128,128,3)
        self.tx = optax.chain(optax.scale_by_adam(),
                              optax.scale_by_schedule(
                                  lambda s: -lr * 0.5 ** (s // 100)))
        static = {"n_sg"}
        self.opt_state = self.tx.init(
            {k: v for k, v in self.params.items() if k not in static})
        self.key = key

        @jax.jit
        def _step(params, opt_state, batch):
            def loss_fn(p):
                full = dict(p, n_sg=output_sg_num)
                sgs = sg_net_apply(full, batch)
                ims = jax.vmap(lambda s: sg2envmap(s, 128, 128))(sgs)
                return jnp.mean((ims - batch) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = _step

    def train(self, epochs=200, batch_size=16, ckpt_dir=None,
              ckpt_every=100):
        """Optionally checkpoints model params to ckpt_dir (the reference
        saves model/optimizer every 500 epochs, envfit.py:245-255)."""
        import os
        n = self.envmaps.shape[0]
        p = {k: v for k, v in self.params.items() if k != "n_sg"}
        start = 0
        if ckpt_dir:
            os.makedirs(ckpt_dir, exist_ok=True)
            ckpts = sorted(f for f in os.listdir(ckpt_dir)
                           if f.startswith("env_model_"))
            if ckpts:
                import numpy as _np
                blob = _np.load(os.path.join(ckpt_dir, ckpts[-1]),
                                allow_pickle=True)
                p = {k: jnp.asarray(v) for k, v in blob.items()
                     if k != "epoch"}
                # restore nested conv dicts
                p = self._unflatten(p)
                start = int(blob["epoch"])
        loss = jnp.inf
        for epoch in range(start, epochs):
            self.key, k = jax.random.split(self.key)
            perm = jax.random.permutation(k, n)
            for i in range(0, n, batch_size):
                idx = perm[i:i + batch_size]
                p, self.opt_state, loss = self._step(
                    p, self.opt_state, self.envmaps[idx])
            if ckpt_dir and (epoch + 1) % ckpt_every == 0:
                self._save(ckpt_dir, p, epoch + 1)
        if ckpt_dir:
            self._save(ckpt_dir, p, epochs)
        self.params.update(p)
        return float(loss)

    @staticmethod
    def _flatten(p):
        out = {}
        for name, layer in p.items():
            for k, v in layer.items():
                out[f"{name}.{k}"] = v
        return out

    @staticmethod
    def _unflatten(flat):
        out = {}
        for key, v in flat.items():
            name, k = key.split(".")
            out.setdefault(name, {})[k] = v
        return out

    def _save(self, ckpt_dir, p, epoch):
        import os
        import numpy as _np
        blob = {k: _np.asarray(v) for k, v in self._flatten(p).items()}
        blob["epoch"] = _np.asarray(epoch)
        _np.savez(os.path.join(ckpt_dir, f"env_model_{epoch:06d}.npz"),
                  **blob)

    def eval(self, im):
        return sg_net_apply(self.params, jnp.asarray(im)[None])[0]
