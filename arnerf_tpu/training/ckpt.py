"""Checkpoint save/load (reference utils.py:21-39 + Lightning ModelCheckpoint).

Plain .npz with path-flattened pytree keys — dependency-free, exact, and
inspectable. `slim_ckpt` mirrors the reference's distribution checkpoints:
model weights only, grid/optimizer state dropped (utils.py:29-39).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_ckpt(path, *, params, grid_state=None, opt_state=None, step=0,
              extra=None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blobs = {"step": np.asarray(step)}
    blobs.update(_flatten(params, "params/"))
    if grid_state is not None:
        blobs.update(_flatten(grid_state._asdict(), "grid/"))
    if opt_state is not None:
        # leaves only — the treedef is reconstructed from the loader's
        # opt_state_template (persisting a pickled treedef would make
        # loading an untrusted checkpoint arbitrary code execution)
        leaves = jax.tree.leaves(opt_state)
        blobs["opt_n_leaves"] = np.asarray(len(leaves))
        for i, leaf in enumerate(leaves):
            blobs[f"opt/{i}"] = np.asarray(leaf)
    if extra:
        blobs.update(_flatten(extra, "extra/"))
    # atomic write: a kill mid-save must never corrupt an existing ckpt
    tmp = f"{path}.tmp.npz"
    np.savez(tmp, **blobs)
    os.replace(tmp, path)


def _unflatten_into(template, blobs, prefix):
    """Rebuild arrays into the same structure as `template`."""
    if isinstance(template, dict):
        return {k: _unflatten_into(v, blobs, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [_unflatten_into(v, blobs, f"{prefix}{i}/")
               for i, v in enumerate(template)]
        return type(template)(seq)
    key = prefix[:-1]
    return jnp.asarray(blobs[key]) if key in blobs else template


def load_ckpt(path, *, params_template, grid_template=None,
              opt_state_template=None):
    """Load into the shapes of the provided templates. Returns
    (params, grid_state, opt_state, step); missing pieces pass the template
    through (so slim checkpoints load cleanly, like reference load_ckpt's
    prefix filtering)."""
    blobs = dict(np.load(path, allow_pickle=False))
    params = _unflatten_into(params_template, blobs, "params/")
    grid_state = grid_template
    if grid_template is not None and any(k.startswith("grid/")
                                         for k in blobs):
        gd = _unflatten_into(grid_template._asdict(), blobs, "grid/")
        grid_state = type(grid_template)(**gd)
    opt_state = opt_state_template
    if opt_state_template is not None and "opt/0" in blobs:
        tleaves, treedef = jax.tree.flatten(opt_state_template)
        n = int(blobs.get("opt_n_leaves", len(tleaves)))
        if n != len(tleaves):
            raise ValueError(
                f"checkpoint optimizer state has {n} leaves but the "
                f"template has {len(tleaves)} — optimizer config mismatch")
        leaves = [jnp.asarray(blobs[f"opt/{i}"]) for i in range(n)]
        opt_state = jax.tree.unflatten(treedef, leaves)
    step = int(blobs.get("step", 0))
    return params, grid_state, opt_state, step


def slim_ckpt(path_in, path_out):
    """Strip a checkpoint for distribution: model weights + the occupancy
    decision (the reference's slim ckpt drops density_grid/grid_coords but
    KEEPS the density bitfield the renderers march against,
    utils.py:29-39)."""
    blobs = dict(np.load(path_in, allow_pickle=False))
    keep = {k: v for k, v in blobs.items()
            if k.startswith("params/")
            or k in ("grid/occ_flat", "grid/bitfield")}
    keep["step"] = blobs.get("step", np.asarray(0))
    np.savez(path_out, **keep)


# ---------------------------------------------------------------------------
# Orbax backend (optional) — async, sharding-aware checkpointing for
# multi-host TPU runs. The npz path above stays the default (inspectable,
# dependency-free); pass trainer.save/load a directory path ending in
# ".orbax" (or use these directly) to get orbax's atomic-rename durability
# and per-array chunked IO. Mirrors SURVEY §5's checkpoint/resume plan.
# ---------------------------------------------------------------------------

def save_ckpt_orbax(path, *, params, grid_state=None, opt_state=None,
                    step=0, extra=None):
    """Save the same artifact set as save_ckpt via orbax StandardCheckpointer
    (directory tree, one atomic rename at the end)."""
    import orbax.checkpoint as ocp
    tree = {"params": params, "step": jnp.asarray(step)}
    if grid_state is not None:
        tree["grid"] = dict(grid_state._asdict())
    if opt_state is not None:
        # leaves only; treedef comes from the loader's template (no pickle)
        leaves = jax.tree.leaves(opt_state)
        tree["opt"] = {str(i): leaf for i, leaf in enumerate(leaves)}
    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_ckpt_orbax(path, *, params_template, grid_template=None,
                    opt_state_template=None):
    """Counterpart of load_ckpt for orbax directories; same return tuple and
    slim-tolerant semantics (missing pieces pass templates through)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    params = jax.tree.map(jnp.asarray, tree["params"])
    grid_state = grid_template
    if grid_template is not None and "grid" in tree:
        gd = {k: jnp.asarray(v) for k, v in tree["grid"].items()}
        grid_state = type(grid_template)(**{
            **grid_template._asdict(), **gd})
    opt_state = opt_state_template
    if opt_state_template is not None and "opt" in tree:
        tleaves, treedef = jax.tree.flatten(opt_state_template)
        if len(tree["opt"]) != len(tleaves):
            raise ValueError(
                f"checkpoint optimizer state has {len(tree['opt'])} leaves "
                f"but the template has {len(tleaves)}")
        leaves = [jnp.asarray(tree["opt"][str(i)])
                  for i in range(len(tleaves))]
        opt_state = jax.tree.unflatten(treedef, leaves)
    return params, grid_state, opt_state, int(tree.get("step", 0))
