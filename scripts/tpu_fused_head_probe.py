#!/usr/bin/env python
"""Guarded TPU probe for the fused field-head Pallas kernel.

Run ALONE on the shared TPU (a bad Mosaic program can wedge the device):
  1. sanity op
  2. compile-only lower+compile of the kernel (remote compiler, no exec)
  3. tiny-shape execution vs the XLA formulation
  4. timing at the training shape (262144 samples) vs XLA

Prints one JSON line at the end.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    from arnerf_tpu.ops.fused_head import (fused_field_head, _head_xla)

    from arnerf_tpu.utils.sync import device_sync

    out = {"stage": "start"}
    print("probe: sanity op...", file=sys.stderr, flush=True)
    device_sync(jnp.ones((8, 8)).sum())
    out["stage"] = "sanity_ok"

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    w = (jax.random.normal(ks[0], (32, 64)) * 0.1,
         jax.random.normal(ks[1], (64, 16)) * 0.1,
         jax.random.normal(ks[2], (32, 64)) * 0.1,
         jax.random.normal(ks[3], (64, 64)) * 0.1,
         jax.random.normal(ks[4], (64, 3)) * 0.1)
    feats = jax.random.normal(ks[5], (1024, 32))
    sh = jax.random.normal(ks[6], (1024, 16))

    print("probe: compile-only...", file=sys.stderr, flush=True)
    fn = jax.jit(lambda f, s, ws: fused_field_head(f, s, ws, jnp.bfloat16,
                                                   False))
    lowered = fn.lower(feats, sh, w)
    lowered.compile()
    out["stage"] = "compile_ok"
    print("probe: compile OK; executing tiny...", file=sys.stderr, flush=True)

    h_k, rgb_k = fn(feats, sh, w)
    device_sync(rgb_k)
    h_x, rgb_x = _head_xla(feats, sh, w, dtype=jnp.bfloat16)
    err_h = float(jnp.max(jnp.abs(h_k - h_x.astype(jnp.float32))))
    err_rgb = float(jnp.max(jnp.abs(rgb_k - rgb_x.astype(jnp.float32))))
    out.update(stage="exec_ok", err_h=err_h, err_rgb=err_rgb)
    print(f"probe: exec OK, max err h={err_h:.2e} rgb={err_rgb:.2e}",
          file=sys.stderr, flush=True)
    assert err_h < 0.05 and err_rgb < 0.05, (err_h, err_rgb)

    # training-shape timing
    n = 262144
    feats_b = jax.random.normal(ks[7], (n, 32))
    sh_b = jnp.tile(sh, (n // 1024, 1))
    fx = jax.jit(lambda f, s, ws: _head_xla(f, s, ws, dtype=jnp.bfloat16))
    for name, f in (("pallas", fn), ("xla", fx)):
        r = f(feats_b, sh_b, w)
        device_sync(r[1])
        t0 = time.time()
        for _ in range(8):
            r = f(feats_b, sh_b, w)
        device_sync(r[1])
        dt = (time.time() - t0) / 8
        out[f"{name}_ms"] = round(dt * 1e3, 3)
        print(f"probe: {name} {dt * 1e3:.2f} ms @ {n} samples",
              file=sys.stderr, flush=True)
    out["speedup"] = round(out["xla_ms"] / max(out["pallas_ms"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
