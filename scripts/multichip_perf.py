#!/usr/bin/env python
"""Multichip perf accounting on the virtual CPU mesh (VERDICT r4 #7).

For dp in {2, 4, 8}: (a) weak-scaling block step time with CONSTANT
per-device ray batch (superlinear growth would mean a serializing join —
same assertion family as tests/test_parallel.py, here with numbers
recorded), and (b) the PRODUCTION-shape collective volume per step, from
tracing the sharded block at NGPConfig() defaults (hash 2^19, L16) —
tracing is symbolic, so no production-size compute runs.

Writes bench_runs/r5_multichip_perf.json. Re-execs itself with a scrubbed
environment (the session sitecustomize dials the TPU pool at interpreter
startup whenever PALLAS_AXON_POOL_IPS is set; this is a CPU-mesh study).
"""

import json
import os
import re
import sys
import time

N_DEV = 8

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("_MCPERF_SCRUBBED") != "1"):
    env = dict(os.environ)
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "JAX_PLATFORM_NAME"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_MCPERF_SCRUBBED"] = "1"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from arnerf_tpu.models import NGPConfig
from arnerf_tpu.training import TrainConfig, NeRFTrainer
from arnerf_tpu.training.losses import NeRFLossConfig
from arnerf_tpu.datasets.synthetic import SyntheticDataset, SyntheticConfig
from arnerf_tpu.parallel import make_mesh
from arnerf_tpu.parallel.accounting import block_collective_report


def weak_scaling_time(dp: int, per_dev_batch: int = 512, reps: int = 3):
    """Post-compile block wall with constant per-device work.

    tc.batch_size is PER-DEVICE (each device samples its own RNG ray
    batch; grads join by psum), so weak scaling means a CONSTANT
    batch_size while the mesh grows. On this single-core host all virtual
    devices share one core, so the expected weak-scaling signature is
    wall time ~linear in dp; superlinear growth = a serializing join
    (tests/test_parallel.py pins the same bound as an assertion)."""
    scfg = SyntheticConfig(img_wh=(32, 32), n_train=3, n_test=1,
                           gt_samples=32)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5, grid_size=32, n_levels=4,
                    log2_hashmap_size=14, base_resolution=4)
    tc = TrainConfig(batch_size=per_dev_batch, num_epochs=1,
                     warmup_steps=1, samples_per_ray_budget=16,
                     loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0),
                     mesh=make_mesh(dp))
    tr.on_train_start()
    tr.train_block()                      # compile + warm
    jax.block_until_ready(tr.params["hash_table"])
    t0 = time.time()
    for _ in range(reps):
        tr.train_block()
    jax.block_until_ready(tr.params["hash_table"])
    steps = reps * tc.update_interval
    return (time.time() - t0) / steps * 1e3          # ms/step


def production_comm(dp: int):
    """Collective volume per step at PRODUCTION shapes (trace only)."""
    scfg = SyntheticConfig(img_wh=(32, 32), n_train=2, n_test=1,
                           gt_samples=16)
    ds = SyntheticDataset(split="train", config=scfg)
    cfg = NGPConfig(scale=0.5)            # hash 2^19, L16 — reference spec
    tc = TrainConfig(batch_size=8192, warmup_steps=0,
                     samples_per_ray_budget=16,
                     loss=NeRFLossConfig(grid_scale=0.5))
    tr = NeRFTrainer(cfg, tc, ds, key=jax.random.PRNGKey(0),
                     mesh=make_mesh(dp))   # __init__ builds tr._block
    keys = jax.random.split(jax.random.PRNGKey(1),
                            len(tr.mesh.devices.flatten()))
    args = (tr.params, tr.opt_state, tr.grid_state, tr.images, tr.poses,
            tr.directions, keys)
    rep = block_collective_report(tr._block, args, tc.update_interval)
    rep["ring_wire_bytes_per_dev_step"] = int(
        rep["total_step_bytes"] * 2 * (dp - 1) / dp)
    return rep


def main():
    print("devices:", jax.device_count(), flush=True)
    out = {"n_virtual_devices": jax.device_count(), "dp": {},
           "note": ("weak_scaling ms/step: single-core CPU host => all dp "
                    "virtual devices serialize on one core; ~linear-in-dp "
                    "wall IS flat per-device work (see docstring)")}
    t1 = weak_scaling_time(1)
    out["dp1_ms_per_step_cpu"] = round(t1, 1)
    for dp in (2, 4, 8):
        if jax.device_count() % dp or dp > jax.device_count():
            continue
        ms = weak_scaling_time(dp)
        comm = production_comm(dp)
        out["dp"][str(dp)] = {
            "weak_scaling_ms_per_step_cpu": round(ms, 1),
            "weak_scaling_efficiency_vs_dp1": round(ms / (dp * t1), 3),
            "collectives_per_block_bytes": comm["per_block"],
            "comm_step_MB_logical": round(
                comm["total_step_bytes"] / 1e6, 2),
            "comm_step_MB_ring_wire_per_dev": round(
                comm["ring_wire_bytes_per_dev_step"] / 1e6, 2),
        }
        print(f"dp={dp}: {ms:.1f} ms/step (weak, CPU), "
              f"{out['dp'][str(dp)]['comm_step_MB_logical']} MB/step "
              f"logical collectives "
              f"({out['dp'][str(dp)]['comm_step_MB_ring_wire_per_dev']} MB "
              f"ring wire/dev)", flush=True)
    # ICI context: v5e 1.6 TB/s bidirectional per chip -> the psum join's
    # wire time at these volumes, for the prediction record
    for dp, rec in out["dp"].items():
        rec["ici_est_ms_at_400GBps"] = round(
            rec["comm_step_MB_ring_wire_per_dev"] / 400.0, 3)
    os.makedirs("bench_runs", exist_ok=True)
    path = os.path.join("bench_runs", "r5_multichip_perf.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
