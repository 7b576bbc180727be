"""Device-mesh helpers.

The reference scales with PyTorch-Lightning DDP over NCCL
(reference train.py:286-291, opt.py:49-50). The TPU-native equivalent is a
1-D data mesh: ray batches are independent work items, gradients join with a
psum over ICI, and parameters stay replicated (the whole model is ~17M
params — far below the per-chip HBM where sharding them would pay).
Multi-host runs initialize with jax.distributed and reuse the same mesh
over the global device list.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def maybe_init_distributed():
    """Multi-host entry (DCN): no-op on single host.

    On managed TPU pods jax.distributed.initialize() auto-detects the
    coordinator; for manual multi-host launches set
    JAX_COORDINATOR_ADDRESS (host:port) plus JAX_NUM_PROCESSES and
    JAX_PROCESS_ID on every process. Replaces the reference's DDP
    process-group init (reference train.py:286-291 / NCCL).
    Returns True if distributed mode was initialized."""
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if n is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(n),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()
    return True
