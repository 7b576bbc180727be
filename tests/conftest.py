"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Must run before jax initializes its backends, hence env vars at import time.
"""

import os

# force CPU even when the session environment points JAX at a TPU backend
# (JAX_PLATFORMS=axon): unit tests must run on the virtual device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
