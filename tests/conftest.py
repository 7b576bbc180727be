"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The session's sitecustomize dials the shared TPU pool at interpreter
startup whenever PALLAS_AXON_POOL_IPS is set — before this conftest ever
imports — so merely setting JAX_PLATFORMS here would be silently
ineffective: a bare `python -m pytest tests/` would run the whole unit
suite against the shared TPU (minutes per test, precision failures).
When we detect that situation we re-exec the identical pytest invocation
with a scrubbed environment.
"""

import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("_ARNERF_TESTS_SCRUBBED") != "1"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_ARNERF_TESTS_SCRUBBED"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    print("conftest: TPU session env detected; re-exec'ing tests on the "
          "virtual CPU mesh (see run_tests.sh)", file=sys.stderr, flush=True)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# force CPU even when the session environment points JAX at a TPU backend
# (JAX_PLATFORMS=axon): unit tests must run on the virtual device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # fail fast if something upstream still pinned a non-CPU backend
    import jax
    backend = jax.default_backend()
    assert backend == "cpu", (
        f"unit tests must run on the virtual CPU mesh, got backend "
        f"{backend!r}; use ./run_tests.sh")
