#!/bin/bash
# Run the unit test suite on CPU with a virtual 8-device mesh.
#
# PALLAS_AXON_POOL_IPS must be cleared BEFORE the interpreter starts:
# the session's sitecustomize dials the TPU pool at interpreter startup
# (taking minutes) whenever it is set, even for CPU-only runs.
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
