"""Occupancy-grid bit packing as XLA reshape + dot — TPU-native equivalent of
the reference CUDA `packbits_kernel` (reference: models/csrc/raymarching.cu:122-161).

The marcher in this framework consumes a plain uint8 0/1 occupancy grid
(one byte per cell; see ops/marching.py) because a byte gather is cheaper on
TPU than gather+bit-extract. The packed uint8 bitfield (8 cells/byte, LSB
first — the reference's layout) is still produced for checkpoint/API parity.
"""

import numpy as np
import jax.numpy as jnp

# host-side constant: a module-level jnp array would become a leaked tracer
# if this module is first imported inside an active jit trace (lazy imports
# in jitted code paths do happen)
_BIT_WEIGHTS = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


def packbits(density_grid: jnp.ndarray, density_threshold) -> jnp.ndarray:
    """Pack (density_grid > threshold) into a uint8 bitfield, LSB-first.

    density_grid: (..., N) with N divisible by 8 (flattened grid).
    Returns: (..., N//8) uint8.
    """
    occ = (density_grid > density_threshold).astype(jnp.uint8)
    occ = occ.reshape(*occ.shape[:-1], -1, 8)
    return jnp.sum(occ * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """Inverse of packbits: (..., M) uint8 -> (..., M*8) uint8 in {0, 1}."""
    bits = (bitfield[..., None] & _BIT_WEIGHTS) > 0
    return bits.reshape(*bitfield.shape[:-1], -1).astype(jnp.uint8)
