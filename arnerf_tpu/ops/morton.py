"""3D Morton (Z-order) encode/decode as pure XLA integer bit ops.

TPU-native equivalent of the reference CUDA kernels `morton3D_kernel` /
`morton3D_invert_kernel` (reference: models/csrc/raymarching.cu:35-119).
The magic-constant bit-spreading is standard 10-bit 3D Morton interleaving;
on TPU these are plain VPU integer ops, no kernel required.

Note: unlike the reference, the occupancy grid in this framework is stored
in row-major (x-fastest) order rather than Morton order — Morton order only
helps GPU cache locality for the DDA marcher, which we replace with a
vectorized candidate-lattice march (see ops/marching.py). These ops are kept
for API parity, tests, and tools that exchange Morton-indexed grids.
"""

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are two zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compact_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _expand_bits: gather every third bit into the low 10 bits."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x0000FFFF)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """Interleave (..., 3) int coords (each < 1024) into Morton codes (...,).

    Matches `vren.morton3D` (reference: models/csrc/raymarching.cu:62-88).
    """
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """Decode Morton codes (...,) back to (..., 3) int coords.

    Matches `vren.morton3D_invert` (reference: models/csrc/raymarching.cu:90-119).
    """
    idx = indices.astype(jnp.uint32)
    x = _compact_bits(idx)
    y = _compact_bits(idx >> 1)
    z = _compact_bits(idx >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
