"""arnerf_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP NeRF framework with
an AR object-insertion subsystem.

Re-designed from scratch with the capabilities of YessionCC/AR-NeRF (an
ngp_pl / Instant-NGP fork; see /root/reference): multiresolution hash-grid
NeRF training with occupancy-grid-guided ray marching, fused volume
rendering, dataset loaders, data-parallel training over TPU meshes, an
interactive renderer, and the AR insertion stage (SH/SG lighting, shadow
fields, PBR relighting).

Design stance (TPU-first, not a port):
  * fixed shapes everywhere: ray marching emits a compact, statically-sized
    sample buffer with validity masks instead of the reference's
    atomic-compaction CUDA kernels (models/csrc/raymarching.cu).
  * compositing / distortion losses are segmented prefix-sum formulations
    (contiguous per-ray segments -> global cumsum + gather), so JAX autodiff
    provides the backward passes that the reference hand-writes in CUDA
    (models/csrc/volumerendering.cu, losses.cu).
  * the model is a pure-function + pytree-of-params design; a training step
    is a single jitted function (donated buffers) including ray sampling,
    marching, field eval, compositing, loss and the optimizer update.
  * multi-chip scaling uses jax.sharding.Mesh + shard_map with psum over ICI
    (replacing the reference's PyTorch-Lightning DDP/NCCL, train.py:286-291).
"""

__version__ = "0.1.0"

MAX_SAMPLES = 1024     # reference: models/rendering.py:9
NEAR_DISTANCE = 0.01   # reference: models/rendering.py:10
