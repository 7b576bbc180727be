"""TPU-native compute ops (XLA + Pallas) replacing the reference's CUDA
extension `vren` (reference: models/csrc/) and tinycudann."""

from .morton import morton3d, morton3d_invert
from .packbits import packbits, unpackbits
from .intersection import ray_aabb_intersect, ray_sphere_intersect
from .trunc_exp import trunc_exp
from .sh import sh_encode
from .hashgrid import HashGridConfig, hashgrid_init, hashgrid_encode
from .segments import (dense_segment_sum, dense_segment_sum_batched,
                       dense_segment_max)
