from .mesh import make_mesh
from .dp import make_dp_train_step
from .tp import make_mesh_2d
