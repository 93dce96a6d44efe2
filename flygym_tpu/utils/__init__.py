from flygym_tpu.utils.exceptions import FlyGymInternalError
from flygym_tpu.utils.math import Tree, orderedset, Rotation3D

__all__ = ["FlyGymInternalError", "Tree", "orderedset", "Rotation3D"]
