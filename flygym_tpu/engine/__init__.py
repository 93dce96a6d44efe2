"""TPU-native physics engine: a pure-JAX articulated rigid-body dynamics
pipeline (forward kinematics, CRBA mass matrix, RNEA bias forces, soft-contact
solver) that replaces the MuJoCo C engine / MuJoCo-Warp CUDA layer of the
reference (SURVEY.md §2.3).

Everything here is functional, shape-static, jittable, and vmappable over a
leading world axis.
"""

from flygym_tpu.engine.model import PhysicsModel, State
from flygym_tpu.engine.step import step, make_step_fn

__all__ = ["PhysicsModel", "State", "step", "make_step_fn"]
