"""End-to-end coverage for the larger joint presets.

The rest of the suite exercises LEGS_ONLY (66 DoFs); the reference equally
supports ALL_BIOLOGICAL (126) and ALL_POSSIBLE (204) skeletons end to end
(flygym ``anatomy.py:388-460`` presets feeding ``fly.py:221-299`` /
``simulation.py``). These tests pin that the compiler and engine handle the
full DoF range: compile, step, and settle without NaNs.
"""

import numpy as np
import pytest

import flygym_tpu
from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.utils.math import Rotation3D


def _world_with_preset(preset):
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=preset),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return world


@pytest.mark.slow
class TestLargePresets:
    def test_all_biological_settles(self):
        world = _world_with_preset(JointPreset.ALL_BIOLOGICAL)
        model, _ = world.compile()
        assert model.nv == 126 + 6  # joint DoFs + free root
        sim = flygym_tpu.Simulation(world)
        sim.set_leg_adhesion_states("f", np.ones(6))
        sim.rollout(None, 400)
        qpos = np.asarray(sim.state.qpos)
        assert np.isfinite(qpos).all()
        assert 0.7 < float(qpos[2]) < 1.4  # settled on its feet

    def test_all_possible_steps(self):
        world = _world_with_preset(JointPreset.ALL_POSSIBLE)
        model, _ = world.compile()
        assert model.nv == 204 + 6
        sim = flygym_tpu.Simulation(world)
        sim.set_leg_adhesion_states("f", np.ones(6))
        sim.rollout(None, 100)
        assert np.isfinite(np.asarray(sim.state.qpos)).all()
        assert float(sim.state.time) > 0.009
