"""Integration tests for the simulation runtime.

Modeled on flygym ``tests/core/test_simulation.py``: step advances time,
joint angles ≈ neutral pose after reset, quaternions unit-norm, readout
shapes, wrong-length ctrl raises, warmup, profiling counters.
"""

import numpy as np
import pytest

import flygym_tpu
from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AxisOrder,
    JointPreset,
    Skeleton,
)
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.utils.math import Rotation3D

FLY = "simfly"


@pytest.fixture(scope="module")
def world():
    fly = Fly(name=FLY)
    skeleton = Skeleton(
        axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=JointPreset.LEGS_ONLY
    )
    fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    fly.add_actuators(
        dofs,
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    fly.add_joint_sites(fly.skeleton.anatomical_joints)
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return world


@pytest.fixture(scope="module")
def sim(world):
    return flygym_tpu.Simulation(world)


class TestBasics:
    def test_world_without_fly_raises(self):
        with pytest.raises(ValueError):
            flygym_tpu.Simulation(FlatGroundWorld())

    def test_step_advances_time(self, sim):
        sim.reset()
        t0 = sim.time
        sim.step()
        assert sim.time == pytest.approx(t0 + sim.timestep, abs=1e-9)

    def test_timestep_default(self, sim):
        assert sim.timestep == pytest.approx(1e-4)

    def test_reset_restores_neutral(self, sim, world):
        sim.reset()
        angles_neutral = sim.get_joint_angles(FLY)
        for _ in range(50):
            sim.step()
        sim.reset()
        assert np.allclose(sim.get_joint_angles(FLY), angles_neutral)
        assert sim.time == 0.0
        assert np.all(sim.get_joint_velocities(FLY) == 0)

    def test_neutral_pose_matches_preset(self, sim, world):
        sim.reset()
        fly = world.fly_lookup[FLY]
        pose = KinematicPosePreset.NEUTRAL.get_pose_by_axis_order(
            AxisOrder.YAW_PITCH_ROLL
        )
        angles = sim.get_joint_angles(FLY)
        for dof, angle in zip(fly.get_jointdofs_order(), angles):
            expected = pose.joint_angles_lookup_rad.get(dof.name, 0.0)
            assert angle == pytest.approx(expected, abs=1e-6), dof.name

    def test_warmup_settles(self, sim):
        sim.reset()
        sim.set_leg_adhesion_states(FLY, np.ones(6))
        sim.warmup(0.05)
        assert sim.time == pytest.approx(0.05, abs=1e-6)
        # After settling briefly, velocities should be bounded (no explosion).
        assert np.abs(sim.get_joint_velocities(FLY)).max() < 200


class TestReadouts:
    def test_shapes(self, sim):
        sim.reset()
        sim.step()
        assert sim.get_joint_angles(FLY).shape == (66,)
        assert sim.get_joint_velocities(FLY).shape == (66,)
        assert sim.get_body_positions(FLY).shape == (69, 3)
        assert sim.get_body_rotations(FLY).shape == (69, 4)
        assert sim.get_site_positions(FLY).shape == (48, 3)
        assert sim.get_actuator_forces(FLY, ActuatorType.POSITION).shape == (42,)

    def test_quaternions_unit_norm(self, sim):
        sim.reset()
        sim.step()
        quats = sim.get_body_rotations(FLY)
        assert np.allclose(np.linalg.norm(quats, axis=1), 1.0, atol=1e-5)

    def test_ground_contact_info_shapes(self, sim):
        sim.reset()
        sim.step()
        found, forces, torques, pos, normal, tangent = sim.get_ground_contact_info(
            FLY
        )
        assert found.shape == (6,)
        for arr in (forces, torques, pos, normal, tangent):
            assert arr.shape == (6, 3)
        assert np.allclose(normal, [0, 0, 1])

    def test_sites_at_joint_origins(self, sim, world):
        sim.reset()
        fly = world.fly_lookup[FLY]
        site_pos = sim.get_site_positions(FLY)
        body_pos = sim.get_body_positions(FLY)
        segs = fly.get_bodysegs_order()
        for joint, spos in zip(fly.get_sites_order(), site_pos):
            child_idx = segs.index(joint.child)
            assert np.allclose(spos, body_pos[child_idx], atol=1e-5)


class TestControl:
    def test_wrong_length_ctrl_raises(self, sim):
        with pytest.raises(ValueError):
            sim.set_actuator_inputs(FLY, ActuatorType.POSITION, np.zeros(5))

    def test_wrong_length_adhesion_raises(self, sim):
        with pytest.raises(ValueError):
            sim.set_leg_adhesion_states(FLY, np.ones(3))

    def test_position_control_moves_joints(self, sim, world):
        sim.reset()
        fly = world.fly_lookup[FLY]
        order_all = fly.get_jointdofs_order()
        order_act = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
        targets = np.array(
            [fly.jointdof_to_neutralaction_by_type[ActuatorType.POSITION][d]
             for d in order_act]
        )
        targets = targets + 0.3
        sim.set_actuator_inputs(FLY, ActuatorType.POSITION, targets)
        for _ in range(300):
            sim.step()
        angles = sim.get_joint_angles(FLY)
        moved = [
            angles[order_all.index(d)] for d in order_act
        ]
        # Joints should have moved toward the offset targets.
        neutral = targets - 0.3
        assert np.mean(np.abs(np.array(moved) - neutral)) > 0.05

    def test_adhesion_increases_grip(self, sim):
        sim.reset()
        sim.set_leg_adhesion_states(FLY, np.full(6, 100.0))
        sim.warmup(0.03)
        found, forces, *_ = sim.get_ground_contact_info(FLY)
        assert found.sum() >= 4  # most legs latched to the ground


class TestRollout:
    def test_rollout_matches_stepping(self, world):
        sim_a = flygym_tpu.Simulation(world)
        sim_b = flygym_tpu.Simulation(world)
        for _ in range(20):
            sim_a.step()
        traj = sim_b.rollout(None, 20)
        assert traj.shape == (20, sim_b.model.nq)
        assert np.allclose(
            np.asarray(sim_a.state.qpos), np.asarray(traj[-1]), atol=1e-6
        )

    def test_profile_counters(self, sim):
        sim.reset()
        for _ in range(3):
            sim.step_with_profile()
        assert sim._curr_step == 3
        assert sim._total_physics_time_ns > 0
        sim.print_performance_report(show_in_notebook=False)
