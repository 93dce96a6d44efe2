"""Golden actuator-semantics tests vs MuJoCo: motor, velocity, position."""

import numpy as np
import pytest

pytestmark = pytest.mark.golden

import jax

mujoco = pytest.importorskip("mujoco")

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    KinematicPosePreset,
    TetheredWorld,
)
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D

import flygym_tpu


def _build(actuator_type, **act_kwargs):
    fly = Fly(name="actfly")
    fly.add_joints(
        Skeleton(
            axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ACTIVE_ONLY
        ),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset("all")
    fly.add_actuators(dofs, actuator_type, **act_kwargs)
    world = TetheredWorld()
    world.add_fly(fly, (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
    return fly, world


def _compare(world, ctrl_value, n_steps=120, tol=2e-4):
    sim = flygym_tpu.Simulation(world)
    fly_name = next(iter(world.fly_lookup))
    fly = world.fly_lookup[fly_name]
    ty = next(
        t for t in ActuatorType if fly.jointdof_to_specactuator_by_type[t]
    )
    n = len(fly.get_actuated_jointdofs_order(ty))
    sim.set_actuator_inputs(fly_name, ty, np.full(n, ctrl_value, np.float32))

    m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    names = list(world.compiled.hinge_name2id)
    hq_mj = np.array(
        [
            m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, nm)]
            for nm in names
        ]
    )
    hq_me = np.array([world.compiled.hinge_qadr[nm] for nm in names])
    for ai in range(m.nu):
        d.ctrl[ai] = ctrl_value

    for _ in range(n_steps):
        sim.step()
        mujoco.mj_step(m, d)
    err = np.abs(sim.state.qpos[hq_me] - d.qpos[hq_mj]).max()
    assert err < tol, err


class TestActuatorGolden:
    def test_motor_torque_steps(self):
        _fly, world = _build(ActuatorType.MOTOR, forcerange=(-5, 5))
        _compare(world, ctrl_value=0.5)

    def test_velocity_servo(self):
        _fly, world = _build(ActuatorType.VELOCITY, kv=2.0)
        _compare(world, ctrl_value=1.0, tol=5e-4)

    def test_position_servo_with_kv(self):
        _fly, world = _build(ActuatorType.POSITION, kp=30.0, kv=0.5)
        _compare(world, ctrl_value=0.3, tol=5e-4)

    def test_force_clamping(self):
        """Forcerange clamps identically to MuJoCo."""
        _fly, world = _build(
            ActuatorType.MOTOR, forcelimited=True, forcerange=(-0.3, 0.3)
        )
        _compare(world, ctrl_value=50.0, tol=5e-4)
