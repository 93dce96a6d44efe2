"""Golden tests for muscle and cylinder actuators vs MuJoCo.

Muscle lengthrange estimation is disabled in the exported MJCF
(<lengthrange mode="none">); the test injects the same lengthrange/acc0
values into the compiled MuJoCo model that the TPU compiler computed, then
steps both engines side by side.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.golden

mujoco = pytest.importorskip("mujoco")

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    KinematicPosePreset,
    TetheredWorld,
)
from flygym_tpu.utils.math import Rotation3D

import flygym_tpu


def _build(actuator_type, **act_kwargs):
    fly = Fly(name="muscfly")
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


def _mujoco_with_muscle_params(world):
    world.compile()
    m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
    model = world.compiled.model
    # Inject the TPU compiler's lengthrange + acc0 (estimation disabled).
    m.actuator_lengthrange[:] = np.asarray(model.act_lengthrange)
    m.actuator_acc0[:] = np.asarray(model.act_acc0)
    return m


def _compare(world, m, ctrl_value, n_steps, tol):
    sim = flygym_tpu.Simulation(world)
    fly_name = next(iter(world.fly_lookup))
    fly = world.fly_lookup[fly_name]
    ty = next(t for t in ActuatorType if fly.jointdof_to_specactuator_by_type[t])
    n = len(fly.get_actuated_jointdofs_order(ty))
    sim.set_actuator_inputs(fly_name, ty, np.full(n, ctrl_value, np.float32))

    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    d.ctrl[:] = ctrl_value

    names = list(world.compiled.hinge_name2id)
    hq_mj = np.array(
        [
            m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, nm)]
            for nm in names
        ]
    )
    hq_me = np.array([world.compiled.hinge_qadr[nm] for nm in names])
    for _ in range(n_steps):
        sim.step()
        mujoco.mj_step(m, d)
    err = np.abs(sim.state.qpos[hq_me] - d.qpos[hq_mj]).max()
    assert err < tol, err
    return sim, d


class TestMuscleGolden:
    def test_muscle_contraction_matches(self):
        _fly, world = _build(
            ActuatorType.MUSCLE,
            lengthrange=(-1.0, 1.0),
            forcelimited=False,
            forcerange=(-50, 50),
            ctrlrange=(0.0, 1.0),
        )
        m = _mujoco_with_muscle_params(world)
        sim, d = _compare(world, m, ctrl_value=0.8, n_steps=150, tol=2e-3)
        # Activations built up and stay in [0, 1].
        act = np.asarray(sim.state.act)
        assert act.shape[0] == world.compiled.model.nu
        assert np.all(act >= 0) and np.all(act <= 1)
        assert act.max() > 0.3
        assert np.allclose(act, d.act, atol=5e-3)

    def test_muscle_force_is_contractile_only(self):
        _fly, world = _build(
            ActuatorType.MUSCLE,
            lengthrange=(-1.0, 1.0),
            forcelimited=False,
            forcerange=(-50, 50),
            ctrlrange=(0.0, 1.0),
        )
        sim = flygym_tpu.Simulation(world)
        fly_name = next(iter(world.fly_lookup))
        n = len(
            world.fly_lookup[fly_name].get_actuated_jointdofs_order(
                ActuatorType.MUSCLE
            )
        )
        sim.set_actuator_inputs(fly_name, ActuatorType.MUSCLE, np.ones(n))
        for _ in range(100):
            sim.step()
        forces = sim.get_actuator_forces(fly_name, ActuatorType.MUSCLE)
        assert np.all(forces <= 1e-6)  # muscles only pull


class TestCylinderGolden:
    def test_cylinder_filter_matches(self):
        _fly, world = _build(
            ActuatorType.CYLINDER,
            area=2.0,
            dynprm=(0.05, 0.0, 0.0),
            forcelimited=True,
            forcerange=(-10, 10),
        )
        m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
        _compare(world, m, ctrl_value=0.5, n_steps=150, tol=2e-3)
