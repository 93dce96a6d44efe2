"""Integration tests for the composition layer: build real fly models and
inspect the compiled structures.

Modeled on flygym ``tests/core/test_compose.py`` (MJCF structure assertions:
free joint exists, contact sensors present, camera identifiers after attach).
"""

import numpy as np
import pytest

from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AnatomicalJoint,
    AxisOrder,
    BodySegment,
    ContactBodiesPreset,
    JointPreset,
    Skeleton,
)
from flygym_tpu.compose import (
    ActuatorType,
    ContactParams,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
    TetheredWorld,
)
from flygym_tpu.utils.math import Rotation3D


@pytest.fixture(scope="module")
def fly():
    fly = Fly(name="testfly")
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
    fly.colorize()
    fly.add_tracking_camera()
    return fly


@pytest.fixture(scope="module")
def flat_world(fly):
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return world


@pytest.fixture(scope="module")
def compiled(flat_world):
    model, state = flat_world.compile()
    return model, state, flat_world.compiled


class TestFlyComposition:
    def test_all_bodies_present(self, fly):
        assert len(fly.bodyseg_to_specbody) == 69
        assert len(fly.bodyseg_to_specgeom) == 69

    def test_joint_count(self, fly):
        assert len(fly.jointdof_to_specjoint) == 66  # LEGS_ONLY

    def test_actuator_orders(self, fly):
        order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
        assert len(order) == 42  # LEGS_ACTIVE_ONLY
        assert fly.get_legs_order() == ["lf", "lm", "lh", "rf", "rm", "rh"]

    def test_adhesion_per_leg(self, fly):
        assert set(fly.leg_to_adhesionactuator) == set(fly.get_legs_order())
        for act in fly.leg_to_adhesionactuator.values():
            assert act.ctrlrange == (1.0, 100.0)

    def test_sites_order(self, fly):
        assert len(fly.get_sites_order()) == 48  # one per leg anatomical joint

    def test_right_side_axis_flip(self, fly):
        joints = {d.name: j for d, j in fly.jointdof_to_specjoint.items()}
        left = np.asarray(joints["c_thorax-lf_coxa-roll"].axis)
        right = np.asarray(joints["c_thorax-rf_coxa-roll"].axis)
        assert np.allclose(left, -right)
        left_p = np.asarray(joints["c_thorax-lf_coxa-pitch"].axis)
        right_p = np.asarray(joints["c_thorax-rf_coxa-pitch"].axis)
        assert np.allclose(left_p, right_p)  # pitch not flipped

    def test_neutral_angles_recorded(self, fly):
        assert len(fly.jointdof_to_neutralangle) == 66
        nonzero = [a for a in fly.jointdof_to_neutralangle.values() if a != 0]
        assert len(nonzero) > 30

    def test_duplicate_adhesion_raises(self, fly):
        with pytest.raises(ValueError):
            fly.add_leg_adhesion()

    def test_duplicate_site_raises(self, fly):
        with pytest.raises(ValueError):
            fly.add_joint_sites([AnatomicalJoint("c_thorax", "lf_coxa")])

    def test_camera_registered(self, fly):
        assert "trackcam" in fly.cameraname_to_speccamera
        assert fly.cameraname_to_speccamera["trackcam"].fovy == 30.0


class TestWorldComposition:
    def test_fly_registered(self, flat_world, fly):
        assert flat_world.fly_lookup["testfly"] is fly

    def test_duplicate_fly_raises(self, flat_world, fly):
        with pytest.raises(ValueError):
            flat_world.add_fly(fly, (0, 0, 0), Rotation3D("quat", (1, 0, 0, 0)))

    def test_non_quat_rotation_raises(self, fly):
        world = FlatGroundWorld()
        fly2 = Fly(name="f2")
        with pytest.raises(ValueError):
            world.add_fly(fly2, (0, 0, 0), Rotation3D("euler", (0, 0, 0)))

    def test_free_joint_neutral_state(self, flat_world):
        states = flat_world.world_dof_neutral_states
        assert states["testfly/testfly"] == [0, 0, 2.0, 1, 0, 0, 0]

    def test_contact_sensors_per_leg(self, flat_world):
        sensors = flat_world.legpos_to_groundcontactsensors_by_fly["testfly"]
        assert set(sensors) == {"lf", "lm", "lh", "rf", "rm", "rh"}


class TestCompiledModel:
    def test_dimensions(self, compiled):
        model, _, _ = compiled
        assert model.nbody == 70  # 69 segments + world
        assert model.nhinge == 66
        assert model.nq == 7 + 66
        assert model.nv == 6 + 66
        assert model.nu == 42 + 6
        assert model.nsensor_contact == 6

    def test_contact_candidates(self, compiled):
        model, _, _ = compiled
        # LEGS_THORAX_ABDOMEN_HEAD = 55 segments x 2 capsule ends.
        assert model.ncand == 55 * 2

    def test_namespaced_identifiers(self, compiled):
        _, _, artifacts = compiled
        assert "testfly/c_thorax" in artifacts.body_name2id
        assert "testfly/c_thorax-lf_coxa-yaw" in artifacts.hinge_name2id

    def test_neutral_keyframe(self, compiled):
        model, state, _ = compiled
        qpos0 = np.asarray(model.qpos0)
        assert np.allclose(qpos0[:7], [0, 0, 2.0, 1, 0, 0, 0])
        # Adhesion neutral ctrl is 0 (clamped to 1 at runtime).
        assert np.asarray(state.qvel).max() == 0

    def test_total_mass_is_fly_like(self, compiled):
        model, _, _ = compiled
        total = float(np.asarray(model.body_mass).sum())
        assert 0.5e-3 < total < 2e-3  # ~1 mg in kg

    def test_levels_partition_bodies(self, compiled):
        model, _, _ = compiled
        all_bodies = sorted(b for level in model.levels for b in level)
        assert all_bodies == list(range(model.nbody))

    def test_tibia_tarsus_only_preset(self, fly):
        fly2 = Fly(name="f3")
        fly2.add_joints(
            Skeleton(axis_order="ypr", joint_preset="legs_only"),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        world = FlatGroundWorld()
        world.add_fly(
            fly2,
            (0, 0, 2),
            Rotation3D("quat", (1, 0, 0, 0)),
            bodysegs_with_ground_contact=ContactBodiesPreset.TIBIA_TARSUS_ONLY,
        )
        model, _ = world.compile()
        assert model.ncand == 36 * 2

    def test_custom_contact_params_flow_through(self):
        fly = Fly(name="f4")
        fly.add_joints(
            Skeleton(axis_order="ypr", joint_preset="legs_only"),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        params = ContactParams(sliding_friction=2.5, margin=4e-3)
        world = FlatGroundWorld()
        world.add_fly(
            fly,
            (0, 0, 2),
            Rotation3D("quat", (1, 0, 0, 0)),
            ground_contact_params=params,
        )
        model, _ = world.compile()
        assert np.allclose(np.asarray(model.can_friction)[:, 0], 2.5)
        assert np.allclose(np.asarray(model.can_margin), 4e-3)


class TestTetheredWorld:
    def test_no_free_joint(self):
        fly = Fly(name="f5")
        fly.add_joints(
            Skeleton(axis_order="ypr", joint_preset="legs_only"),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        world = TetheredWorld()
        world.add_fly(fly, (1, 2, 3), Rotation3D("quat", (1, 0, 0, 0)))
        model, state = world.compile()
        assert model.nq == 66 and model.nv == 66
        assert len(model.free_joints) == 0
        # Root body fixed at the spawn position.
        root = world.compiled.body_name2id["f5/c_thorax"]
        assert np.allclose(np.asarray(state.xpos[root]), [1, 2, 3])


class TestXMLExport:
    def test_export_roundtrip_in_mujoco(self, flat_world, tmp_path):
        mujoco = pytest.importorskip("mujoco")
        path = tmp_path / "world.xml"
        flat_world.save_xml_with_assets(path)
        m = mujoco.MjModel.from_xml_string(path.read_text())
        assert m.nbody == 70
        assert m.nu == 48
