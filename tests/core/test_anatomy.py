"""Unit tests for the anatomy data layer.

Modeled on the reference test strategy (flygym ``tests/core/test_anatomy.py``):
constants, enums, presets, skeleton/tree validation.
"""

import pytest

pytestmark = pytest.mark.fast

from flygym_tpu.anatomy import (
    ALL_CONNECTED_SEGMENT_PAIRS,
    ALL_SEGMENT_NAMES,
    ANTENNA_LINKS,
    BODY_POSITIONS,
    LEG_LINKS,
    LEGS,
    PASSIVE_TARSAL_LINKS,
    SIDES,
    ActuatedDOFPreset,
    AnatomicalJoint,
    AxesSet,
    AxisOrder,
    BodySegment,
    ContactBodiesPreset,
    JointDOF,
    JointPreset,
    RotationAxis,
    Skeleton,
)


class TestConstants:
    def test_segment_counts(self):
        assert len(ALL_SEGMENT_NAMES) == 69
        assert len(ALL_CONNECTED_SEGMENT_PAIRS) == 68  # a tree: n - 1 edges
        assert len(set(ALL_SEGMENT_NAMES)) == 69

    def test_legs(self):
        assert LEGS == ["lf", "lm", "lh", "rf", "rm", "rh"]
        assert SIDES == ["l", "r"]
        assert BODY_POSITIONS[0] == "c"

    def test_leg_links(self):
        assert LEG_LINKS[0] == "coxa"
        assert LEG_LINKS[-1] == "tarsus5"
        assert "trochanterfemur" in LEG_LINKS  # fused segment
        assert "femur" not in LEG_LINKS
        assert PASSIVE_TARSAL_LINKS == ["tarsus2", "tarsus3", "tarsus4", "tarsus5"]

    def test_all_leg_segments_present(self):
        for leg in LEGS:
            for link in LEG_LINKS:
                assert f"{leg}_{link}" in ALL_SEGMENT_NAMES

    def test_antenna_chain(self):
        assert ANTENNA_LINKS == ["pedicel", "funiculus", "arista"]
        assert ("c_head", "l_pedicel") in ALL_CONNECTED_SEGMENT_PAIRS
        assert ("l_pedicel", "l_funiculus") in ALL_CONNECTED_SEGMENT_PAIRS


class TestRotationAxis:
    def test_aliases(self):
        assert RotationAxis("p") is RotationAxis.PITCH
        assert RotationAxis("R") is RotationAxis.ROLL
        assert RotationAxis("yaw") is RotationAxis.YAW
        assert RotationAxis(RotationAxis.PITCH) is RotationAxis.PITCH

    def test_vectors(self):
        assert RotationAxis.PITCH.to_vector() == (0, 1, 0)
        assert RotationAxis.ROLL.to_vector() == (0, 0, 1)
        assert RotationAxis.YAW.to_vector() == (1, 0, 0)

    def test_letters(self):
        assert RotationAxis.PITCH.to_letter_xyz() == "y"
        assert RotationAxis.ROLL.to_letter_xyz() == "z"
        assert RotationAxis.YAW.to_letter_xyz() == "x"

    def test_invalid(self):
        with pytest.raises(ValueError):
            RotationAxis("q")


class TestAxesSet:
    def test_coercion(self):
        s = AxesSet(["p", "roll"])
        assert RotationAxis.PITCH in s and RotationAxis.ROLL in s
        s.add("y")
        assert RotationAxis.YAW in s
        s.remove("pitch")
        assert RotationAxis.PITCH not in s


class TestAxisOrder:
    def test_aliases(self):
        assert AxisOrder.YPR is AxisOrder.YAW_PITCH_ROLL
        assert AxisOrder("yaw_pitch_roll") is AxisOrder.YAW_PITCH_ROLL
        assert AxisOrder(["yaw", "pitch", "roll"]) is AxisOrder.YAW_PITCH_ROLL
        assert AxisOrder.DONTCARE is AxisOrder.PITCH_ROLL_YAW

    def test_six_orders(self):
        orders = {
            AxisOrder.PRY,
            AxisOrder.PYR,
            AxisOrder.RPY,
            AxisOrder.RYP,
            AxisOrder.YPR,
            AxisOrder.YRP,
        }
        assert len(orders) == 6

    def test_conversions(self):
        assert AxisOrder.YAW_PITCH_ROLL.to_letters_xyz() == "xyz"
        assert AxisOrder.PITCH_ROLL_YAW.to_letters_xyz() == "yzx"
        assert AxisOrder.YPR.to_str() == "yaw_pitch_roll"
        assert AxisOrder.YPR.to_list_of_str() == ["yaw", "pitch", "roll"]


class TestBodySegment:
    def test_pos_link(self):
        seg = BodySegment("lf_tibia")
        assert seg.pos == "lf" and seg.link == "tibia"
        assert seg.is_leg() and not seg.is_thorax()

    def test_predicates(self):
        assert BodySegment("c_thorax").is_thorax()
        assert BodySegment("c_head").is_head()
        assert BodySegment("l_eye").is_eye()
        assert BodySegment("r_wing").is_wing()
        assert BodySegment("l_haltere").is_haltere()
        assert BodySegment("c_abdomen3").is_abdomen()
        assert BodySegment("c_rostrum").is_proboscis()
        assert BodySegment("l_funiculus").is_antenna()

    def test_invalid_name(self):
        with pytest.raises(ValueError):
            BodySegment("c_femur")


class TestJointDOF:
    def test_name_roundtrip(self):
        dof = JointDOF("c_thorax", "lf_coxa", "pitch")
        assert dof.name == "c_thorax-lf_coxa-pitch"
        assert JointDOF.from_name(dof.name) == dof

    def test_invalid_name(self):
        with pytest.raises(ValueError):
            JointDOF.from_name("not-a-joint")


class TestAnatomicalJoint:
    def test_default_axes(self):
        joint = AnatomicalJoint("c_thorax", "lf_coxa")
        assert len(joint.axes) == 3
        assert joint.name == "c_thorax-lf_coxa"

    def test_iter_dofs_order(self):
        joint = AnatomicalJoint("c_thorax", "lf_coxa", ["pitch", "yaw"])
        dofs = list(joint.iter_dofs(AxisOrder.YAW_PITCH_ROLL))
        assert [d.axis for d in dofs] == [RotationAxis.YAW, RotationAxis.PITCH]


class TestJointPreset:
    @pytest.mark.parametrize(
        "preset,n_dofs",
        [
            (JointPreset.ALL_POSSIBLE, 204),
            (JointPreset.ALL_BIOLOGICAL, 126),
            (JointPreset.LEGS_ONLY, 66),
            (JointPreset.LEGS_ACTIVE_ONLY, 42),
        ],
    )
    def test_dof_counts(self, preset, n_dofs):
        joints = preset.to_joint_list()
        total = sum(len(j.axes) for j in joints)
        assert total == n_dofs

    def test_biological_leg_dofs(self):
        joints = {j.name: j for j in JointPreset.ALL_BIOLOGICAL.to_joint_list()}
        assert len(joints["c_thorax-lf_coxa"].axes) == 3
        assert joints["lf_coxa-lf_trochanterfemur"].axes == AxesSet(["pitch", "roll"])
        assert joints["lf_trochanterfemur-lf_tibia"].axes == AxesSet(["pitch"])

    def test_string_coercion(self):
        assert JointPreset("legs_only") is JointPreset.LEGS_ONLY


class TestActuatedDOFPreset:
    def test_filtering(self):
        sk = Skeleton(axis_order="ypr", joint_preset=JointPreset.LEGS_ONLY)
        all_dofs = list(sk.iter_jointdofs())
        assert len(ActuatedDOFPreset.ALL.filter(all_dofs)) == 66
        assert len(ActuatedDOFPreset.LEGS_ONLY.filter(all_dofs)) == 66
        assert len(ActuatedDOFPreset.LEGS_ACTIVE_ONLY.filter(all_dofs)) == 42


class TestContactBodiesPreset:
    def test_counts(self):
        assert len(ContactBodiesPreset.ALL.to_body_segments_list()) == 69
        assert len(ContactBodiesPreset.LEGS_ONLY.to_body_segments_list()) == 48
        assert len(ContactBodiesPreset.TIBIA_TARSUS_ONLY.to_body_segments_list()) == 36
        big = ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
        assert len(big) == 48 + 1 + 5 + 1


class TestSkeleton:
    def test_requires_exactly_one_source(self):
        with pytest.raises(ValueError):
            Skeleton(axis_order="ypr")
        with pytest.raises(ValueError):
            Skeleton(
                axis_order="ypr",
                joint_preset="legs_only",
                anatomical_joints=[AnatomicalJoint("c_thorax", "lf_coxa")],
            )

    def test_dfs_starts_at_root(self):
        sk = Skeleton(axis_order="ypr", joint_preset="legs_only")
        dofs = list(sk.iter_jointdofs("c_thorax"))
        assert dofs[0].parent.name == "c_thorax"
        # Within a joint, DoFs follow the axis order.
        first3 = [d.axis for d in dofs[:3]]
        assert first3 == [RotationAxis.YAW, RotationAxis.PITCH, RotationAxis.ROLL]

    def test_invalid_skeleton_not_a_tree(self):
        joints = [
            AnatomicalJoint("c_thorax", "lf_coxa"),
            # disconnected edge
            AnatomicalJoint("lm_tibia", "lm_tarsus1"),
        ]
        sk = Skeleton(axis_order="ypr", anatomical_joints=joints)
        with pytest.raises(ValueError):
            sk.get_tree()

    def test_deterministic_dof_order(self):
        a = Skeleton(axis_order="ypr", joint_preset="legs_only")
        b = Skeleton(axis_order="ypr", joint_preset="legs_only")
        assert [d.name for d in a.iter_jointdofs()] == [
            d.name for d in b.iter_jointdofs()
        ]
