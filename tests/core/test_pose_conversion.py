"""Tests for axis-order pose conversion (differentiable IK) and the legacy
name mapping."""

import numpy as np
import pytest

from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, AxisOrder, JointPreset
from flygym_tpu.compose import KinematicPosePreset
from flygym_tpu.utils.api1to2 import (
    BODY_NAMES_NEW2OLD,
    BODY_NAMES_OLD2NEW,
    get_body_name_old2new_lookup,
)


class TestApi1to2:
    def test_all_new_names_valid(self):
        for new in BODY_NAMES_OLD2NEW.values():
            assert new in ALL_SEGMENT_NAMES, new

    def test_complete_coverage(self):
        assert len(BODY_NAMES_OLD2NEW) == 69
        assert set(BODY_NAMES_OLD2NEW.values()) == set(ALL_SEGMENT_NAMES)

    def test_examples(self):
        lut = get_body_name_old2new_lookup()
        assert lut["Thorax"] == "c_thorax"
        assert lut["A1A2"] == "c_abdomen12"
        assert lut["A4"] == "c_abdomen4"
        assert lut["LFFemur"] == "lf_trochanterfemur"
        assert lut["RHTarsus5"] == "rh_tarsus5"
        assert lut["LEye"] == "l_eye"
        assert BODY_NAMES_NEW2OLD["rm_tibia"] == "RMTibia"


@pytest.mark.slow
class TestPoseConversion:
    def test_axis_order_roundtrip(self):
        """Converting the neutral pose YPR → PRY must reproduce the same body
        poses (checked through FK on the converted pose)."""
        from flygym_tpu.compose.fly import Fly
        from flygym_tpu.anatomy import Skeleton
        from flygym_tpu.utils.pose_conversion import convert_pose_axis_order

        pose = KinematicPosePreset.NEUTRAL.get_pose_by_axis_order(AxisOrder.YPR)
        converted = convert_pose_axis_order(
            pose, AxisOrder.PRY, joint_preset=JointPreset.LEGS_ONLY
        )
        assert converted.axis_order is AxisOrder.PRY

        # FK both poses and compare body positions.
        def fk(p, order):
            fly = Fly()
            fly.add_joints(
                Skeleton(axis_order=order, joint_preset=JointPreset.LEGS_ONLY),
                neutral_pose=p,
            )
            _model, state = fly.compile()
            return np.asarray(state.xpos)

        xpos_ref = fk(pose, AxisOrder.YPR)
        xpos_conv = fk(converted, AxisOrder.PRY)
        err = np.abs(xpos_ref - xpos_conv).max()
        assert err < 0.1, err  # body positions reproduced within 0.1 mm
