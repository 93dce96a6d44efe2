"""Tests for KinematicPose loading, mirroring, and presets.

Modeled on flygym ``tests/core/test_pose.py``.
"""

import json
import math

import pytest

pytestmark = pytest.mark.fast

from flygym_tpu.anatomy import AxisOrder
from flygym_tpu.compose.pose import KinematicPose, KinematicPosePreset


class TestKinematicPose:
    def test_from_dict(self):
        pose = KinematicPose(
            joint_angles_rad_dict={"c_thorax-lf_coxa-pitch": 0.5},
            axis_order="ypr",
            mirror_left2right=False,
        )
        assert pose.joint_angles_lookup_rad == {"c_thorax-lf_coxa-pitch": 0.5}
        assert pose.axis_order is AxisOrder.YPR

    def test_requires_exactly_one_source(self):
        with pytest.raises(ValueError):
            KinematicPose()
        with pytest.raises(ValueError):
            KinematicPose(
                path="x.yaml",
                joint_angles_rad_dict={},
                axis_order="ypr",
            )

    def test_axis_order_required_with_dict(self):
        with pytest.raises(ValueError):
            KinematicPose(joint_angles_rad_dict={})

    def test_mirroring(self):
        pose = KinematicPose(
            joint_angles_rad_dict={
                "c_thorax-lf_coxa-pitch": 0.3,
                "lf_coxa-lf_trochanterfemur-roll": -0.2,
            },
            axis_order="ypr",
        )
        angles = pose.joint_angles_lookup_rad
        # Mirrored one-to-one: anatomical convention keeps the same sign.
        assert angles["c_thorax-rf_coxa-pitch"] == 0.3
        assert angles["rf_coxa-rf_trochanterfemur-roll"] == -0.2

    def test_mirroring_does_not_overwrite(self):
        pose = KinematicPose(
            joint_angles_rad_dict={
                "c_thorax-lf_coxa-pitch": 0.3,
                "c_thorax-rf_coxa-pitch": 0.9,
            },
            axis_order="ypr",
        )
        assert pose.joint_angles_lookup_rad["c_thorax-rf_coxa-pitch"] == 0.9

    def test_copy_is_independent(self):
        pose = KinematicPose(
            joint_angles_rad_dict={"c_thorax-lf_coxa-pitch": 0.5},
            axis_order="ypr",
        )
        clone = pose.copy()
        clone.joint_angles_lookup_rad["c_thorax-lf_coxa-pitch"] = 1.0
        assert pose.joint_angles_lookup_rad["c_thorax-lf_coxa-pitch"] == 0.5

    def test_load_yaml_degrees(self, tmp_path):
        path = tmp_path / "pose.yaml"
        path.write_text(
            "angle_unit: degree\n"
            "axis_order: [yaw, pitch, roll]\n"
            "joint_angles:\n"
            "  c_thorax-lf_coxa-pitch: 90\n"
        )
        pose = KinematicPose(path=path, mirror_left2right=False)
        assert pose.joint_angles_lookup_rad["c_thorax-lf_coxa-pitch"] == pytest.approx(
            math.pi / 2
        )
        assert pose.axis_order is AxisOrder.YPR

    def test_load_json_radians(self, tmp_path):
        path = tmp_path / "pose.json"
        path.write_text(
            json.dumps(
                {
                    "angle_unit": "radian",
                    "axis_order": ["pitch", "roll", "yaw"],
                    "joint_angles": {"c_thorax-lf_coxa-yaw": 0.25},
                }
            )
        )
        pose = KinematicPose(path=path, mirror_left2right=False)
        assert pose.joint_angles_lookup_rad["c_thorax-lf_coxa-yaw"] == 0.25

    def test_rejects_axis_order_with_path(self, tmp_path):
        path = tmp_path / "pose.yaml"
        path.write_text("angle_unit: radian\naxis_order: [y, p, r]\njoint_angles: {}\n")
        with pytest.raises(ValueError):
            KinematicPose(path=path, axis_order="ypr")

    def test_invalid_unit(self, tmp_path):
        path = tmp_path / "pose.yaml"
        path.write_text("angle_unit: turns\naxis_order: [y, p, r]\njoint_angles: {}\n")
        with pytest.raises(ValueError):
            KinematicPose(path=path)

    def test_non_numeric_angle(self, tmp_path):
        path = tmp_path / "pose.yaml"
        path.write_text(
            "angle_unit: radian\naxis_order: [y, p, r]\n"
            "joint_angles: {c_thorax-lf_coxa-pitch: abc}\n"
        )
        with pytest.raises(ValueError):
            KinematicPose(path=path)


class TestKinematicPosePreset:
    @pytest.mark.parametrize("order", list("abcdef"))
    def test_all_axis_orders_load(self, order):
        orders = [
            AxisOrder.PRY,
            AxisOrder.PYR,
            AxisOrder.RPY,
            AxisOrder.RYP,
            AxisOrder.YPR,
            AxisOrder.YRP,
        ]
        axis_order = orders["abcdef".index(order)]
        pose = KinematicPosePreset.NEUTRAL.get_pose_by_axis_order(axis_order)
        assert pose.axis_order is axis_order
        assert len(pose.joint_angles_lookup_rad) > 40
        # Mirrored: right-side angles present
        assert any(
            "-rf_" in name or "-rm_" in name
            for name in pose.joint_angles_lookup_rad
        )

    def test_neutral_angles_are_reasonable(self):
        pose = KinematicPosePreset.NEUTRAL.get_pose_by_axis_order(AxisOrder.YPR)
        for angle in pose.joint_angles_lookup_rad.values():
            assert abs(angle) < math.pi  # < 180 deg
