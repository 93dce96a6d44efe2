"""Tests for the visual-taxis steering loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.control.taxis import object_azimuth_drive
from flygym_tpu.utils.math import Rotation3D
from flygym_tpu.vision import Retina


class TestSteeringSignal:
    def test_object_left_slows_left_legs(self):
        vision = jnp.full((2, 721, 2), 0.8)
        vision = vision.at[0].mul(0.5)  # left eye darker
        drive = np.asarray(object_azimuth_drive(vision))
        assert np.all(drive[:3] < drive[3:])

    def test_centered_object_drives_straight(self):
        vision = jnp.full((2, 721, 2), 0.6)
        drive = np.asarray(object_azimuth_drive(vision))
        assert np.allclose(drive, 1.0, atol=1e-6)

    def test_drive_clipped(self):
        vision = jnp.zeros((2, 721, 2)).at[1].set(1.0)
        drive = np.asarray(object_azimuth_drive(vision, gain=100.0))
        assert drive.min() >= 0.2 and drive.max() <= 1.8


class TestRetinaSeesObject:
    def test_lateral_object_darkens_one_eye(self):
        fly = Fly(name="taxfly")
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.colorize()
        world = FlatGroundWorld()
        world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
        world.add_object("pillar", (15.0, 10.0, 3.0), radius=4.0)
        model, state = world.compile()
        retina = Retina.for_fly(world, "taxfly")
        vision = np.asarray(retina.render(model, state))
        # Object at +y (fly's left): left eye (index 0) is darker.
        assert vision[0].mean() < vision[1].mean()
        drive = np.asarray(object_azimuth_drive(jnp.asarray(vision)))
        assert drive[:3].mean() < drive[3:].mean()
