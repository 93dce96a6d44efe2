"""Tests for the Spotlight motion snippet (demo data pipeline).

Modeled on flygym ``tests/examples/test_motion_snippet.py``: data loading,
shapes, sign convention, resampling duration preservation, smoothing reduces
high-frequency noise.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import MotionSnippet, make_model


@pytest.fixture(scope="module")
def snippet():
    return MotionSnippet()


@pytest.fixture(scope="module")
def dof_order():
    fly, _world, _cam = make_model()
    return fly.get_actuated_jointdofs_order(ActuatorType.POSITION)


class TestLoading:
    def test_shapes(self, snippet):
        n = snippet.joint_angles.shape[0]
        assert snippet.joint_angles.shape == (n, 6, 7)
        assert len(snippet.legs) == 6
        assert len(snippet.dofs_per_leg) == 7
        assert snippet.data_fps > 100

    def test_sign_convention_flip(self):
        raw = MotionSnippet(angles_global2anatomical=False)
        flipped = MotionSnippet(angles_global2anatomical=True)
        right_idx = [i for i, leg in enumerate(raw.legs) if leg.startswith("r")]
        roll_yaw = [
            i
            for i, (_, _, ax) in enumerate(raw.dofs_per_leg)
            if ax in ("roll", "yaw")
        ]
        pitch = [
            i for i, (_, _, ax) in enumerate(raw.dofs_per_leg) if ax == "pitch"
        ]
        for li in right_idx:
            for di in roll_yaw:
                assert np.allclose(
                    flipped.joint_angles[:, li, di],
                    -raw.joint_angles[:, li, di],
                )
            for di in pitch:
                assert np.allclose(
                    flipped.joint_angles[:, li, di],
                    raw.joint_angles[:, li, di],
                )


class TestResampling:
    def test_output_shape_and_duration(self, snippet, dof_order):
        dt = 1e-4
        angles = snippet.get_joint_angles(dt, dof_order)
        assert angles.shape[1] == len(dof_order) == 42
        duration = snippet.joint_angles.shape[0] / snippet.data_fps
        assert angles.shape[0] == pytest.approx(duration / dt, abs=1)

    def test_smoothing_reduces_noise(self, snippet, dof_order):
        dt = 1 / snippet.data_fps  # same grid, isolate the filter
        smoothed = snippet.get_joint_angles(dt, dof_order)
        # High-frequency power (second differences) must shrink.
        raw = snippet.joint_angles[:, 0, 0]
        smooth0 = smoothed[: len(raw), 0]
        hf = lambda x: np.abs(np.diff(x, n=2)).mean()
        assert hf(smooth0) < hf(raw)

    def test_values_in_plausible_range(self, snippet, dof_order):
        angles = snippet.get_joint_angles(1e-4, dof_order)
        assert np.abs(angles).max() < 2 * np.pi
