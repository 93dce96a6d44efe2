"""Tests for vision (ommatidia retina) and olfaction (odor fields)."""

import numpy as np
import pytest

import jax

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.olfaction import OdorField
from flygym_tpu.utils.math import Rotation3D
from flygym_tpu.vision import NUM_OMMATIDIA_PER_EYE, Retina, hex_lattice_directions

FLY = "sensefly"


@pytest.fixture(scope="module")
def world():
    fly = Fly(name=FLY)
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.colorize()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    world.compile()
    return world


class TestHexLattice:
    def test_count(self):
        dirs = hex_lattice_directions(15)
        assert dirs.shape == (NUM_OMMATIDIA_PER_EYE, 3)

    def test_unit_norm(self):
        dirs = hex_lattice_directions(15)
        assert np.allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-9)

    def test_center_looks_forward(self):
        dirs = hex_lattice_directions(15)
        assert np.allclose(dirs[0], [1, 0, 0])

    def test_wide_field(self):
        dirs = hex_lattice_directions(15, cap_half_angle_deg=135.0)
        # Outer ring looks backwards-ish (beyond 90 degrees).
        assert dirs[-1] @ np.array([1, 0, 0]) < 0


class TestRetina:
    def test_build_and_render(self, world):
        retina = Retina.for_fly(world, FLY)
        model = world.compiled.model
        from flygym_tpu.engine.model import make_initial_state

        state = make_initial_state(model)
        out = np.asarray(jax.jit(retina.render, static_argnums=())(model, state))
        assert out.shape == (2, NUM_OMMATIDIA_PER_EYE, 2)
        assert np.all(out >= 0) and np.all(out <= 1)
        # Some ommatidia see the bright sky, some see the darker ground.
        assert out.max() > 0.3
        assert out.std() > 0.01

    def test_channel_mosaic_is_exclusive(self, world):
        retina = Retina.for_fly(world, FLY)
        w = retina.channel_weights
        pale_rows = w[:, 0].sum(axis=1) > 0
        yellow_rows = w[:, 1].sum(axis=1) > 0
        assert np.all(pale_rows ^ yellow_rows)
        # Roughly 30% pale.
        assert 0.15 < pale_rows.mean() < 0.45

    def test_eyes_see_different_scenes(self, world):
        """An object placed to the fly's left is seen more by the left eye."""
        model = world.compiled.model
        from flygym_tpu.engine.model import make_initial_state

        state = make_initial_state(model)
        retina = Retina.for_fly(world, FLY)
        out = np.asarray(retina.render(model, state))
        # Symmetric scene: both eyes should give similar overall intensity.
        assert abs(out[0].mean() - out[1].mean()) < 0.1


class TestOdorField:
    def test_sample_shapes(self, world):
        field = OdorField.for_fly(
            world, FLY, source_pos=[[10.0, 0, 1]], peak_intensity=[[1.0, 0.5]]
        )
        model = world.compiled.model
        from flygym_tpu.engine.model import make_initial_state

        state = make_initial_state(model)
        out = np.asarray(field.sample(model, state))
        assert out.shape == (2, 4)
        assert np.all(out > 0)

    def test_closer_sensor_smells_more(self, world):
        field = OdorField.for_fly(
            world, FLY, source_pos=[[0.0, 50.0, 1.0]], peak_intensity=[[1.0]]
        )
        model = world.compiled.model
        from flygym_tpu.engine.model import make_initial_state

        state = make_initial_state(model)
        out = np.asarray(field.sample(model, state))
        # Source on the left (+y): left antenna (idx 0) > right antenna (1).
        assert out[0, 0] > out[0, 1]

    def test_gaussian_diffusion(self, world):
        field = OdorField.for_fly(
            world,
            FLY,
            source_pos=[[5.0, 0, 1]],
            peak_intensity=[[2.0]],
            diffusion="gaussian",
            gaussian_scale=5.0,
        )
        model = world.compiled.model
        from flygym_tpu.engine.model import make_initial_state

        state = make_initial_state(model)
        out = np.asarray(field.sample(model, state))
        assert np.all(out <= 2.0)

    def test_intensity_shape_mismatch_raises(self, world):
        with pytest.raises(ValueError):
            OdorField.for_fly(
                world,
                FLY,
                source_pos=[[1, 0, 0], [2, 0, 0]],
                peak_intensity=[[1.0]],
            )
