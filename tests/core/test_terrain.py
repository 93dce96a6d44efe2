"""Tests for heightfield terrain worlds (blocks / gapped / generic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    BlocksTerrainWorld,
    Fly,
    GappedTerrainWorld,
    HeightfieldTerrainWorld,
    KinematicPosePreset,
)
from flygym_tpu.engine.contact import ground_height_normal
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D


def _make_fly(name):
    fly = Fly(name=name)
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    return fly


class TestHeightfieldSampling:
    @pytest.fixture(scope="class")
    def model(self):
        heights = np.zeros((5, 5), np.float32)
        heights[:, 2:] = 1.0  # step up at x = 2 (cell size 1, xy0 = 0)
        world = HeightfieldTerrainWorld(
            heights=heights, xy0=(0.0, 0.0), cell=(1.0, 1.0)
        )
        world.add_fly(_make_fly("hf"), (2, 2, 5.0), Rotation3D("quat", (1, 0, 0, 0)))
        m, _ = world.compile()
        return m

    def test_height_interpolation(self, model):
        xy = jnp.array([[0.5, 2.0], [3.0, 2.0], [1.5, 2.0]])
        h, n = ground_height_normal(model, xy)
        h = np.asarray(h)
        assert h[0] == pytest.approx(0.0, abs=1e-6)
        assert h[1] == pytest.approx(1.0, abs=1e-6)
        assert 0.0 < h[2] < 1.0  # on the ramp between cells

    def test_normals_tilt_on_slope(self, model):
        xy = jnp.array([[0.5, 2.0], [1.5, 2.0]])
        _h, n = ground_height_normal(model, xy)
        n = np.asarray(n)
        assert n[0, 2] == pytest.approx(1.0, abs=1e-6)  # flat area
        assert n[1, 2] < 0.9  # slope area tilts
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


class TestTerrainWorlds:
    def test_blocks_world_fly_settles(self):
        world = BlocksTerrainWorld(rng_seed=1)
        world.add_fly(
            _make_fly("bw"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0))
        )
        model, state = world.compile()
        assert model.has_hfield
        jstep = jax.jit(step)
        for _ in range(600):
            state = jstep(model, state)
        z = float(state.qpos[2])
        assert np.isfinite(np.asarray(state.qpos)).all()
        assert 0.5 < z < 2.0  # standing on blocks
        found = np.asarray(state.contact_sensordata)[:, 0]
        assert found.sum() >= 3

    def test_gapped_world_geometry(self):
        world = GappedTerrainWorld(gap_width=0.4, block_width=1.0, gap_depth=2.0)
        world.add_fly(
            _make_fly("gw"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0))
        )
        model, _ = world.compile()
        data = np.asarray(model.hfield_data)
        assert data.min() == pytest.approx(-2.0)
        assert data.max() == pytest.approx(0.0)
        # Stripes along x only: rows identical.
        assert np.allclose(data[0], data[-1])

    def test_flat_heightfield_matches_plane(self):
        """A zero heightfield must reproduce flat-ground behavior."""
        from flygym_tpu.compose import FlatGroundWorld

        def settle(world_cls, **kw):
            world = world_cls(**kw)
            world.add_fly(
                _make_fly("cmp"), (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0))
            )
            model, state = world.compile()
            jstep = jax.jit(step)
            for _ in range(400):
                state = jstep(model, state)
            return float(state.qpos[2])

        z_plane = settle(FlatGroundWorld)
        z_hf = settle(
            HeightfieldTerrainWorld,
            heights=np.zeros((4, 4), np.float32),
            xy0=(-100.0, -100.0),
            cell=(50.0, 50.0),
        )
        assert z_hf == pytest.approx(z_plane, abs=5e-3)
