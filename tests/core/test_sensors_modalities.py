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


class TestAcceptanceAngleOptics:
    """Acceptance-cone pooling on the hex lattice (VERDICT r3 #7): point
    sampling aliases — a thin edge can toggle an entire ommatidium per
    step; the same-type Gaussian pooling must smooth that flicker without
    changing uniform-scene responses or the pale/yellow channel mosaic."""

    def _thin_bar_scene(self):
        import jax.numpy as jnp

        from flygym_tpu.compose.spec import (
            BodySpec,
            GeomSpec,
            JointSpec,
            ModelSpec,
        )
        from flygym_tpu.engine.kinematics import forward_kinematics
        from flygym_tpu.engine.model import make_initial_state

        spec = ModelSpec("bar_scene")
        spec.world_geoms.append(
            GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
        )
        head = BodySpec(name="head", parent=None)
        head.add_joint(JointSpec(name="headfree", type="free"))
        head.add_geom(
            GeomSpec(name="headgeom", type="sphere", size=(0.3,), mass=1e-3)
        )
        spec.add_body(head)
        bar = BodySpec(name="bar", parent=None)
        # Thin vertical bar: radius well under the ~9 deg lattice spacing
        # at 20 mm distance (subtends ~1.7 deg).
        bar.add_geom(
            GeomSpec(
                name="bargeom", type="capsule", size=(0.3, 8.0),
                pos=(20.0, 0.0, 4.0), mass=1e-3, rgba=(0.0, 0.0, 0.0, 1.0),
            )
        )
        spec.add_body(bar)
        spec.neutral_joint_qpos["headfree"] = [0, 0, 2.0, 1, 0, 0, 0]
        compiled = spec.compile()
        model = compiled.model
        state = make_initial_state(model)
        hid = compiled.body_name2id["head"]
        return model, state, hid, forward_kinematics

    def _sweep(self, retina, model, state, fk, hid, n=40):
        """Yaw the head in 0.25-deg increments; return (n, n_omm) channel-sum
        responses."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        out = []
        for i in range(n):
            yaw = np.deg2rad(0.25 * i)
            qpos = np.asarray(state.qpos).copy()
            qpos[3], qpos[6] = np.cos(yaw / 2), np.sin(yaw / 2)
            s = dataclasses.replace(state, qpos=jnp.asarray(qpos))
            xp, xq = fk(model, s.qpos)
            s = dataclasses.replace(s, xpos=xp, xquat=xq)
            out.append(np.asarray(retina.render(model, s)).sum(-1)[0])
        return np.array(out)

    def test_blur_matrix_invariants(self):
        from flygym_tpu.vision import Retina

        model, state, hid, fk = self._thin_bar_scene()
        r = Retina.build(model, left_eye_body=hid, right_eye_body=hid)
        W = r.blur_weights
        assert W is not None and W.shape == (2, r.n_ommatidia, r.n_ommatidia)
        pale_rows = r.channel_weights[:, 0].sum(-1) > 0
        # Rows of the row's own type sum to 1 (uniform scenes unchanged);
        # other-type rows are fully masked (mosaic sparsity preserved).
        np.testing.assert_allclose(W[0][pale_rows].sum(1), 1.0, atol=1e-5)
        np.testing.assert_allclose(W[1][~pale_rows].sum(1), 1.0, atol=1e-5)
        assert np.abs(W[0][~pale_rows]).max() == 0.0
        assert np.abs(W[1][pale_rows]).max() == 0.0
        # Pooling restricted to same-type columns.
        assert np.abs(W[0][:, ~pale_rows]).max() == 0.0
        assert np.abs(W[1][:, pale_rows]).max() == 0.0

    def test_uniform_scene_unchanged_and_mosaic_sparse(self):
        import dataclasses

        import jax.numpy as jnp

        from flygym_tpu.vision import Retina

        model, state, hid, fk = self._thin_bar_scene()
        sharp = Retina.build(
            model, left_eye_body=hid, right_eye_body=hid,
            acceptance_fwhm_deg=0,
        )
        blurred = Retina.build(model, left_eye_body=hid, right_eye_body=hid)
        xp, xq = fk(model, state.qpos)
        state = dataclasses.replace(state, xpos=xp, xquat=xq)
        out_s = np.asarray(sharp.render(model, state))
        out_b = np.asarray(blurred.render(model, state))
        # Mosaic sparsity: each ommatidium responds in exactly its own
        # channel, before AND after pooling.
        pale = blurred.channel_weights[:, 0].sum(-1) > 0
        assert np.abs(out_b[:, pale, 1]).max() == 0.0
        assert np.abs(out_b[:, ~pale, 0]).max() == 0.0
        # Away from the bar/horizon the scene is locally uniform: pooled
        # responses stay close to the sharp ones globally (bounded change).
        assert np.abs(out_b - out_s).max() < 0.5
        assert abs(out_b.mean() - out_s.mean()) < 0.02

    def test_thin_bar_flicker_suppressed(self):
        """Sweep the gaze past a thin bar: the max per-step jump in any
        single ommatidium's response must shrink with pooling, and the
        peak bar response must move smoothly (no full-amplitude toggle)."""
        from flygym_tpu.vision import Retina

        model, state, hid, fk = self._thin_bar_scene()
        sharp = Retina.build(
            model, left_eye_body=hid, right_eye_body=hid,
            acceptance_fwhm_deg=0,
        )
        blurred = Retina.build(model, left_eye_body=hid, right_eye_body=hid)
        resp_s = self._sweep(sharp, model, state, fk, hid)
        resp_b = self._sweep(blurred, model, state, fk, hid)
        jump_s = np.abs(np.diff(resp_s, axis=0)).max()
        jump_b = np.abs(np.diff(resp_b, axis=0)).max()
        # Point sampling toggles a whole ommatidium (dark bar vs sky);
        # pooling spreads the transition across neighbors and steps.
        assert jump_s > 0.15, jump_s  # the aliasing actually happens
        assert jump_b < 0.6 * jump_s, (jump_b, jump_s)
        # The bar is seen in both (a strongly darkened ommatidium exists).
        assert resp_b.min() < resp_b.max() - 0.1
