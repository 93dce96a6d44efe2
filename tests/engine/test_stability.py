"""Long-horizon stability fuzzing: random control, no NaNs, bounded energy.

The engine runs at fp32 with a mm/mg unit system chosen for conditioning
(reference tutorial 1bis discussion); these tests guard against silent
NaN/blowup regressions that the short golden trajectories would miss.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import Skeleton
from flygym_tpu.compose import ActuatorType, Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.engine.step import rollout
from flygym_tpu.utils.math import Rotation3D

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset="legs_only"),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_actuators(
        fly.skeleton.get_actuated_dofs_from_preset("legs_active_only"),
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()
    c = world.compiled
    act_ids = np.array(
        [
            c.actuator_name2id[a.full_identifier]
            for a in fly.jointdof_to_specactuator_by_type[
                ActuatorType.POSITION
            ].values()
        ]
    )
    return model, state, act_ids


class TestStability:
    def test_random_control_stays_finite(self, scene):
        """5000 steps (0.5 s) of uniform-random position targets: state must
        stay finite and the fly must stay near the ground plane."""
        model, state, act_ids = scene
        rng = np.random.default_rng(7)
        n_steps = 5000
        ctrl = np.full((n_steps, model.nu), np.nan, np.float32)
        # Hold each random target for 50 steps (piecewise-constant chatter).
        targets = rng.uniform(-1.0, 1.0, (n_steps // 50, len(act_ids)))
        ctrl[::50, act_ids] = targets.astype(np.float32)

        final, traj = rollout(model, state, jnp.asarray(ctrl), n_steps)
        qpos = np.asarray(final.qpos)
        qvel = np.asarray(final.qvel)
        assert np.isfinite(qpos).all() and np.isfinite(qvel).all()
        assert np.isfinite(np.asarray(traj)).all()
        # Root must remain in a physically plausible box (mm scale).
        assert abs(qpos[2]) < 50.0, qpos[:3]
        # Quaternion stays unit-norm under the exponential-map integrator.
        np.testing.assert_allclose(np.linalg.norm(qpos[3:7]), 1.0, atol=1e-3)

    def test_long_settle_no_drift(self, scene):
        """10,000 uncontrolled steps (1 s): the settled fly must not creep
        or gain energy (fp32 long-horizon drift guard)."""
        model, state, _ = scene
        final, _ = rollout(
            model, state, jnp.full((10000, model.nu), jnp.nan, jnp.float32), 10000
        )
        qvel = np.asarray(final.qvel)
        assert np.isfinite(qvel).all()
        assert np.abs(qvel).max() < 5.0, np.abs(qvel).max()
        z = float(final.qpos[2])
        assert 0.5 < z < 2.0, z