"""End-to-end behavioral tests: kinematic replay and CPG-driven walking.

The replay test is the tutorial-2 flow of the reference (kinematic replay of
recorded walking on flat ground with position actuators + adhesion) and the
north-star acceptance behavior: the fly must actually locomote.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import MotionSnippet, ReplayTargetData, make_model


@pytest.fixture(scope="module")
def replay_setup():
    fly, world, _cam = make_model(spawn_position=(0, 0, 1.2))
    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    replay = ReplayTargetData(1e-4, dof_order)
    return fly, world, replay


class TestKinematicReplay:
    def test_fly_walks_forward(self, replay_setup):
        """Replay 0.2 s of recorded walking: the fly must stay upright and
        translate, with legs cycling."""
        fly, world, replay = replay_setup
        n_steps = 2000
        sim = BatchSimulation(world, 1)
        sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
        sim.rollout(None, 300)  # settle

        targets = replay.dof_angles[:n_steps][:, None, :]  # (T, 1, 42)
        act_ids = sim._act_ids_by_type[ActuatorType.POSITION][fly.name]
        ctrl_seq = np.full((n_steps, 1, sim.model.nu), np.nan, np.float32)
        ctrl_seq[:, :, act_ids] = targets
        start_x = float(sim.state.qpos[0, 0])
        start_z = float(sim.state.qpos[0, 2])
        traj = sim.rollout(jnp.asarray(ctrl_seq), n_steps)

        qpos = np.asarray(traj)[:, 0]
        assert np.isfinite(qpos).all()
        end_z = qpos[-1, 2]
        # Upright and at standing height throughout.
        assert 0.3 < end_z < 2.5, end_z
        zs = qpos[:, 2]
        assert zs.min() > 0.1
        # Quaternion w stays near 1 (no flipping).
        assert np.abs(qpos[-1, 3]) > 0.8
        # Legs tracked the replay targets (joint angles moved).
        hinge_qadr = 7 + np.arange(10)
        motion = qpos[:, hinge_qadr].std(axis=0).max()
        assert motion > 0.05

    def test_replay_partitions_differ(self, replay_setup):
        _fly, _world, replay = replay_setup
        targets = replay.make_target_angles_all_worlds(4, 200)
        assert targets.shape == (4, 200, 42)
        assert not np.allclose(targets[0], targets[1])


class TestCPGWalking:
    def test_cpg_drives_locomotion(self, replay_setup):
        """CPG controller fused with physics in one scan: stable + rhythmic."""
        from flygym_tpu.control import CPGController, extract_preprogrammed_steps

        fly, world, replay = replay_setup
        steps_data = extract_preprogrammed_steps(
            MotionSnippet(),
            fly.get_actuated_jointdofs_order(ActuatorType.POSITION),
        )
        cpg = CPGController(steps_data, timestep=1e-4)

        sim = BatchSimulation(world, 1)
        sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
        sim.rollout(None, 300)

        act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION][fly.name])
        adh_ids = jnp.asarray(sim._adh_ids[fly.name])
        model = sim.model

        from flygym_tpu.engine.step import step as engine_step
        import dataclasses

        @jax.jit
        def run(state, cpg_state, n=1500):
            def body(carry, _):
                st, cs = carry
                cs, targets, adhesion = cpg(cs)
                ctrl = st.ctrl.at[:, act_ids].set(targets[None])
                ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
                st = jax.vmap(engine_step, in_axes=(None, 0))(
                    model, dataclasses.replace(st, ctrl=ctrl)
                )
                return (st, cs), st.qpos[0, :3]
            (st, cs), traj = jax.lax.scan(body, (state, cpg_state), None, length=n)
            return st, traj

        final, traj = run(sim.state, cpg.init_state(0))
        traj = np.asarray(traj)
        assert np.isfinite(traj).all()
        # Fly stays upright at plausible height for 0.15 s of CPG drive.
        assert 0.2 < traj[-1, 2] < 3.0
        # Oscillatory joint drive produced body motion.
        assert traj[:, :2].std(axis=0).max() > 1e-3
