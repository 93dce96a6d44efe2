"""Tests for the gym-style RL environments."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.env import FlyEnv, VectorFlyEnv


@pytest.fixture(scope="module")
def venv():
    return VectorFlyEnv()


class TestVectorFlyEnv:
    def test_reset_and_step(self, venv):
        state = venv.reset(jax.random.PRNGKey(0))
        action = {
            "joints": jnp.zeros(venv.n_actuated),
            "adhesion": jnp.ones(6),
        }
        state, obs, reward, done, info = jax.jit(venv.step)(state, action)
        assert obs["joints"].shape == (3, venv.n_actuated)
        assert obs["fly"].shape == (4, 3)
        assert obs["contact_forces"].shape == (6, 3)
        assert obs["end_effectors"].shape == (6, 3)
        assert np.isfinite(float(reward))
        assert not bool(done)

    def test_decision_interval_advances_time(self, venv):
        state = venv.reset(jax.random.PRNGKey(0))
        t0 = float(state.time)
        action = {"joints": jnp.zeros(venv.n_actuated), "adhesion": jnp.ones(6)}
        state, *_ = venv.step(state, action)
        assert float(state.time) == pytest.approx(
            t0 + venv.decision_interval * venv.model.timestep, abs=1e-6
        )

    def test_vmapped_worlds(self, venv):
        n = 3
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        states = jax.vmap(venv.reset)(keys)
        actions = {
            "joints": jnp.zeros((n, venv.n_actuated)),
            "adhesion": jnp.ones((n, 6)),
        }
        states, obs, rewards, dones, _ = jax.jit(jax.vmap(venv.step))(
            states, actions
        )
        assert obs["fly"].shape == (n, 4, 3)
        assert rewards.shape == (n,)
        # Different reset keys → different states.
        q = np.asarray(states.qpos)
        assert not np.allclose(q[0], q[1])

    def test_batched_step_matches_vmap(self, venv):
        """make_batched_step (the TPU RL path: mega-step physics + batched
        retina) must be semantically identical to vmap(step). On the CPU
        backend both run the vmapped jnp code, so agreement is exact."""
        n = 3
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        states = jax.vmap(venv.reset)(keys)
        actions = {
            "joints": jnp.zeros((n, venv.n_actuated)),
            "adhesion": jnp.ones((n, 6)),
        }
        s_v, obs_v, r_v, d_v, _ = jax.jit(jax.vmap(venv.step))(states, actions)
        step_b = venv.make_batched_step()
        s_b, obs_b, r_b, d_b, _ = step_b(states, actions)
        np.testing.assert_allclose(
            np.asarray(s_b.qpos), np.asarray(s_v.qpos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r_b), np.asarray(r_v), atol=1e-6
        )
        assert set(obs_b) == set(obs_v)
        for k in obs_v:
            np.testing.assert_allclose(
                np.asarray(obs_b[k]), np.asarray(obs_v[k]), atol=1e-5, err_msg=k
            )

    def test_auto_reset_replaces_done_envs(self, venv):
        """auto_reset: finished envs come back as fresh reset states
        (gymnax/brax vectorized-training semantics)."""
        import dataclasses

        n = 3
        states = venv.reset_batched(jax.random.PRNGKey(0), n)
        # Force env 1 upside down (root quat = 180° about x) so the next
        # step reports done (flipped) and auto-resets it.
        _b, qadr, _v = venv.model.free_joints[0]
        qpos = states.qpos.at[1, qadr + 3 : qadr + 7].set(
            jnp.array([0.0, 1.0, 0.0, 0.0])
        )
        qpos = qpos.at[1, qadr + 2].set(3.0)  # drop from above the ground
        states = dataclasses.replace(states, qpos=qpos)
        action = {
            "joints": jnp.zeros((n, venv.n_actuated)),
            "adhesion": jnp.ones((n, 6)),
        }
        step = venv.make_batched_step(auto_reset=True)
        out_states, obs, reward, done, _ = step(
            states, action, jax.random.PRNGKey(42)
        )
        done = np.asarray(done)
        assert done[1] and not done[0] and not done[2]
        # Env 1 was replaced by a fresh reset state (upright quaternion,
        # time 0); the others kept stepping from where they were.
        qw = np.asarray(out_states.qpos[:, qadr + 3])
        assert abs(qw[1] - 1.0) < 0.05
        assert float(np.asarray(out_states.time[1])) == 0.0
        assert float(np.asarray(out_states.time[0])) > 0.0
        # Observation reflects the post-reset state for env 1.
        assert np.isfinite(np.asarray(obs["fly"])).all()

    def test_batched_step_vision(self):
        """Batched step with vision produces (B, 2, 721, 2) observations."""
        env = VectorFlyEnv(enable_vision=True, decision_interval=2)
        keys = jax.random.split(jax.random.PRNGKey(2), 2)
        states = jax.vmap(env.reset)(keys)
        actions = {
            "joints": jnp.zeros((2, env.n_actuated)),
            "adhesion": jnp.ones((2, 6)),
        }
        step_b = env.make_batched_step()
        _, obs, *_ = step_b(states, actions)
        assert obs["vision"].shape == (2, 2, 721, 2)
        assert np.isfinite(np.asarray(obs["vision"])).all()


class TestVisionEnv:
    def test_vision_observation(self):
        env = VectorFlyEnv(enable_vision=True, decision_interval=2)
        state = env.reset(jax.random.PRNGKey(0))
        obs = env.observe(state)
        assert obs["vision"].shape == (2, 721, 2)
        assert float(obs["vision"].max()) <= 1.0


class TestFlyEnv:
    def test_gymnasium_api(self):
        env = FlyEnv()
        obs, info = env.reset(seed=0)
        assert env.observation_space.contains(
            {k: np.asarray(v, np.float32) for k, v in obs.items()}
        )
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        assert isinstance(reward, float)
        assert isinstance(terminated, bool)

    def test_render_returns_frame(self):
        env = FlyEnv()
        env.reset(seed=0)
        frame = env.render()
        assert frame.shape == (240, 320, 3)
        assert frame.dtype == np.uint8
