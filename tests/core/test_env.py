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
