"""Tutorial 6 — RL environments: gymnasium API and massive-vmap training.

`FlyEnv` is a standard gymnasium.Env; `VectorFlyEnv` is the functional core
whose pure reset/step vmap to thousands of flies per chip (the north-star
"4096 vmapped flies for RL training" configuration).

Run:  python examples/06_rl_environment.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.env import FlyEnv, VectorFlyEnv


def main(n_envs: int = 64):
    # --- single-env gymnasium API ---
    env = FlyEnv()
    obs, _info = env.reset(seed=0)
    print("observation keys:", sorted(obs))
    action = env.action_space.sample()
    obs, reward, terminated, truncated, _ = env.step(action)
    print(f"one env step: reward={reward:.4f} terminated={terminated}")

    # --- vmapped functional core: many flies, one XLA program ---
    core = VectorFlyEnv()  # scale n_envs to 4096 on a real chip
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    states = jax.jit(jax.vmap(core.reset))(keys)

    step = jax.jit(jax.vmap(core.step))
    actions = {
        "joints": jnp.zeros((n_envs, core.n_actuated)),
        "adhesion": jnp.ones((n_envs, 6)),
    }
    states, obs, rewards, dones, _ = step(states, actions)
    print(
        f"{n_envs} envs stepped together: rewards shape {rewards.shape}, "
        f"mean reward {float(rewards.mean()):.4f}, any done {bool(dones.any())}"
    )


if __name__ == "__main__":
    main()
