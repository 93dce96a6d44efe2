"""Tutorial 9 — Multimodal navigation with many vmapped flies.

Vision (ommatidia retina) + olfaction (odor plume) observations for a batch
of flies stepping together — the north-star RL-training configuration
(config 5: "multimodal navigation with 4096 vmapped flies"). Scale n_envs to
the chip; the structure is identical.

Run:  python examples/09_multimodal_navigation.py [n_envs]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.env import VectorFlyEnv
from flygym_tpu.env.gym import _build_default_world
from flygym_tpu.olfaction import OdorField


def main(n_envs: int = 16):
    fly, world = _build_default_world()
    world.add_object("attractor", (30.0, 0.0, 3.0), radius=3.0)
    world.compile()
    odor = OdorField.for_fly(
        world,
        fly.name,
        source_pos=[[30.0, 0.0, 1.0]],
        peak_intensity=[[1.0]],
    )
    env = VectorFlyEnv(
        world, fly.name, enable_vision=True, odor_field=odor,
        decision_interval=10,
    )

    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    states = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))

    actions = {
        "joints": jnp.zeros((n_envs, env.n_actuated)),
        "adhesion": jnp.ones((n_envs, 6)),
    }
    for i in range(3):
        states, obs, rewards, dones, _ = step(states, actions)
    print(f"{n_envs} envs; observation shapes:")
    for key, value in obs.items():
        print(f"  {key}: {tuple(value.shape)}")
    print(f"mean odor at antennae: {float(obs['odor_intensity'][:, 0, :2].mean()):.5f}")
    print(f"vision mean intensity: {float(obs['vision'].mean()):.3f}")
    print(f"rewards: {np.round(np.asarray(rewards[:8]), 5).tolist()}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
