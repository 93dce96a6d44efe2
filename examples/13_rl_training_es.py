"""Tutorial 13 — RL proof-of-life: evolution-strategies training on the
vectorized fly environment.

Optimizes a sinusoidal gait-generator policy (per-DoF amplitude + phase and
a shared frequency around a biological baseline) for forward walking reward
with antithetic OpenAI-ES, using ``VectorFlyEnv.make_batched_step`` — the
same batched TPU path the benchmark rides (mega-step kernel on hardware,
vmapped jnp on CPU). Every update evaluates the whole perturbation
population as ONE scanned XLA program: n_envs episodes of
``episode_len × decision_interval`` physics steps with zero host involvement.

This exercises BASELINE.json config 5 ("for RL training"): the environment
is not just wired for RL, it trains.

Run:  python examples/13_rl_training_es.py [--small]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from flygym_tpu.compose import ActuatorType
from flygym_tpu.env.gym import VectorFlyEnv


def make_policy(env):
    """Sinusoidal gait generator: joints = neutral + amp * sin(2π f t + φ).

    Adhesion follows each leg's phase (on during the stance half-cycle) —
    the reference's stance/swing adhesion switching pattern.
    """
    neutral = jnp.asarray(env._state0.ctrl[np.asarray(env._act_ids)])
    n_act = env.n_actuated
    order = env.fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    legs = list(env.fly.get_legs_order())
    leg_of_dof = jnp.asarray(
        [legs.index(d.child.name[:2]) for d in order], jnp.int32
    )

    def init_theta(key):
        k1, k2 = jax.random.split(key)
        return dict(
            amp=0.05 * jax.random.normal(k1, (n_act,)),
            phase=0.3 * jax.random.normal(k2, (n_act,)),
            leg_phase=jnp.asarray([0.0, jnp.pi, 0.0, jnp.pi, 0.0, jnp.pi]),
            log_freq=jnp.zeros(()),
        )

    def policy(theta, t):
        freq = 10.0 * jnp.exp(jnp.clip(theta["log_freq"], -1.5, 1.5))
        base = 2.0 * jnp.pi * freq * t
        leg_ph = theta["leg_phase"][leg_of_dof]
        joints = neutral + jnp.clip(theta["amp"], -0.8, 0.8) * jnp.sin(
            base + theta["phase"] + leg_ph
        )
        # Stance (adhesion on) during the half-cycle when the leg pushes.
        adhesion = (
            jnp.sin(base + theta["leg_phase"]) < 0.0
        ).astype(jnp.float32)
        return dict(joints=joints, adhesion=adhesion)

    return init_theta, policy


def train(
    n_envs: int = 1024,
    n_updates: int = 50,
    episode_len: int = 100,
    sigma: float = 0.05,
    lr: float = 0.25,
    seed: int = 0,
):
    env = VectorFlyEnv()
    bstep = env.make_batched_step()
    init_theta, policy = make_policy(env)
    dt_env = env.decision_interval * float(env.model.timestep)

    key = jax.random.PRNGKey(seed)
    theta = init_theta(key)
    flat, unravel = ravel_pytree(theta)
    n_param = flat.shape[0]
    half = n_envs // 2

    @jax.jit
    def population_returns(flat_theta, eps, key):
        """Antithetic population: (half, n_param) perturbations → (n_envs,)
        mean per-step reward, all episodes in one scanned program."""
        pop = jnp.concatenate(
            [flat_theta[None] + sigma * eps, flat_theta[None] - sigma * eps]
        )  # (n_envs, n_param)
        thetas = jax.vmap(unravel)(pop)
        states = env.reset_batched(key, n_envs)

        def body(carry, i):
            states = carry
            t = i.astype(jnp.float32) * dt_env
            action = jax.vmap(lambda th: policy(th, t))(thetas)
            states, _obs, r, done, _ = bstep(states, action)
            # Fallen/flipped envs stop collecting reward (stay fallen).
            return states, jnp.where(done, 0.0, r)

        _states, rs = jax.lax.scan(
            body, states, jnp.arange(episode_len)
        )
        return rs.mean(axis=0)  # (n_envs,)

    curve = []
    for u in range(n_updates):
        key, k_eps, k_env = jax.random.split(key, 3)
        eps = jax.random.normal(k_eps, (half, n_param))
        returns = population_returns(flat, eps, k_env)
        r_pos, r_neg = returns[:half], returns[half:]
        # Rank-normalized antithetic ES gradient.
        adv = r_pos - r_neg
        ranks = jnp.argsort(jnp.argsort(adv)).astype(jnp.float32)
        w = ranks / jnp.maximum(half - 1, 1) - 0.5
        grad = (w[:, None] * eps).mean(axis=0) / sigma
        flat = flat + lr * grad
        mean_r = float(returns.mean())
        curve.append(mean_r)
        print(
            f"update {u:3d}: population mean reward {mean_r:+.5f} "
            f"(best {float(returns.max()):+.5f})",
            flush=True,
        )
    return np.asarray(curve), unravel(flat)


def main(
    n_envs: int = 1024,
    n_updates: int = 50,
    episode_len: int = 100,
):
    curve, _theta = train(
        n_envs=n_envs, n_updates=n_updates, episode_len=episode_len
    )
    first = curve[: max(len(curve) // 5, 1)].mean()
    last = curve[-max(len(curve) // 5, 1):].mean()
    print(f"\nmean reward: first fifth {first:+.5f} -> last fifth {last:+.5f}")
    out = Path("/tmp/es_learning_curve.csv")
    np.savetxt(out, curve, header="population_mean_reward_per_update")
    print(f"learning curve written to {out}")
    return curve


if __name__ == "__main__":
    if "--small" in sys.argv:
        main(n_envs=64, n_updates=10, episode_len=25)
    else:
        main()
