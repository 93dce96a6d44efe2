"""Tutorial 4 — CPG-driven tripod-gait walking with leg adhesion.

Six coupled oscillators (tripod phase biases) index preprogrammed step
trajectories extracted from the recorded walking clip; adhesion follows the
stance/swing labels. Controller and physics fuse into one scanned program.

Run:  python examples/04_cpg_walking.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import ActuatorType
from flygym_tpu.control import CPGController, extract_preprogrammed_steps
from flygym_tpu.demo import MotionSnippet, make_model
from flygym_tpu.engine.step import step as engine_step


def main(n_steps: int = 4000):
    fly, world, _cam = make_model(spawn_position=(0, 0, 1.2))
    sim = BatchSimulation(world, 1)
    sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
    sim.rollout(None, 500)

    steps_data = extract_preprogrammed_steps(
        MotionSnippet(),
        fly.get_actuated_jointdofs_order(ActuatorType.POSITION),
    )
    print(f"stride frequency from data: {steps_data['freq_hz']:.1f} Hz")
    cpg = CPGController(steps_data, timestep=sim.timestep)

    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION][fly.name])
    adh_ids = jnp.asarray(sim._adh_ids[fly.name])
    model = sim.model

    @jax.jit
    def episode(state, cpg_state):
        def body(carry, _):
            st, cs = carry
            cs, targets, adhesion = cpg(cs, drive=1.0)
            ctrl = st.ctrl.at[:, act_ids].set(targets[None])
            ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
            st = jax.vmap(engine_step, in_axes=(None, 0))(
                model, dataclasses.replace(st, ctrl=ctrl)
            )
            return (st, cs), st.qpos[0, :3]

        (st, cs), traj = jax.lax.scan(
            body, (state, cpg_state), None, length=n_steps
        )
        return st, traj

    final, traj = episode(sim.state, cpg.init_state(0))
    traj = np.asarray(traj)
    print(f"root travelled {np.linalg.norm(traj[-1, :2] - traj[0, :2]):.2f} mm "
          f"in {n_steps * sim.timestep:.2f} s; final height {traj[-1, 2]:.2f} mm")


if __name__ == "__main__":
    main()
