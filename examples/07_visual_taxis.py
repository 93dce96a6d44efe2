"""Tutorial 7 — Visual taxis: retina-driven object following.

A dark pillar stands ahead-left of the fly; the ommatidia retina renders the
scene each control step, the brightness asymmetry between the eyes modulates
the CPG drive, and the fly turns toward the object while walking — the whole
perception-action loop fused into one scanned XLA program (north-star
config 4).

Run:  python examples/07_visual_taxis.py
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
from flygym_tpu.control import (
    CPGController,
    VisualTaxisController,
    extract_preprogrammed_steps,
)
from flygym_tpu.demo import MotionSnippet, make_model
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.vision import Retina


def main(n_control_steps: int = 150, physics_per_control: int = 20):
    fly, world, _cam = make_model(spawn_position=(0, 0, 1.2))
    # A dark pillar 25 mm ahead, 12 mm to the left.
    world.add_object("pillar", (25.0, 12.0, 3.0), radius=3.0)

    sim = BatchSimulation(world, 1)
    sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
    sim.rollout(None, 500)

    steps_data = extract_preprogrammed_steps(
        MotionSnippet(), fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    cpg = CPGController(steps_data, timestep=sim.timestep * 1)
    retina = Retina.for_fly(world, fly.name)
    taxis = VisualTaxisController(cpg=cpg, retina=retina, gain=8.0)

    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION][fly.name])
    adh_ids = jnp.asarray(sim._adh_ids[fly.name])
    model = sim.model

    @jax.jit
    def episode(state, cpg_state):
        def control_step(carry, _):
            st, cs = carry
            single = jax.tree.map(lambda x: x[0], st)
            cs, targets, adhesion, vision = taxis(cs, model, single)
            ctrl = st.ctrl.at[:, act_ids].set(targets[None])
            ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
            st = dataclasses.replace(st, ctrl=ctrl)

            def phys(c, _):
                return jax.vmap(engine_step, in_axes=(None, 0))(model, c), None

            st, _ = jax.lax.scan(phys, st, None, length=physics_per_control)
            return (st, cs), st.qpos[0, :2]

        (st, cs), traj = jax.lax.scan(
            control_step, (state, cpg_state), None, length=n_control_steps
        )
        return st, traj

    final, traj = episode(sim.state, taxis.init_state(0))
    traj = np.asarray(traj)
    heading_to_obj0 = np.arctan2(12.0, 25.0)
    final_heading = np.arctan2(traj[-1, 1] - traj[0, 1], traj[-1, 0] - traj[0, 0])
    print(f"object bearing at start: {np.degrees(heading_to_obj0):.1f} deg")
    print(f"fly travel bearing:      {np.degrees(final_heading):.1f} deg")
    print(f"path: {np.round(traj[::30], 2).tolist()}")


if __name__ == "__main__":
    main()
