"""BASELINE config 4 benchmark: visual taxis (vision-modulated walking).

N vmapped flies steer toward a dark object using the 721-ommatidium retina
at 500 Hz, with CPG walking at the physics rate — closed perception-action
loop fused into one scanned XLA program (nested scans: inner = physics,
outer = one render per vision period).

Usage: python scripts/dev/bench_taxis.py [n_worlds=1024] [n_steps=1000]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    vision_every = 20  # 500 Hz

    import flygym_tpu
    from flygym_tpu.anatomy import Skeleton
    from flygym_tpu.compose import (
        ActuatorType,
        Fly,
        FlatGroundWorld,
        KinematicPosePreset,
    )
    from flygym_tpu.control import CPGController, extract_preprogrammed_steps
    from flygym_tpu.control.taxis import object_azimuth_drive
    from flygym_tpu.demo.spotlight import MotionSnippet
    from flygym_tpu.engine.step import step as engine_step
    from flygym_tpu.utils.math import Rotation3D
    from flygym_tpu.vision import Retina

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
    world.add_object("target", (40.0, 15.0, 2.0), radius=3.0)

    sim = flygym_tpu.BatchSimulation(world, n_worlds)
    model = sim.model
    sim.set_leg_adhesion_states("f", np.ones((n_worlds, 6), np.float32))

    retina = Retina.for_fly(world, "f")
    render_batched = retina.make_render_batched(model)
    steps_data = extract_preprogrammed_steps(
        MotionSnippet(), fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    cpg = CPGController(steps_data, timestep=1e-4)

    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION]["f"])
    adh_ids = jnp.asarray(sim._adh_ids["f"])
    mega = sim._megastep
    print(
        f"backend={jax.default_backend()} megastep={'on' if mega else 'off'}",
        file=sys.stderr,
    )
    if mega is None:
        vstep = jax.vmap(engine_step, in_axes=(None, 0))
        batched_step = lambda s: vstep(model, s)
    else:
        batched_step = mega

    n_outer = n_steps // vision_every

    @jax.jit
    def episode(state, cpg_state):
        def inner(carry, _):
            st, cs, drive = carry
            cs, targets, adhesion = cpg(cs, drive=drive)
            ctrl = st.ctrl.at[:, act_ids].set(targets[None])
            ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
            st = batched_step(dataclasses.replace(st, ctrl=ctrl))
            return (st, cs, drive), None

        def outer(carry, _):
            st, cs, drive = carry
            (st, cs, drive), _ = jax.lax.scan(
                inner, (st, cs, drive), None, length=vision_every
            )
            vision = render_batched(st)
            # Batched steering drive from the retina (world-0's drive used
            # for the scalar CPG here; a per-world CPG state would vmap).
            drive = object_azimuth_drive(vision[0], 8.0)
            return (st, cs, drive), st.qpos[:, :2]

        (st, cs, _), xy = jax.lax.scan(
            outer, (state, cpg_state, jnp.ones((6,))), None, length=n_outer
        )
        return st, xy

    cpg_state = cpg.init_state(0)
    st, xy = episode(sim.state, cpg_state)
    np.asarray(st.qpos)

    t0 = time.perf_counter()
    st, xy = episode(st, cpg_state)
    np.asarray(st.qpos)
    wall = time.perf_counter() - t0
    rate = n_worlds * n_steps / wall
    xy = np.asarray(xy)
    print(
        f"visual taxis: {n_worlds} flies x {n_steps} steps "
        f"(vision@500Hz closed loop) in {wall:.2f}s -> "
        f"{rate:,.0f} env-steps/s ({rate * 1e-4:.1f}x realtime aggregate)"
    )
    print(
        "trajectory finite:", bool(np.isfinite(xy).all()),
        "displacement:", float(np.linalg.norm(xy[-1, 0] - xy[0, 0])),
    )


if __name__ == "__main__":
    main()
