"""North-star config benchmark: N vmapped flies with vision + olfaction.

BASELINE config 5 ("multimodal navigation"): thousands of flies walking
(CPG-driven) with the 721-ommatidium retina rendered at the vision rate and
odor sampled every step, all inside one scanned XLA program. Reports
aggregate env-steps/s (physics steps × worlds).

Usage: python scripts/dev/bench_multimodal.py [n_worlds=1024] [n_steps=500]
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
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    vision_every = 20  # 500 Hz vision at dt = 1e-4

    import flygym_tpu
    from flygym_tpu.anatomy import Skeleton
    from flygym_tpu.compose import (
        ActuatorType,
        Fly,
        FlatGroundWorld,
        KinematicPosePreset,
    )
    from flygym_tpu.control import CPGController, extract_preprogrammed_steps
    from flygym_tpu.demo.spotlight import MotionSnippet
    from flygym_tpu.engine.step import step as engine_step
    from flygym_tpu.olfaction import OdorField
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
    world.add_object("target", (30.0, 0.0, 2.0), radius=2.0, rgba=(1, 0, 0, 1))

    sim = flygym_tpu.BatchSimulation(world, n_worlds)
    model = sim.model
    sim.set_leg_adhesion_states("f", np.ones((n_worlds, 6), np.float32))

    retina = Retina.for_fly(world, "f")
    odor = OdorField.for_fly(
        world, "f", source_pos=[[30.0, 0.0, 2.0]], peak_intensity=[[1.0]]
    )
    steps_data = extract_preprogrammed_steps(
        MotionSnippet(), fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    cpg = CPGController(steps_data, timestep=1e-4)

    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION]["f"])
    adh_ids = jnp.asarray(sim._adh_ids["f"])
    # Pallas retina kernel on TPU (worlds in lanes), vmapped jnp elsewhere.
    render_batched = retina.make_render_batched(model)
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
    def episode(state, cpg_state, vis0):
        # Static vision schedule: inner scan = physics at 10 kHz, outer
        # scan = one retina render per vision period (500 Hz). A lax.cond
        # inside a flat scan is not a reliable skip on TPU; the nested-scan
        # structure guarantees renders happen exactly n_steps/20 times.
        def inner(carry, _):
            st, cs = carry
            cs, targets, adhesion = cpg(cs)
            ctrl = st.ctrl.at[:, act_ids].set(targets[None])
            ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
            st = batched_step(dataclasses.replace(st, ctrl=ctrl))
            od = jax.vmap(lambda ss: odor.sample(model, ss))(st)
            return (st, cs), od[:, 0, 0]

        def outer(carry, _):
            st, cs = carry
            (st, cs), odors = jax.lax.scan(
                inner, (st, cs), None, length=vision_every
            )
            vis = render_batched(st)
            # Consume the WHOLE render (per-world mean intensity) so XLA
            # cannot dead-code-eliminate the retina work — the honest cost
            # of full 721-ommatidia vision at 500 Hz.
            return (st, cs), (vis.mean(axis=(1, 2, 3)), odors)

        (st, cs), (vis_tr, odors) = jax.lax.scan(
            outer, (state, cpg_state), None, length=n_outer
        )
        vis = render_batched(st)
        return st, cs, vis, odors

    cpg_state = cpg.init_state(0)
    vis0 = jnp.zeros((n_worlds, 2, retina.n_ommatidia, 2), jnp.float32)

    st, cs, vis, odors = episode(sim.state, cpg_state, vis0)
    np.asarray(st.qpos)  # sync (block_until_ready unreliable on axon)

    t0 = time.perf_counter()
    st, cs, vis, odors = episode(st, cs, vis)
    np.asarray(st.qpos)
    wall = time.perf_counter() - t0
    rate = n_worlds * n_steps / wall
    print(
        f"multimodal: {n_worlds} flies x {n_steps} steps "
        f"(vision@500Hz, odor@10kHz, CPG) in {wall:.2f}s -> "
        f"{rate:,.0f} env-steps/s ({rate * 1e-4:.1f}x realtime aggregate)"
    )
    print(
        "vision finite:", bool(np.isfinite(np.asarray(vis)).all()),
        "odor range:", float(np.asarray(odors).min()),
        float(np.asarray(odors).max()),
        "z:", float(st.qpos[0, 2]),
    )


if __name__ == "__main__":
    main()
