"""Single-fly latency benchmark: the north star's "single-fly step+render".

Two measurements, both one world (the accelerator's worst case — see
docs/benchmarks.md "Single-fly / dispatch-bound paths"):

  1. physics-only rollout (the reference's CPU ``mj_step`` loop analog,
     ~2x realtime, BASELINE.md), swept over the K-step fusion factor
     (FLYGYM_TPU_MEGASTEP_K): K physics steps per kernel launch — the
     K-1 intermediate steps skip the HBM round trip, the launch, and the
     output sections.
  2. step+render: CPG-driven walking with the full 721-ommatidium retina
     rendered at 500 Hz (the north star's actual metric). The inner 20
     physics steps fuse into ONE kernel call (the CPG is feed-forward, so
     its control slice is precomputed on device inside the program), then
     the Pallas retina kernel renders both eyes.

Usage: python scripts/dev/bench_single_fly.py [n_steps=4000] [K sweep...]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench_physics_only(n_steps, k_sweep, trim=False):
    import flygym_tpu
    from flygym_tpu.demo import make_model

    label = " [trim_contacts]" if trim else ""
    print(f"== physics-only, 1 world, {n_steps} steps{label} ==", flush=True)
    results = {}
    for K in k_sweep:
        import os

        os.environ["FLYGYM_TPU_MEGASTEP_K"] = str(K)
        _fly, world, _cam = make_model(
            spawn_position=(0, 0, 1.2), trim_contacts=trim
        )
        sim = flygym_tpu.Simulation(world)
        sim.rollout(None, n_steps)  # compile + settle
        sync(sim.state.qpos)
        t0 = time.perf_counter()
        sim.rollout(None, n_steps)
        sync(sim.state.qpos)
        wall = time.perf_counter() - t0
        sps = n_steps / wall
        results[K] = sps
        print(
            f"  K={K:3d}: {wall:6.3f}s -> {sps:9,.0f} steps/s "
            f"({sps * sim.timestep:6.2f}x realtime)",
            flush=True,
        )
    return results


def bench_step_render(n_steps, vision_every=20, trim=False):
    """CPG walking + retina at 500 Hz, one world, fused K=20 kernel."""
    import flygym_tpu
    from flygym_tpu.compose import ActuatorType
    from flygym_tpu.control import CPGController, extract_preprogrammed_steps
    from flygym_tpu.demo import MotionSnippet, make_model
    from flygym_tpu.ops.megastep import make_megastep, megastep_supported
    from flygym_tpu.vision import Retina

    fly, world, _cam = make_model(
        spawn_position=(0, 0, 1.2), trim_contacts=trim
    )
    sim = flygym_tpu.BatchSimulation(world, 1)
    model = sim.model
    sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
    sim.rollout(None, 500)  # settle

    retina = Retina.for_fly(world, fly.name)
    render_batched = retina.make_render_batched(model)
    steps_data = extract_preprogrammed_steps(
        MotionSnippet(), fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    cpg = CPGController(steps_data, timestep=float(model.timestep))
    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION][fly.name])
    adh_ids = jnp.asarray(sim._adh_ids[fly.name])

    use_kernel = sim._megastep is not None and megastep_supported(model)
    if use_kernel:
        kstep = make_megastep(model, k_steps=vision_every)
    else:
        from flygym_tpu.engine.step import step as engine_step

        vstep = jax.vmap(engine_step, in_axes=(None, 0))
    n_outer = n_steps // vision_every

    @jax.jit
    def episode(state, cpg_state):
        def ctrl_tick(cs, _):
            cs, targets, adhesion = cpg(cs, drive=1.0)
            return cs, (targets, adhesion)

        def outer(carry, _):
            st, cs = carry
            # The CPG is feed-forward: its next vision_every control
            # slices are computed here (VPU-cheap) and fused with the
            # physics into one K-step kernel call.
            cs, (tg, ad) = jax.lax.scan(
                ctrl_tick, cs, None, length=vision_every
            )
            ctrl_seq = jnp.broadcast_to(
                st.ctrl[None], (vision_every,) + st.ctrl.shape
            )
            ctrl_seq = ctrl_seq.at[:, :, act_ids].set(tg[:, None])
            ctrl_seq = ctrl_seq.at[:, :, adh_ids].set(
                1.0 + 99.0 * ad[:, None]
            )
            if use_kernel:
                st, _traj = kstep(st, ctrl_seq)
            else:
                def inner(s, c):
                    return vstep(model, dataclasses.replace(s, ctrl=c)), None

                st, _ = jax.lax.scan(inner, st, ctrl_seq)
            vis = render_batched(st)
            # Consume the whole render so XLA cannot DCE the retina work.
            return (st, cs), vis.mean(axis=(1, 2, 3))

        (st, cs), vis_tr = jax.lax.scan(
            outer, (state, cpg_state), None, length=n_outer
        )
        return st, cs, vis_tr

    cs0 = cpg.init_state(0)
    st, cs, vis = episode(sim.state, cs0)
    sync(st.qpos)
    if "--trace" in sys.argv:
        # SURVEY §5 "JAX profiler hooks": capture a device trace of one
        # timed episode and print where step+render time goes (kernel vs
        # retina vs dispatch) — the wall-clock counters cannot see
        # inside the fused scan.
        from flygym_tpu.utils.profiling import trace

        with trace("/tmp/flygym_tpu_trace_sf"):
            st2, cs2, vis2 = episode(st, cs)
            sync(st2.qpos)
    t0 = time.perf_counter()
    st, cs, vis = episode(st, cs)
    sync(st.qpos)
    wall = time.perf_counter() - t0
    sps = n_steps / wall
    print(
        f"== step+render (vision@500Hz, CPG@10kHz), 1 world, "
        f"{n_steps} steps ==\n"
        f"  {wall:6.3f}s -> {sps:9,.0f} steps/s "
        f"({sps * float(model.timestep):6.2f}x realtime) "
        f"[kernel={'megastep K=' + str(vision_every) if use_kernel else 'vmapped jnp'}; "
        f"vision finite={bool(np.isfinite(np.asarray(vis)).all())}, "
        f"z={float(st.qpos[0, 2]):.2f}mm]",
        flush=True,
    )
    return sps


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trim = "--trim" in sys.argv[1:]
    n_steps = int(args[0]) if args else 4000
    k_sweep = [int(x) for x in args[1:]] or [8, 16, 32, 64]
    print("devices:", jax.devices(), flush=True)
    bench_physics_only(n_steps, k_sweep, trim=trim)
    bench_step_render(n_steps, trim=trim)


if __name__ == "__main__":
    main()
