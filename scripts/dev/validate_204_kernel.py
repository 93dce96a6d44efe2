"""Hardware validation for the 204-DoF mega-kernel (H0-matvec mode).

The ALL_POSSIBLE preset (nv=210, 3408 mass-matrix tree pairs) overran the
kernel's VMEM budget with the explicit pairs matvec (146.32 MiB measured
2026-08-19). The H0-matvec mode (ops/megastep._use_h0_matvec) frees Mh's
live range after the Hessian fill; this script is the moment of truth on
real hardware:

1. compile + run the kernel at B=128 (first 204-DoF Mosaic compile:
   expect ~15-40 min over the axon tunnel, persistently cached after);
2. cross-check one kernel step against the vmapped jnp engine step from a
   settled state;
3. optionally (--bench) time a 1000-step rollout at 4096 worlds for the
   per-model table in docs/benchmarks.md.

Usage: python scripts/dev/validate_204_kernel.py [--bench] [vmem_mb]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    bench = "--bench" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--bench"]
    if args:
        import os

        os.environ["FLYGYM_TPU_MEGASTEP_VMEM_MB"] = args[0]

    jax.config.update(
        "jax_compilation_cache_dir", str(Path.home() / ".cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from flygym_tpu.anatomy import JointPreset, Skeleton
    from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
    from flygym_tpu.engine.step import step
    from flygym_tpu.ops import megastep as ms
    from flygym_tpu.utils.math import Rotation3D

    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset=JointPreset.ALL_POSSIBLE),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    model, state0 = world.compile()

    print(
        f"nv={model.nv} ncand={model.ncand} "
        f"h0_matvec={ms._use_h0_matvec(model)} "
        f"est={ms._est_scoped_mb(model):.1f} MiB "
        f"(plain {ms._est_scoped_mb(model, h0_matvec=False):.1f}) "
        f"supported={ms.megastep_supported(model)}",
        flush=True,
    )

    B = 128
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    print("settling 300 jnp steps at B=128 ...", flush=True)
    f_ref = jax.jit(jax.vmap(lambda s: step(model, s)))
    t0 = time.time()
    for _ in range(300):
        bstate = f_ref(bstate)
    np.asarray(bstate.qpos)  # sync
    print(f"  settle done in {time.time() - t0:.1f}s", flush=True)

    print("compiling the 204-DoF mega-kernel (be patient) ...", flush=True)
    mega = ms.make_megastep(model)
    t0 = time.time()
    got = mega(bstate)
    got_q = np.asarray(got.qpos)  # sync = wait for compile + run
    print(f"  kernel compile+run in {time.time() - t0:.1f}s", flush=True)

    ref = f_ref(bstate)
    for k, atol in (("qpos", 3e-4), ("qvel", 0.5), ("xpos", 5e-4)):
        a, b = np.asarray(getattr(got, k)), np.asarray(getattr(ref, k))
        d = np.abs(a - b).max()
        print(f"  |d{k}| = {d:.3e} (atol {atol})", flush=True)
        assert d <= atol, (k, d)
    print("KERNEL==JNP OK", flush=True)

    if bench:
        from flygym_tpu.batch import BatchSimulation

        n_worlds, n_steps = 4096, 1000
        sim = BatchSimulation(world, n_worlds)
        sim.set_leg_adhesion_states("f", np.ones(6))
        print(f"bench rollout {n_worlds}x{n_steps} (compile first) ...",
              flush=True)
        sim.rollout(None, n_steps)
        np.asarray(sim.state.qpos[0])
        t0 = time.time()
        sim.rollout(None, n_steps)
        np.asarray(sim.state.qpos[0])
        dtime = time.time() - t0
        rate = n_worlds * n_steps / dtime
        print(
            f"ALL_POSSIBLE {n_worlds} worlds: {dtime:.2f}s -> "
            f"{rate:,.0f} world-steps/s ({rate * 1e-4:.0f}x realtime)",
            flush=True,
        )


if __name__ == "__main__":
    main()
