"""Three-fly all-pairs bench: N>2 flies through the batched rollout.

The 3-fly 147-pair compressed config (21 winner groups) rides the
MEGA-KERNEL via the narrow-block streaming rescue (2026-08-20: the
4-sublane stream estimate fits the VMEM gate; measured 1.36M
world-steps/s at 1024 worlds = 2 narrow grid blocks, which also
hardware-validated the double-buffered narrow-window case). Reference
capability being measured: unbounded ``add_fly``, flygym
``compose/world.py:95-149``.

Usage: python scripts/dev/bench_threefly.py [n_worlds=1024] [n_steps=500]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    jax.config.update(
        "jax_compilation_cache_dir", str(Path.home() / ".cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from flygym_tpu.anatomy import (
        ALL_SEGMENT_NAMES,
        AxisOrder,
        BodySegment,
        JointPreset,
        Skeleton,
    )
    from flygym_tpu.batch import BatchSimulation
    from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
    from flygym_tpu.ops import megastep as ms
    from flygym_tpu.utils.math import Rotation3D

    def bare(nm):
        fly = Fly(name=nm)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        return fly

    world = FlatGroundWorld()
    for i, nm in enumerate(("a", "b", "c")):
        world.add_fly(
            bare(nm), (0, 0, 1.2 + 1.8 * i), Rotation3D("quat", (1, 0, 0, 0))
        )
    segs = [BodySegment("c_thorax")] + [
        BodySegment(s) for s in ALL_SEGMENT_NAMES if s.endswith("tarsus5")
    ]
    n = world.add_all_fly_fly_contacts(bodysegs=segs)
    world._spec.options["pair_compress"] = True
    model, _ = world.compile()
    print(
        f"3 flies, {n} pairs, {len(model.pair_groups)} groups: "
        f"fused={ms._est_scoped_mb(model):.1f} "
        f"stream={ms._est_stream_mb(model):.1f} MiB "
        f"supported={ms.megastep_supported(model)} "
        f"sublanes={ms._kernel_sublanes(model)}",
        flush=True,
    )

    sim = BatchSimulation(world, n_worlds)
    print(f"rollout {n_worlds}x{n_steps} (compile first) ...", flush=True)
    t0 = time.time()
    sim.rollout(None, n_steps)
    np.asarray(sim.state.qpos[0])
    print(f"  compile+run in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    sim.rollout(None, n_steps)
    np.asarray(sim.state.qpos[0])
    dtime = time.time() - t0
    rate = n_worlds * n_steps / dtime
    # Sanity: the pile is supported (top fly above the ground plane).
    zc = float(sim.state.qpos[0, model.free_joints[2][1] + 2])
    print(
        f"three-fly all-pairs {n_worlds} worlds: {dtime:.2f}s -> "
        f"{rate:,.0f} world-steps/s ({rate * 1e-4:.0f}x realtime); "
        f"top fly z = {zc:.2f} mm",
        flush=True,
    )


if __name__ == "__main__":
    main()
