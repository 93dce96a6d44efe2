"""Refresh the per-model throughput table in docs/benchmarks.md.

Measures BatchSimulation.rollout (WITH full trajectory recording, passive
flies) for each joint preset plus the two-fly interaction model — the
protocol behind the "Throughput by model size" table. Each model compiles
its own episode program (~2-3 min over the axon tunnel, cached); following
the ROADMAP measurement rule, the timed call is preceded by an untimed
call with the IDENTICAL (n_worlds, n_steps) shape and synced with a host
fetch (axon's block_until_ready is a no-op).

Usage: python scripts/dev/bench_models.py [n_worlds=4096] [n_steps=1000] [models...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax


def make_preset_world(preset):
    from flygym_tpu.anatomy import JointPreset, Skeleton
    from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
    from flygym_tpu.utils.math import Rotation3D

    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset=JointPreset[preset]),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    return world


def make_two_fly_world(full_pairs=False):
    from flygym_tpu.anatomy import (
        AxisOrder, ContactBodiesPreset, JointPreset, Skeleton,
    )
    from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
    from flygym_tpu.utils.math import Rotation3D

    def mkfly(name):
        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        return fly

    world = FlatGroundWorld()
    world.add_fly(mkfly("bottom"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(mkfly("top"), (0, 0, 3.2), Rotation3D("quat", (1, 0, 0, 0)))
    if full_pairs:
        # Default contact-body preset on both flies: 55x55 = 3,025 pair
        # rows, runs pair-compressed in-kernel (one row per geom1 group).
        world.add_fly_fly_contacts("bottom", "top")
    else:
        segs = [
            s
            for s in ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
            if "thorax" in s.name or "abdomen" in s.name or "head" in s.name
        ]
        world.add_fly_fly_contacts("bottom", "top", bodysegs=segs)
    return world


def make_blocks_world():
    from flygym_tpu.anatomy import JointPreset, Skeleton
    from flygym_tpu.compose import BlocksTerrainWorld, Fly, KinematicPosePreset
    from flygym_tpu.utils.math import Rotation3D

    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = BlocksTerrainWorld()
    world.add_fly(fly, (0, 0, 1.6), Rotation3D("quat", (1, 0, 0, 0)))
    return world


def measure(name, world, n_worlds, n_steps):
    from flygym_tpu.batch import BatchSimulation

    def sync(traj):
        # Fetch a TINY device-side slice: np.asarray on the full (n_steps,
        # n_worlds, nq) trajectory would stream GBs over the axon tunnel
        # and time the transfer, not the rollout.
        leaf = jax.tree_util.tree_leaves(traj)[0]
        np.asarray(leaf[-1, 0, :1])

    sim = BatchSimulation(world, n_worlds)
    sync(sim.rollout(None, n_steps))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        traj = sim.rollout(None, n_steps)
        sync(traj)
        best = min(best, time.perf_counter() - t0)
    wps = n_worlds * n_steps / best
    print(
        f"{name:16s} nv={sim.model.nv:4d} {best:7.3f}s -> {wps:12,.0f} w/s "
        f"({wps * sim.timestep:.0f}x rt)",
        flush=True,
    )
    return wps


def main():
    args = sys.argv[1:]
    n_worlds = int(args[0]) if len(args) > 0 else 4096
    n_steps = int(args[1]) if len(args) > 1 else 1000
    wanted = args[2:] or [
        "LEGS_ONLY", "ALL_BIOLOGICAL", "ALL_POSSIBLE", "two_fly",
        "two_fly_full", "blocks", "strict",
    ]

    print("devices:", jax.devices(), flush=True)
    for name in wanted:
        if name == "two_fly":
            world = make_two_fly_world()
        elif name == "two_fly_full":
            world = make_two_fly_world(full_pairs=True)
        elif name == "blocks":
            world = make_blocks_world()
        elif name == "strict":
            # Strict-parity exact-Newton mode (re-factor per iteration),
            # in-kernel since round 3 — the path VERDICT r2 flagged as
            # falling back below the reference's GPU baseline.
            world = make_preset_world("LEGS_ONLY")
            world.spec.options["solver_exact"] = True
            world.spec.options["solver_iterations"] = 10
        else:
            world = make_preset_world(name)
        measure(name, world, n_worlds, n_steps)


if __name__ == "__main__":
    main()
