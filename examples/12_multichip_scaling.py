"""Example 12: scaling worlds over a multi-chip device mesh.

The framework's parallelism model matches the reference's (one axis:
independent worlds — SURVEY.md §2.4), scaled the TPU way: `vmap` packs
worlds per chip, and a 1-D `jax.sharding.Mesh("world")` shards the world
axis across chips. The jitted step runs SPMD with ZERO cross-world
collectives — scaling rides ICI with no communication on the hot path.

By default the script provisions virtual CPU devices (the same recipe
the driver's dryrun uses), so the sharded program runs anywhere. On a
real multi-chip slice pass ``--real`` to use the actual chips from
``jax.devices()`` instead.

Run: python examples/12_multichip_scaling.py [n_devices=8] [--real]
"""

import os
import re
import sys
from pathlib import Path

# Parse argv only when run as a script (under pytest argv is pytest's).
_ARGV = sys.argv[1:] if __name__ == "__main__" else []
ARGS = [a for a in _ARGV if a != "--real"]
USE_REAL_DEVICES = "--real" in _ARGV
N_DEVICES = int(ARGS[0]) if ARGS else 8

if not USE_REAL_DEVICES:
    # -- provision a virtual CPU mesh (replace, not append, any inherited
    # device-count flag so a stale smaller value cannot win) --------------
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if not USE_REAL_DEVICES:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from flygym_tpu.anatomy import ActuatedDOFPreset, JointPreset, Skeleton
from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.parallel import make_world_mesh
from flygym_tpu.utils.math import Rotation3D


def main():
    devices = jax.devices()[:N_DEVICES]
    print(f"devices: {len(devices)} x {devices[0].platform}")
    mesh = make_world_mesh(devices)

    fly = Fly(name="fly")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_actuators(
        fly.skeleton.get_actuated_dofs_from_preset(
            ActuatedDOFPreset.LEGS_ACTIVE_ONLY
        ),
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))

    n_worlds = 4 * len(devices)
    sim = BatchSimulation(world, n_worlds, mesh=mesh)
    sim.set_leg_adhesion_states("fly", np.ones((n_worlds, 6), np.float32))

    # Every array in the state is sharded over the world axis; the step
    # (and whole scanned episodes) compile once and run SPMD.
    print("qpos sharding:", sim.state.qpos.sharding)
    sim.step()
    traj = sim.rollout(None, 50)
    qpos = np.asarray(traj["qpos"]) if isinstance(traj, dict) else np.asarray(
        jax.tree_util.tree_leaves(traj)[0]
    )
    angles = sim.get_joint_angles("fly")
    print(f"stepped {n_worlds} worlds over {len(devices)} devices; "
          f"joint angles {angles.shape}, trajectory leaf {qpos.shape}")
    assert np.isfinite(np.asarray(angles)).all()
    print("OK")


if __name__ == "__main__":
    main()
