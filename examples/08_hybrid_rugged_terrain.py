"""Tutorial 8 — Hybrid controller on rugged (blocks) terrain.

CPG rhythm + mechanosensory reflexes (retraction of stuck legs, stumbling
correction) walking over a checkerboard of raised blocks — north-star
config 3. Controller and physics fuse into one scanned program.

Run:  python examples/08_hybrid_rugged_terrain.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import ActuatedDOFPreset, AxisOrder, JointPreset, Skeleton
from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import (
    ActuatorType,
    BlocksTerrainWorld,
    Fly,
    KinematicPosePreset,
)
from flygym_tpu.control import (
    CPGController,
    HybridController,
    extract_preprogrammed_steps,
)
from flygym_tpu.demo import MotionSnippet
from flygym_tpu.engine.maths import quat_rotate
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.utils.math import Rotation3D


def main(n_steps: int = 3000):
    fly = Fly(name="rugged")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    fly.add_actuators(
        dofs, ActuatorType.POSITION, kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = BlocksTerrainWorld(block_size=1.3, height_range=(0.2, 0.35))
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))

    sim = BatchSimulation(world, 1)
    sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
    sim.rollout(None, 500)

    steps_data = extract_preprogrammed_steps(
        MotionSnippet(), fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    hybrid = HybridController(cpg=CPGController(steps_data, timestep=sim.timestep))

    act_ids = jnp.asarray(sim._act_ids_by_type[ActuatorType.POSITION][fly.name])
    adh_ids = jnp.asarray(sim._adh_ids[fly.name])
    tip_ids = jnp.asarray(
        [world.compiled.body_name2id[f"{fly.name}/{leg}_tarsus5"]
         for leg in fly.get_legs_order()]
    )
    slot_ids = jnp.asarray(
        [world.compiled.sensor_name2slot[
            world.legpos_to_groundcontactsensors_by_fly[fly.name][leg].full_identifier]
         for leg in fly.get_legs_order()]
    )
    model = sim.model

    @jax.jit
    def episode(state, ctrl_state):
        def body(carry, _):
            st, cs = carry
            tip_z = st.xpos[0, tip_ids, 2]
            sensor = st.contact_sensordata[0, slot_ids]
            frame_force = sensor[:, 1:4]
            normal = sensor[:, 10:13]
            tangent = sensor[:, 13:16]
            f_world = (
                frame_force[:, 0:1] * normal + frame_force[:, 1:2] * tangent
            )
            heading = quat_rotate(st.xquat[0, 1], jnp.array([1.0, 0.0, 0.0]))
            cs, targets, adhesion = hybrid(cs, tip_z, f_world, heading)
            ctrl = st.ctrl.at[:, act_ids].set(targets[None])
            ctrl = ctrl.at[:, adh_ids].set(adhesion[None])
            st = jax.vmap(engine_step, in_axes=(None, 0))(
                model, dataclasses.replace(st, ctrl=ctrl)
            )
            return (st, cs), st.qpos[0, :3]

        (st, cs), traj = jax.lax.scan(body, (state, ctrl_state), None, length=n_steps)
        return st, traj

    final, traj = episode(sim.state, hybrid.init_state(0))
    traj = np.asarray(traj)
    dist = np.linalg.norm(traj[-1, :2] - traj[0, :2])
    print(f"walked {dist:.2f} mm over blocks in {n_steps * sim.timestep:.2f} s; "
          f"final height {traj[-1, 2]:.2f} mm (blocks up to 0.35 mm)")


if __name__ == "__main__":
    main()
