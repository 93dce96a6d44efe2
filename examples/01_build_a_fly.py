"""Tutorial 1 — Building a fly model.

The TPU analog of the reference's tutorial 1 (interacting with the model):
compose a fly from presets, attach it to a world, compile, inspect, and
export the model as MJCF.

Run:  python examples/01_build_a_fly.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import flygym_tpu
from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AxisOrder,
    JointPreset,
    Skeleton,
)
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.utils.math import Rotation3D


def main():
    # 1. A fly is a body tree (69 segments) + joints chosen by preset.
    fly = Fly(name="fly0")
    skeleton = Skeleton(
        axis_order=AxisOrder.YAW_PITCH_ROLL,  # match your data's convention
        joint_preset=JointPreset.LEGS_ONLY,  # 66 leg DoFs
    )
    fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)

    # 2. Actuate the biologically active DoFs with position servos.
    actuated = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY  # 42 DoFs
    )
    fly.add_actuators(
        actuated,
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()  # tarsal adhesion, ctrl in [1, 100]
    fly.add_joint_sites(fly.skeleton.anatomical_joints)
    fly.colorize()
    fly.add_tracking_camera()

    # 3. Attach to a world and compile to device arrays.
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()
    print(f"bodies: {model.nbody}, DoFs: {model.nv}, actuators: {model.nu}")
    print(f"total mass: {float(np.asarray(model.body_mass).sum())*1e3:.3f} mg-eq")

    # 4. The canonical orders define the I/O contract.
    print("first joint DoFs:", [d.name for d in fly.get_jointdofs_order()[:3]])

    # 5. Export as MJCF (loadable by any MuJoCo viewer for inspection).
    world.save_xml_with_assets("/tmp/fly_world.xml")
    print("exported /tmp/fly_world.xml")

    # 6. Step it briefly and read state.
    sim = flygym_tpu.Simulation(world)
    sim.set_leg_adhesion_states("fly0", np.ones(6))
    sim.warmup()
    found, forces, *_ = sim.get_ground_contact_info("fly0")
    print("legs in ground contact after settling:", found)


if __name__ == "__main__":
    main()
