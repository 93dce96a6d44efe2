"""Compose the full-body fly and open it in MuJoCo's interactive viewer.

The analog of the reference's ``scripts/launch_interactive_viewer.py``:
edit the constants below, run the script on a machine with ``mujoco`` and a
display. On headless hosts, it falls back to writing the MJCF next to this
script so you can open it elsewhere.

Run:  python scripts/launch_interactive_viewer.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AxisOrder,
    ContactBodiesPreset,
    JointPreset,
    Skeleton,
)
from flygym_tpu.compose import (
    ActuatorType,
    FlatGroundWorld,
    Fly,
    KinematicPosePreset,
)
from flygym_tpu.render import launch_interactive_viewer
from flygym_tpu.utils.math import Rotation3D

joint_preset = JointPreset.ALL_BIOLOGICAL
axis_order = AxisOrder.YAW_PITCH_ROLL
actuated_dofs = ActuatedDOFPreset.LEGS_ACTIVE_ONLY
actuator_type = ActuatorType.POSITION
actuator_position_gain = 50.0
neutral_pose = KinematicPosePreset.NEUTRAL
spawn_position = (0, 0, 0.8)  # xyz in mm
spawn_rotation = Rotation3D("quat", (1, 0, 0, 0))  # wxyz quaternion
bodysegs_with_ground_contact = ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD
run_async = False  # set True when launching from a notebook


def main():
    fly = Fly()
    skeleton = Skeleton(joint_preset=joint_preset, axis_order=axis_order)
    fly.add_joints(skeleton, neutral_pose)
    fly.add_actuators(
        skeleton.get_actuated_dofs_from_preset(actuated_dofs),
        actuator_type,
        neutral_input=neutral_pose,
        kp=actuator_position_gain,
    )
    fly.add_joint_sites(fly.skeleton.anatomical_joints)
    fly.colorize()
    fly.add_tracking_camera()

    world = FlatGroundWorld()
    world.add_fly(
        fly,
        spawn_position,
        spawn_rotation,
        bodysegs_with_ground_contact=bodysegs_with_ground_contact,
    )

    try:
        launch_interactive_viewer(world, run_async=run_async)
    except RuntimeError as e:
        out = Path(__file__).with_name("fly_world.xml")
        world.save_xml_with_assets(out)
        print(f"{e}\nWrote {out} — open it with `python -m mujoco.viewer`.")


if __name__ == "__main__":
    main()
