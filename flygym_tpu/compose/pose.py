"""Static kinematic poses (named joint-angle snapshots).

Parity reference: flygym ``compose/pose.py`` (KinematicPose :14-77, YAML
loading :80-105, left-to-right mirroring :108-128, presets :131-161).

Pose files may be YAML or JSON and must contain ``angle_unit`` ("degree" or
"radian"), ``axis_order``, and a ``joint_angles`` mapping from joint DoF names
to angles. The bundled neutral poses are derived from the NeuroMechFly v2
reference assets (Apache-2.0).
"""

import json
import math
from enum import Enum
from os import PathLike
from pathlib import Path

import yaml

from flygym_tpu import assets_dir
from flygym_tpu.anatomy import AxisOrder, BodySegment, JointDOF, RotationAxis

__all__ = ["KinematicPose", "KinematicPosePreset"]


class KinematicPose:
    """A snapshot of joint angles defining a static fly pose.

    Args:
        path: Pose file (YAML/JSON). Mutually exclusive with
            ``joint_angles_rad_dict``.
        joint_angles_rad_dict: Mapping of joint DoF names to angles in radians.
            Mutually exclusive with ``path``.
        axis_order: Required with ``joint_angles_rad_dict``; forbidden with
            ``path`` (the file declares its own axis order).
        mirror_left2right: Mirror left-side angles onto missing right-side
            DoFs (anatomical convention: angles are side-symmetric).
    """

    def __init__(
        self,
        *,
        path: PathLike | None = None,
        joint_angles_rad_dict: dict[str, float] | None = None,
        axis_order: AxisOrder | str | list[RotationAxis | str] | None = None,
        mirror_left2right: bool = True,
    ) -> None:
        if joint_angles_rad_dict is not None and path is None:
            if axis_order is None:
                raise ValueError(
                    "When initializing from `joint_angles_rad_dict`, axis_order "
                    "must also be provided."
                )
            angles = dict(joint_angles_rad_dict)
            axis_order = AxisOrder(axis_order)
        elif path is not None and joint_angles_rad_dict is None:
            if axis_order is not None:
                raise ValueError(
                    "When initializing from `path`, `axis_order` should not be "
                    "provided because it will be loaded from the pose file."
                )
            angles, axis_order = _load_pose_file(path)
        else:
            raise ValueError(
                "Either joint_angles_rad_dict or path must be provided, but not both."
            )

        if mirror_left2right:
            _mirror_left2right_in_place(angles)

        self.axis_order = axis_order
        self.joint_angles_lookup_rad = angles

    def copy(self) -> "KinematicPose":
        """Return an independent copy of this pose."""
        return KinematicPose(
            joint_angles_rad_dict=dict(self.joint_angles_lookup_rad),
            axis_order=self.axis_order,
        )


def _load_pose_file(path: PathLike) -> tuple[dict[str, float], AxisOrder]:
    path = Path(path)
    with open(path) as f:
        data = json.load(f) if path.suffix == ".json" else yaml.safe_load(f)

    unit = data.get("angle_unit")
    if unit not in ("degree", "radian"):
        raise ValueError("YAML file must contain angle_unit: 'degree' or 'radian'.")

    raw_angles = data.get("joint_angles")
    if not isinstance(raw_angles, dict):
        raise ValueError("YAML file must contain 'joint_angles' mapping.")
    for name, value in raw_angles.items():
        if not isinstance(value, (int, float)):
            raise ValueError(f"Joint angle for '{name}' must be a number.")

    to_rad = math.radians if unit == "degree" else float
    angles = {name: to_rad(value) for name, value in raw_angles.items()}

    raw_order = data.get("axis_order")
    try:
        axis_order = AxisOrder(raw_order)
    except (ValueError, TypeError):
        raise ValueError(f"Invalid or missing axis_order: {raw_order}")
    return angles, axis_order


def _mirror_left2right_in_place(angles: dict[str, float]) -> None:
    """Copy each left-side angle onto the corresponding right-side DoF when the
    latter is missing. Mutates the dict in place."""
    for name, angle in list(angles.items()):
        dof = JointDOF.from_name(name)
        if dof.child.name[0] != "l":
            continue
        parent_name = dof.parent.name
        if parent_name[0] == "l":
            parent_name = "r" + parent_name[1:]
        mirrored = JointDOF(
            BodySegment(parent_name),
            BodySegment("r" + dof.child.name[1:]),
            dof.axis,
        )
        angles.setdefault(mirrored.name, float(angle))


class KinematicPosePreset(Enum):
    """Bundled poses.

    Attributes:
        NEUTRAL: The neutral (resting) pose.
    """

    NEUTRAL = "neutral"

    def get_dir(self) -> Path:
        if self is KinematicPosePreset.NEUTRAL:
            return assets_dir / "model/pose/neutral"
        raise ValueError(f"Unsupported KinematicPosePreset: {self.value}")

    def get_pose_by_axis_order(
        self, axis_order: AxisOrder, mirror_left2right: bool = True
    ) -> KinematicPose:
        """Load this preset's pose file for the given axis order."""
        pose_path = self.get_dir() / f"{axis_order.to_str()}.json"
        return KinematicPose(path=pose_path, mirror_left2right=mirror_left2right)
