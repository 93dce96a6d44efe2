"""Regenerate the neutral-pose files for all six Euler axis orders.

The analog of the reference's ``scripts/dev/convert_pose_to_all_axis_orders.py``:
take the canonical neutral pose in one axis order and fit the remaining five
via the differentiable-IK converter (``flygym_tpu.utils.pose_conversion``,
Adam through forward kinematics instead of the reference's scipy L-BFGS-B),
then write each result as a pose JSON next to the originals.

Usage:
    python scripts/dev/convert_pose_to_all_axis_orders.py [out_dir]

By default results go to ``outputs/pose_neutral/`` (NOT directly over the
bundled assets — inspect, then copy into
``flygym_tpu/assets/model/pose/neutral/`` deliberately).
"""

import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from flygym_tpu.anatomy import AxisOrder, JointPreset
from flygym_tpu.compose.pose import KinematicPosePreset
from flygym_tpu.utils.pose_conversion import convert_pose_axis_order

SOURCE_ORDER = AxisOrder.YAW_PITCH_ROLL
JOINT_PRESET = JointPreset.ALL_BIOLOGICAL


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("outputs/pose_neutral")
    out_dir.mkdir(parents=True, exist_ok=True)

    source = KinematicPosePreset.NEUTRAL.get_pose_by_axis_order(SOURCE_ORDER)
    for target in AxisOrder:
        if target == SOURCE_ORDER:
            converted = source
        else:
            print(f"fitting {target.to_str()} ...", flush=True)
            converted = convert_pose_axis_order(
                source, target, joint_preset=JOINT_PRESET
            )
        path = out_dir / f"{target.to_str()}.json"
        path.write_text(
            json.dumps(
                {
                    "angle_unit": "degree",
                    "axis_order": target.to_list_of_str(),
                    "joint_angles": {
                        name: round(math.degrees(float(rad)), 1)
                        for name, rad in sorted(
                            converted.joint_angles_lookup_rad.items()
                        )
                    },
                },
                indent=1,
            )
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
