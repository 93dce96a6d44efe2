"""Tutorial 5 — Multimodal sensing: ommatidia vision and olfaction.

Renders both compound eyes (721 ommatidia each, pale/yellow channels) by
direct per-ommatidium raycast and samples an odor plume at the antennae and
maxillary palps — both pure-JAX, fusable into scanned episodes.

Run:  python examples/05_vision_olfaction.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.olfaction import OdorField
from flygym_tpu.utils.math import Rotation3D
from flygym_tpu.vision import Retina


def main():
    fly = Fly(name="fly0")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.colorize()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()

    # --- vision ---
    retina = Retina.for_fly(world, "fly0")
    intensities = np.asarray(jax.jit(retina.render)(model, state))
    print("retina output:", intensities.shape, "(eyes, ommatidia, channels)")
    print(
        f"left eye mean {intensities[0].mean():.3f}, "
        f"right eye mean {intensities[1].mean():.3f}"
    )

    # --- olfaction: one attractive odor source ahead-left of the fly ---
    field = OdorField.for_fly(
        world,
        "fly0",
        source_pos=[[20.0, 10.0, 1.0]],
        peak_intensity=[[1.0]],
    )
    odor = np.asarray(jax.jit(field.sample)(model, state))
    print("odor intensities (dim, [l-ant r-ant l-palp r-palp]):")
    print(np.round(odor, 5))
    print("left antenna smells more:", odor[0, 0] > odor[0, 1])


if __name__ == "__main__":
    main()
