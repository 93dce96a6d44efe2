"""Calibrate the mega-step kernel's scoped-VMEM estimates on hardware.

Compiles each model's kernel with a deliberately too-small per-kernel
VMEM limit (FLYGYM_TPU_MEGASTEP_VMEM_MB); Mosaic's compile error reports
the kernel's ACTUAL requirement, which this script parses and compares to
``megastep._est_scoped_mb`` / ``_est_stream_mb``. Use after changing the
emitters' live-set shape (e.g. the _contacts_impl unification) to refit
the estimate constants.

Usage: python scripts/dev/measure_kernel_vmem.py [limit_mb=24]
"""

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

LIMIT = sys.argv[1] if len(sys.argv) > 1 else "24"
os.environ["FLYGYM_TPU_MEGASTEP_VMEM_MB"] = LIMIT

import numpy as np
import jax
import jax.numpy as jnp


def models():
    from flygym_tpu.anatomy import JointPreset, Skeleton
    from flygym_tpu.compose import (
        Fly, FlatGroundWorld, KinematicPosePreset,
    )
    from flygym_tpu.utils.math import Rotation3D

    for name, preset in [
        ("legs_only", JointPreset.LEGS_ONLY),
        ("all_biological", JointPreset.ALL_BIOLOGICAL),
        ("all_possible", JointPreset.ALL_POSSIBLE),
    ]:
        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(axis_order="ypr", joint_preset=preset),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        world = FlatGroundWorld()
        world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
        yield name, world


def main():
    from flygym_tpu.ops import megastep as ms

    for name, world in models():
        model, state0 = world.compile()
        est = (ms._est_stream_mb(model) if ms._stream_mode(model)
               else ms._est_scoped_mb(model))
        step = ms.make_megastep(model)
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (1024,) + x.shape), state0
        )
        try:
            out = step(bstate)
            np.asarray(out.qpos)
            print(f"{name}: compiled and ran WITHIN {LIMIT} MiB — actual "
                  f"need is <= {LIMIT} MiB; re-run with a smaller limit to "
                  f"bracket it (estimate {est:.1f} MiB)", flush=True)
        except Exception as e:
            msg = str(e)
            m = re.search(r"(\d+)\s*bytes", msg) or re.search(
                r"([\d.]+)\s*[MG]i?B", msg)
            detail = m.group(0) if m else msg.splitlines()[-1][:200]
            print(f"{name}: limit {LIMIT} MiB too small -> actual need "
                  f"reported as: {detail}   (estimate {est:.1f} MiB)",
                  flush=True)


if __name__ == "__main__":
    main()
