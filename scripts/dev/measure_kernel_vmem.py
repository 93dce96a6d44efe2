"""Calibrate the mega-step kernel's scoped-VMEM estimates on hardware.

Binary-searches, per model, the smallest FLYGYM_TPU_MEGASTEP_VMEM_MB at
which the kernel compiles and runs -- the kernel's ACTUAL scoped-VMEM
requirement -- and prints it against ``megastep._est_scoped_mb`` /
``_est_stream_mb``. Use after changing the emitters' live-set shape
(e.g. the _contacts_impl unification) to refit the estimate constants.
Each probe is a fresh compile (~2 min over the axon tunnel), so the
search is coarse (4 MiB resolution).

Usage: python scripts/dev/measure_kernel_vmem.py [lo_mb=24] [hi_mb=112]
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

LO = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
HI = float(sys.argv[2]) if len(sys.argv) > 2 else 112.0

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
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (1024,) + x.shape), state0
        )

        def fits(limit_mb):
            os.environ["FLYGYM_TPU_MEGASTEP_VMEM_MB"] = str(limit_mb)
            try:
                step = ms.make_megastep(model)
                out = step(bstate)
                np.asarray(out.qpos[0, :1])
                return True
            except Exception:
                return False
            finally:
                os.environ.pop("FLYGYM_TPU_MEGASTEP_VMEM_MB", None)

        lo, hi = LO, HI  # lo assumed failing, hi assumed passing
        if fits(lo):
            print(f"{name}: fits at lo={lo} MiB already (estimate {est:.1f})",
                  flush=True)
            continue
        if not fits(hi):
            print(f"{name}: does NOT fit at hi={hi} MiB (estimate {est:.1f})",
                  flush=True)
            continue
        while hi - lo > 4.0:
            mid = round((lo + hi) / 2)
            ok = fits(mid)
            print(f"  {name}: {mid} MiB -> {'ok' if ok else 'OOM'}", flush=True)
            if ok:
                hi = mid
            else:
                lo = mid
        print(f"{name}: actual scoped-VMEM need in ({lo:.0f}, {hi:.0f}] MiB "
              f"(estimate {est:.1f} MiB)", flush=True)


if __name__ == "__main__":
    main()
