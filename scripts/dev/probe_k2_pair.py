"""Second K-fusion calibration point for pair-group kernels.

The two-fly 49-pair kernel at K=4 OOM'd at 147.40 MiB vs a 122.9
estimate (2026-08-20), so `_est_kernel_mb` carries a 12.2 MiB/(K-1)
pair-group penalty with a 1.5x single-point safety factor that clamps
pair rollouts to K=1. This probe compiles the SAME kernel at K=2 under
the 127 MiB ceiling at 4096 worlds:

- success -> a second point (excess <= ~8.2/step), justifying a relaxed
  penalty that re-opens K=2 (est 121.5 <= 124) for ~launch-amortization
  throughput on two-fly rollouts;
- a Mosaic/PJRT OOM -> the actual K=2 requirement for the fit.

Usage: python scripts/dev/probe_k2_pair.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

os.environ["FLYGYM_TPU_MEGASTEP_VMEM_MB"] = "127"

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from scripts.dev.validate_twofly_kernel import two_fly_world
    from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment
    from flygym_tpu.ops import megastep as ms

    segs = ["c_thorax"] + [
        n for n in ALL_SEGMENT_NAMES if n.endswith("tarsus5")
    ]
    world = two_fly_world(bodysegs=[BodySegment(s) for s in segs])
    world._spec.options["pair_compress"] = True
    model, state0 = world.compile()
    print(
        f"49-pair K=2 est (with penalty): "
        f"{ms._est_kernel_mb(model, k_steps=2):.1f} MiB; raw fused K=2: "
        f"{ms._est_scoped_mb(model, k_steps=2):.1f}",
        flush=True,
    )
    B = 4096
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    print("compiling the K=2 two-fly kernel at 4096 worlds ...", flush=True)
    kern = ms.make_megastep(model, k_steps=2)
    ctrl_seq = jnp.broadcast_to(bstate.ctrl[None], (2,) + bstate.ctrl.shape)
    try:
        t0 = time.time()
        out, traj = kern(bstate, ctrl_seq)
        np.asarray(out.qpos[0])
        print(
            f"  K=2 COMPILED AND RAN in {time.time() - t0:.1f}s — second "
            "calibration point: excess fits at <= ~4 MiB/step",
            flush=True,
        )
        # Quick rate check: 500 fused K=2 calls = 1000 steps.
        t0 = time.time()
        s = bstate
        for _ in range(250):
            s, _ = kern(s, ctrl_seq)
        np.asarray(s.qpos[0])
        dt_ = time.time() - t0
        rate = B * 500 / dt_
        print(
            f"  K=2 rate (250 fused calls = 500 steps): {dt_:.2f}s -> "
            f"{rate:,.0f} world-steps/s",
            flush=True,
        )
    except Exception as e:
        msg = str(e)
        print(
            f"  K=2 compile FAILED:\n--- head ---\n{msg[:1200]}\n"
            f"--- tail ---\n{msg[-2500:]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
