"""Micro-benchmark the heightfield plane samplers (engine/terrain.py).

Times each sampler method standalone (jitted, batched states) on the
blocks terrain at benchmark world counts — the out-of-kernel cost that
round 2 measured as ~45% of terrain-world step time (amortized over
8-step chunks). Use to pick/validate FLYGYM_TPU_TERRAIN_SAMPLER; the
end-to-end terrain row comes from scripts/dev/bench_models.py blocks.

Usage: python scripts/dev/bench_terrain_sampler.py [n_worlds=4096] [reps=20]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print("devices:", jax.devices(), flush=True)

    from flygym_tpu.anatomy import JointPreset, Skeleton
    from flygym_tpu.compose import BlocksTerrainWorld, Fly, KinematicPosePreset
    from flygym_tpu.engine.terrain import make_plane_sampler
    from flygym_tpu.utils.math import Rotation3D

    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = BlocksTerrainWorld()
    world.add_fly(fly, (0, 0, 1.6), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()
    print(
        f"grid={tuple(model.hfield_data.shape)} ncand={model.ncand} "
        f"B={n_worlds}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    xpos = np.broadcast_to(
        np.asarray(state.xpos), (n_worlds,) + state.xpos.shape
    ).copy()
    xquat = np.broadcast_to(
        np.asarray(state.xquat), (n_worlds,) + state.xquat.shape
    )
    xpos[..., :2] += rng.uniform(-30, 30, size=(n_worlds, 1, 2)).astype(np.float32)
    xpos_d = jax.device_put(jnp.asarray(xpos))
    xquat_d = jax.device_put(jnp.asarray(xquat))

    ref = None
    for method in ("onehot", "onehot_bf16", "window", "window_gather"):
        sampler = make_plane_sampler(model, method)
        if method.startswith("window"):
            print(f"  window sizes: {[w for _, w in sampler.groups]}", flush=True)
        fn = jax.jit(sampler)
        out = fn(xpos_d, xquat_d)
        np.asarray(out[0, 0])  # sync (compile + first run)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(xpos_d, xquat_d)
        np.asarray(out[0, 0])
        per = (time.perf_counter() - t0) / reps
        o = np.asarray(out)
        if ref is None:
            ref = o
        err = np.abs(o - ref).max()
        print(
            f"{method:8s}: {per * 1e6:9.1f} us/sample "
            f"({per / 8 * 1e6:7.1f} us/step at K=8)  max|err|={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
