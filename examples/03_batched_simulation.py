"""Tutorial 3 — Batched (and multi-chip) simulation.

The TPU analog of the reference's tutorial 3 (GPU-accelerated simulation):
thousands of identical worlds vmapped on one chip, sharded over a device
mesh when more chips are available, with the whole episode scanned on device.

Run:  python examples/03_batched_simulation.py [n_worlds]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import sys
import time

import numpy as np
import jax

import flygym_tpu
from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import ReplayTargetData, make_model


def main(n_worlds: int = 512, n_steps: int = 1000):
    fly, world, _cam = make_model()
    sim = flygym_tpu.BatchSimulation(world, n_worlds)
    # Multi-chip: pass a mesh and the world axis shards across devices:
    #   from jax.sharding import Mesh
    #   mesh = Mesh(np.array(jax.devices()), ("world",))
    #   sim = flygym_tpu.BatchSimulation(world, n_worlds, mesh=mesh)

    sim.set_leg_adhesion_states(fly.name, np.ones((n_worlds, 6), np.float32))
    sim.rollout(None, 500)  # settle (scanned on device)

    # Each world replays a different partition of the recorded walking clip.
    replay = ReplayTargetData(
        sim.timestep, fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    )
    targets = replay.make_target_angles_all_worlds(n_worlds, n_steps)
    act_ids = sim._act_ids_by_type[ActuatorType.POSITION][fly.name]
    ctrl_seq = np.full((n_steps, n_worlds, sim.model.nu), np.nan, np.float32)
    ctrl_seq[:, :, act_ids] = np.swapaxes(targets, 0, 1)

    sim.rollout(ctrl_seq, n_steps)  # compile outside the timed region
    start = time.perf_counter()
    sim.rollout(ctrl_seq, n_steps)
    np.asarray(sim.state.qpos[0, 0])  # host fetch = device sync
    wall = time.perf_counter() - start

    steps_per_s = n_steps * n_worlds / wall
    print(
        f"{n_worlds} worlds x {n_steps} steps in {wall:.2f} s "
        f"-> {steps_per_s:,.0f} world-steps/s "
        f"({steps_per_s * sim.timestep:.1f}x realtime aggregate)"
    )

    # 16-world montage, rendered in ONE vmapped device call (the analog of
    # the reference's GPU batch renderer + grid montage,
    # ``warp/rendering.py:141-262``). The colorized fly materials
    # (visuals.json via Fly.colorize) show in the frames.
    renderer = sim.set_renderer(
        "trackcam", camera_res=(120, 160), world_ids=list(range(16))
    )
    renderer.render(sim.state)
    out = Path("outputs/03_batch_montage.png")
    out.parent.mkdir(exist_ok=True)
    from PIL import Image

    from flygym_tpu.utils.video import montage_grid

    frames = renderer.get_frames()[-1]  # (16, H, W, 3)
    Image.fromarray(montage_grid(frames, renderer.world_ids)).save(out)
    print(f"16-world montage -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
