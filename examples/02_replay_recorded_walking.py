"""Tutorial 2 — Replaying experimentally recorded walking.

The TPU analog of the reference's tutorial 2: drive the position actuators
with Spotlight motion-capture joint angles and watch the fly walk. The whole
episode runs as one scanned XLA program.

Run:  python examples/02_replay_recorded_walking.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import MotionSnippet, make_model


def main(n_steps: int = 5000, settle_steps: int = 500, render: bool = True):
    fly, world, cam = make_model(spawn_position=(0, 0, 1.2))
    sim = BatchSimulation(world, 1)

    # Recorded joint angles, smoothed and resampled onto the sim time grid.
    snippet = MotionSnippet()
    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    angles = snippet.get_joint_angles(sim.timestep, dof_order)
    n_steps = min(len(angles), n_steps)
    print(f"replaying {n_steps} steps ({n_steps * sim.timestep:.2f} s)")

    sim.set_leg_adhesion_states(fly.name, np.ones((1, 6), np.float32))
    sim.rollout(None, settle_steps)  # settle on the ground

    act_ids = sim._act_ids_by_type[ActuatorType.POSITION][fly.name]
    ctrl_seq = np.full((n_steps, 1, sim.model.nu), np.nan, np.float32)
    ctrl_seq[:, 0, act_ids] = angles[:n_steps]

    start = np.asarray(sim.state.qpos[0, :3]).copy()
    traj = sim.rollout(jnp.asarray(ctrl_seq), n_steps)
    end = np.asarray(sim.state.qpos[0, :3])
    print(f"fly moved from {np.round(start, 2)} to {np.round(end, 2)} mm")

    if render:
        # Render the final pose at mesh fidelity: the capsule broad-phase
        # hits are refined against the true anatomical mesh SDFs (thin wing
        # membranes, real head/thorax silhouettes — render/sdf.py).
        renderer = sim.set_renderer(
            cam, camera_res=(240, 320), world_ids=[0], mesh_fidelity=True
        )
        renderer.render(sim.state)
        renderer.save_video("/tmp/replay_final_frame.mp4")
        print("wrote /tmp/replay_final_frame.mp4 (or .gif fallback)")


if __name__ == "__main__":
    main()
