"""Render a demo video of the fly replaying recorded walking.

The analog of the reference's ``scripts/dev/make_demo_video.py`` (which drives
``GPUSimulation`` + the Warp batch renderer): compose the benchmark fly, feed
it the Spotlight mocap snippet through position actuators, and record the
tracking camera with the XLA raycaster. Physics advances through
``Simulation.step`` with ``render_as_needed`` gating, exactly the loop the
tutorials teach.

Usage:
    python scripts/dev/make_demo_video.py [out.mp4] [duration_s] [--mesh]

``--mesh`` renders with anatomical mesh SDFs (slower first compile).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import flygym_tpu
from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo.benchmark import make_model
from flygym_tpu.demo.spotlight import MotionSnippet

TIMESTEP = 1e-4


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--mesh"]
    mesh = "--mesh" in sys.argv[1:]
    out = Path(args[0]) if args else Path("outputs/demo_walking.mp4")
    duration_s = float(args[1]) if len(args) > 1 else 0.5
    out.parent.mkdir(parents=True, exist_ok=True)

    fly, world, cam = make_model()
    sim = flygym_tpu.Simulation(world)
    renderer = sim.set_renderer(
        cam, camera_res=(480, 640), playback_speed=0.2, mesh_fidelity=mesh
    )

    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    angles = MotionSnippet().get_joint_angles(TIMESTEP, dof_order)

    sim.set_leg_adhesion_states(fly.name, np.ones(6))
    sim.warmup()

    n_steps = min(int(duration_s / TIMESTEP), angles.shape[0])
    for i in range(n_steps):
        sim.set_actuator_inputs(fly.name, ActuatorType.POSITION, angles[i])
        sim.step_with_profile()
        sim.render_as_needed_with_profile()
        if i % 1000 == 0:
            print(f"step {i}/{n_steps}", flush=True)

    renderer.save_video(out)
    print(f"wrote {out} ({len(renderer.get_frames())} frames)")
    sim.print_performance_report()


if __name__ == "__main__":
    main()
