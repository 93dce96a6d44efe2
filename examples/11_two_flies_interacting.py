"""Example 11 — Two flies physically interacting.

Multi-fly worlds: two flies share one world and collide through explicit
capsule-capsule contact pairs (``World.add_fly_fly_contacts``, the analog of
the reference's multi-fly explicit-pair contact machinery, flygym
``world.py:95-149``). One fly is dropped onto the other; the stack settles
with the upper fly resting on the lower one's back. As of 2026-08-20 EVERY
fly-fly preset rides the Pallas mega-step kernel on TPU — including the
full 55x55 set (streaming emitter on a narrow block) — and N>2 flies
compose via ``World.add_all_fly_fly_contacts`` (all unordered pairs; see
``scripts/dev/bench_threefly.py``: 3 flies at 1.36M world-steps/s).

Run:  python examples/11_two_flies_interacting.py [n_worlds]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import flygym_tpu
from flygym_tpu.anatomy import AxisOrder, ContactBodiesPreset, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.utils.math import Rotation3D


def make_two_fly_world():
    def mkfly(name):
        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        fly.colorize()
        fly.add_tracking_camera()
        return fly

    world = FlatGroundWorld()
    world.add_fly(mkfly("bottom"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(mkfly("top"), (0, 0, 3.2), Rotation3D("quat", (1, 0, 0, 0)))
    # Trunk-only pair set: enough to carry one fly on the other, and small
    # enough that the model stays inside the mega-step kernel's scoped-VMEM
    # budget (see flygym_tpu.ops.megastep.megastep_supported).
    segs = [
        s
        for s in ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
        if "thorax" in s.name or "abdomen" in s.name or "head" in s.name
    ]
    n_pairs = world.add_fly_fly_contacts("bottom", "top", bodysegs=segs)
    print(f"{n_pairs} capsule-capsule contact pairs between the two flies")
    return world


def main(n_worlds: int = 0):
    world = make_two_fly_world()

    if n_worlds:
        sim = flygym_tpu.BatchSimulation(world, n_worlds)
        adhesion = np.ones((n_worlds, 6), np.float32)
    else:
        sim = flygym_tpu.Simulation(world)
        adhesion = np.ones(6, np.float32)
    sim.set_leg_adhesion_states("bottom", adhesion)

    sim.rollout(None, 800)  # drop + settle, scanned on device
    qpos = np.asarray(sim.state.qpos)
    if n_worlds:
        qpos = qpos[0]
    z_bottom = float(qpos[2])
    top_qadr = sim.model.free_joints[1][1]
    z_top = float(qpos[top_qadr + 2])
    print(f"bottom fly root z = {z_bottom:.2f} mm, top fly root z = {z_top:.2f} mm")
    assert z_top > z_bottom + 0.4, "top fly should rest ON the bottom fly"

    renderer = sim.set_renderer("bottom/trackcam", camera_res=(240, 320))
    renderer.render(sim.state)
    out = Path("outputs/11_two_flies.png")
    out.parent.mkdir(exist_ok=True)
    from PIL import Image

    frame = renderer.get_frames()[-1]
    if frame.ndim == 4:
        frame = frame[0]
    Image.fromarray(frame).save(out)
    print(f"frame -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
