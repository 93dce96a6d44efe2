"""Debug harness: full fly model vs MuJoCo golden, stage by stage."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import mujoco as mj

from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
    TetheredWorld,
)
from flygym_tpu.anatomy import ActuatedDOFPreset, AxisOrder, JointPreset, Skeleton
from flygym_tpu.utils.math import Rotation3D
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.engine.step import step


def build(world_kind="flat", actuators=True, adhesion=True):
    fly = Fly()
    sk = Skeleton(axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=JointPreset.LEGS_ONLY)
    fly.add_joints(sk, neutral_pose=KinematicPosePreset.NEUTRAL)
    if actuators:
        dofs = fly.skeleton.get_actuated_dofs_from_preset(
            ActuatedDOFPreset.LEGS_ACTIVE_ONLY
        )
        fly.add_actuators(
            dofs, ActuatorType.POSITION, kp=50.0,
            neutral_input=KinematicPosePreset.NEUTRAL,
        )
    if adhesion:
        fly.add_leg_adhesion()
    if world_kind == "flat":
        world = FlatGroundWorld()
    else:
        world = TetheredWorld()
    world.add_fly(fly, (0, 0, 0.8), Rotation3D("quat", (1, 0, 0, 0)))
    return fly, world


def compare_fk(world):
    """Compare body poses at the neutral keyframe."""
    model, state = world.compile()
    xml = world.spec.to_mjcf_xml()
    m = mj.MjModel.from_xml_string(xml)
    d = mj.MjData(m)
    mj.mj_resetDataKeyframe(m, d, 0)
    mj.mj_forward(m, d)

    id2name = {v: k for k, v in world.compiled.body_name2id.items()}
    max_pos_err, max_quat_err, worst = 0.0, 0.0, None
    for bid in range(1, model.nbody):
        name = id2name[bid]
        mj_bid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_BODY, name)
        if mj_bid < 0:
            print("  MISSING body in mujoco:", name)
            continue
        p_me = np.asarray(state.xpos[bid])
        p_mj = d.xpos[mj_bid]
        q_me = np.asarray(state.xquat[bid])
        q_mj = d.xquat[mj_bid]
        pe = np.abs(p_me - p_mj).max()
        qe = min(np.abs(q_me - q_mj).max(), np.abs(q_me + q_mj).max())
        if pe > max_pos_err:
            max_pos_err, worst = pe, name
        max_quat_err = max(max_quat_err, qe)
    print(f"  FK: max pos err {max_pos_err:.2e} ({worst}), max quat err {max_quat_err:.2e}")
    # also mass/inertia check
    for bid in range(1, min(model.nbody, 5)):
        name = id2name[bid]
        mj_bid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_BODY, name)
        print(f"  {name}: mass me={float(model.body_mass[bid]):.3e} mj={m.body_mass[mj_bid]:.3e}")
    return model, state, m, d


def compare_dynamics(world, n_steps=200, label=""):
    model, state = world.compile()
    xml = world.spec.to_mjcf_xml()
    m = mj.MjModel.from_xml_string(xml)
    d = mj.MjData(m)
    mj.mj_resetDataKeyframe(m, d, 0)

    # hinge qpos addresses in mujoco, by name
    hq_mj = []
    for name in world.compiled.hinge_name2id:
        jid = mj.mj_name2id(m, mj.mjtObj.mjOBJ_JOINT, name)
        hq_mj.append(m.jnt_qposadr[jid])
    hq_mj = np.array(hq_mj)
    hq_me = np.array([world.compiled.hinge_qadr[n] for n in world.compiled.hinge_name2id])

    jstep = jax.jit(step)
    errs = []
    for i in range(n_steps):
        state = jstep(model, state)
        mj.mj_step(m, d)
        if i % 50 == 0 or i == n_steps - 1:
            ang_me = np.asarray(state.qpos)[hq_me]
            ang_mj = d.qpos[hq_mj]
            err = np.abs(ang_me - ang_mj).max()
            errs.append(err)
            extra = ""
            if model.free_joints:
                qadr = model.free_joints[0][1]
                extra = f" rootz me={float(state.qpos[qadr+2]):.4f} mj={d.qpos[qadr+2]:.4f}"
            print(f"  {label} step {i:4d}: max hinge angle err {err:.2e}"
                  f" me_max|q|={np.abs(ang_me).max():.3f}{extra}")
    return errs


if __name__ == "__main__":
    print("=== Tethered, no actuators (passive spring-damper dynamics) ===")
    fly, world = build("tethered", actuators=False, adhesion=False)
    compare_fk(world)
    compare_dynamics(world, 200, "tethered")

    print("=== Flat ground, position actuators + adhesion ===")
    fly, world = build("flat")
    compare_fk(world)
    compare_dynamics(world, 400, "flat")
