"""Stage-level TPU timing of the physics step at a given batch size.

Each stage is jitted and timed separately (includes its own dispatch cost,
so the sum over stages exceeds the fused full-step time — use for *ranking*
stages, not absolute accounting). Timing uses host fetches: on axon,
``block_until_ready`` does not block.

Usage: python scripts/dev/profile_stages.py [batch=1024] [iters=30]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from flygym_tpu.anatomy import Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.engine import actuation, contact, dynamics
from flygym_tpu.engine.kinematics import (
    dof_subspace,
    geom_poses,
    kinematics_full,
    velocity_pass,
)
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D


def build_world():
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset="legs_only"),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    return world.compile()


def timeit(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    model, state0 = build_world()
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )

    # Pre-settle a bit so contacts are active.
    settle = jax.jit(lambda m, s: jax.vmap(lambda ss: step(m, ss))(s))
    for _ in range(3):
        bstate = settle(model, bstate)
    np.asarray(bstate.qpos)

    dt = model.timestep

    def fk_stage(qpos):
        return kinematics_full(model, qpos)

    def pos_stage(qpos):
        xpos, xquat, hinge_xaxis = kinematics_full(model, qpos)
        ref = xpos[model.ref_body]
        S = dof_subspace(model, xpos, hinge_xaxis, ref)
        gpos, gquat = geom_poses(model, xpos, xquat)
        return xpos, xquat, S, gpos, gquat, ref

    def vel_stage(args, qvel):
        xpos, xquat, S, gpos, gquat, ref = args
        return velocity_pass(model, qvel, xpos, S)

    def inertia_stage(args):
        xpos, xquat, S, gpos, gquat, ref = args
        I_body = dynamics.body_spatial_inertias(model, xpos, xquat, ref)
        M = dynamics.crba(model, I_body, S)
        return I_body, M

    def bias_stage(args, vel, inert):
        xpos, xquat, S, gpos, gquat, ref = args
        cvel, cacc_bias = vel
        I_body, M = inert
        return dynamics.rnea_bias(model, I_body, S, cvel, cacc_bias)

    def force_stage(qpos, qvel, ctrl, act):
        qfrc_passive = dynamics.passive_forces(model, qpos, qvel)
        qfrc_act, actuator_force = actuation.actuator_forces(
            model, qpos, qvel, ctrl, act
        )
        return qfrc_passive + qfrc_act

    def contact_stage(args, inert, qfrc_smooth, qvel, qacc_warm, ctrl):
        xpos, xquat, S, gpos, gquat, ref = args
        I_body, M = inert
        Mh = M + dt * jnp.diag(model.dof_damping)
        qacc, info = contact.solve_contacts(
            model, Mh, qfrc_smooth, qvel, qacc_warm, xpos, S, gpos, gquat, ctrl, ref
        )
        return qacc

    vm = lambda f: jax.jit(jax.vmap(f))
    qpos, qvel, ctrl, act = bstate.qpos, bstate.qvel, bstate.ctrl, bstate.act

    full = jax.jit(lambda s: jax.vmap(lambda ss: step(model, ss))(s))
    t_full = timeit(full, (bstate,), iters)

    f_pos = vm(pos_stage)
    args = f_pos(qpos)
    t_fk = timeit(vm(fk_stage), (qpos,), iters)
    t_pos = timeit(f_pos, (qpos,), iters)

    f_vel = vm(vel_stage)
    vel = f_vel(args, qvel)
    t_vel = timeit(f_vel, (args, qvel), iters)

    f_inert = vm(inertia_stage)
    inert = f_inert(args)
    t_inert = timeit(f_inert, (args,), iters)

    f_bias = vm(bias_stage)
    t_bias = timeit(f_bias, (args, vel, inert), iters)

    f_force = vm(force_stage)
    qfrc = f_force(qpos, qvel, ctrl, act)
    t_force = timeit(f_force, (qpos, qvel, ctrl, act), iters)

    f_con = vm(contact_stage)
    t_con = timeit(
        f_con, (args, inert, qfrc, qvel, bstate.qacc, ctrl), iters
    )

    rows = [
        ("full step", t_full),
        ("position stage (FK+S+geoms)", t_pos),
        ("  FK only", t_fk),
        ("velocity pass", t_vel),
        ("inertias + CRBA", t_inert),
        ("RNEA bias", t_bias),
        ("passive+actuator forces", t_force),
        ("contact solve (incl. LDL+Newton)", t_con),
    ]
    print(f"batch={B} backend={jax.default_backend()}")
    for name, t in rows:
        print(f"{name:36s} {t*1e3:8.3f} ms  {B/t:12,.0f} w/s")


if __name__ == "__main__":
    main()
