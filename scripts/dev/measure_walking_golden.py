"""Measure the TPU-engine-vs-MuJoCo envelope for the walking replay workload.

Side-by-side kinematic replay of the Spotlight clip (position actuators +
adhesion, flat ground — the reference's benchmark workload,
``flygym_demo/benchmark/time_gpu_simulation.py:108-156``) in the TPU engine
and in MuJoCo compiled from the same exported MJCF. Prints the divergence
metrics the walking golden test pins:

  * COM trajectory divergence over the episode
  * per-leg stance/swing classification agreement + transition timing
  * joint-angle tracking error (replay target vs realized, both engines)

Run on the CPU backend::

    JAX_PLATFORMS=cpu python scripts/dev/measure_walking_golden.py [--strict]
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import mujoco

from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import ReplayTargetData, make_model
from flygym_tpu.engine.step import step as engine_step


def mj_subtree_bodies(m, root_bid):
    """All body ids whose ancestor chain includes root_bid."""
    out = set()
    for b in range(m.nbody):
        x = b
        while x != 0:
            if x == root_bid:
                out.add(b)
                break
            x = m.body_parentid[x]
    return out


def run(n_steps=2000, settle_steps=300, strict=False):
    fly, world, _cam = make_model(spawn_position=(0, 0, 1.2))
    if strict:
        world.spec.options["solver_exact"] = True
        world.spec.options["solver_iterations"] = 10
    model, state = world.compile()
    c = world.compiled

    m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)

    # --- id maps (ours and MuJoCo's, via the shared full identifiers) ---
    pos_specs = fly.jointdof_to_specactuator_by_type[ActuatorType.POSITION]
    pos_names = [a.full_identifier for a in pos_specs.values()]
    act_me = np.array([c.actuator_name2id[n] for n in pos_names], np.int32)
    act_mj = np.array(
        [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, n) for n in pos_names],
        np.int32,
    )
    assert (act_mj >= 0).all()

    adh_names = [
        fly.leg_to_adhesionactuator[leg].full_identifier
        for leg in fly.get_legs_order()
    ]
    adh_me = np.array([c.actuator_name2id[n] for n in adh_names], np.int32)
    adh_mj = np.array(
        [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, n) for n in adh_names],
        np.int32,
    )

    hinge_names = list(c.hinge_name2id)
    hq_me = np.array([c.hinge_qadr[n] for n in hinge_names])
    hq_mj = np.array(
        [
            m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)]
            for n in hinge_names
        ]
    )

    # Per-leg contact subtrees: sensor order == legs order (six sensors).
    sensors = world.spec.contact_sensors
    slot_of = {s.full_identifier: i for i, s in enumerate(sensors)}
    leg_sensors = world.legpos_to_groundcontactsensors_by_fly[fly.name]
    legs = fly.get_legs_order()
    slots = np.array(
        [slot_of[leg_sensors[leg].full_identifier] for leg in legs], np.int32
    )
    mj_leg_bodies = []
    for leg in legs:
        root_name = leg_sensors[leg].subtree_body
        bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, root_name)
        assert bid >= 0, root_name
        mj_leg_bodies.append(mj_subtree_bodies(m, bid))

    # --- replay targets ---
    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    replay = ReplayTargetData(1e-4, dof_order)
    targets = np.asarray(replay.dof_angles[: n_steps], np.float32)

    jstep = jax.jit(engine_step)

    # Adhesion on (ctrl low-end = 1, gain*1 pull per leg) on both engines.
    ctrl0 = np.asarray(state.ctrl).copy()
    ctrl0[adh_me] = 1.0
    state = dataclasses.replace(state, ctrl=jax.numpy.asarray(ctrl0))
    d.ctrl[adh_mj] = 1.0

    for _ in range(settle_steps):
        state = jstep(model, state)
        mujoco.mj_step(m, d)

    com_me, com_mj = [], []
    q_me_hist, q_mj_hist = [], []
    stance_me, stance_mj = [], []
    fn_thresh = 0.5  # uN normal-force threshold for "in stance"
    cf = np.zeros(6)
    for t in range(n_steps):
        ctrl = np.asarray(state.ctrl).copy()
        ctrl[act_me] = targets[t]
        state = dataclasses.replace(state, ctrl=jax.numpy.asarray(ctrl))
        d.ctrl[act_mj] = targets[t]
        state = jstep(model, state)
        mujoco.mj_step(m, d)

        com_me.append(np.asarray(state.qpos[:3]))
        com_mj.append(d.qpos[:3].copy())
        q_me_hist.append(np.asarray(state.qpos)[hq_me])
        q_mj_hist.append(d.qpos[hq_mj].copy())

        sd = np.asarray(state.contact_sensordata)  # (nsensor, 16)
        stance_me.append(sd[slots, 1] > fn_thresh)
        # MuJoCo: sum contact normal force per leg subtree.
        fn = np.zeros(6)
        for ci in range(d.ncon):
            con = d.contact[ci]
            b1 = m.geom_bodyid[con.geom1]
            b2 = m.geom_bodyid[con.geom2]
            mujoco.mj_contactForce(m, d, ci, cf)
            for li, bodies in enumerate(mj_leg_bodies):
                if b1 in bodies or b2 in bodies:
                    fn[li] += abs(cf[0])
        stance_mj.append(fn > fn_thresh)

    com_me = np.array(com_me)
    com_mj = np.array(com_mj)
    q_me_hist = np.array(q_me_hist)
    q_mj_hist = np.array(q_mj_hist)
    stance_me = np.array(stance_me)
    stance_mj = np.array(stance_mj)

    com_err = np.linalg.norm(com_me - com_mj, axis=1)
    dist_mj = np.linalg.norm(com_mj[-1] - com_mj[0])
    dist_me = np.linalg.norm(com_me[-1] - com_me[0])
    qerr = np.abs(q_me_hist - q_mj_hist)
    agree = (stance_me == stance_mj).mean(axis=0)
    duty_me = stance_me.mean(axis=0)
    duty_mj = stance_mj.mean(axis=0)

    print(f"mode={'strict' if strict else 'default'} steps={n_steps}")
    print(f"COM err (mm): max={com_err.max():.4f} final={com_err[-1]:.4f} "
          f"p50={np.median(com_err):.4f}")
    for frac in (0.25, 0.5, 0.75, 1.0):
        i = int(len(com_err) * frac) - 1
        print(f"  COM err at {frac:.2f}T: {com_err[i]:.4f} mm")
    print(f"distance walked: me={dist_me:.3f} mj={dist_mj:.3f} mm")
    print(f"height: me={com_me[-1,2]:.3f} mj={com_mj[-1,2]:.3f} mm")
    print(f"joint-angle err (rad): max={qerr.max():.4f} mean={qerr.mean():.5f} "
          f"final-max={qerr[-1].max():.4f}")
    print("stance agreement per leg:", np.array2string(agree, precision=3))
    print("duty  me:", np.array2string(duty_me, precision=3))
    print("duty  mj:", np.array2string(duty_mj, precision=3))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--strict", action="store_true")
    args = p.parse_args()
    run(n_steps=args.steps, strict=args.strict)
