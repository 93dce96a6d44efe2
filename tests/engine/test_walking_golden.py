"""The north-star acceptance gate: golden walking replay vs MuJoCo.

Side-by-side kinematic replay of the Spotlight clip (position actuators +
leg adhesion on flat ground — the reference's benchmark workload,
``flygym_demo/benchmark/time_gpu_simulation.py:108-156``) stepped for 10,000
steps (a FULL 1 s of walking) in the TPU engine and in MuJoCo compiled from
the same exported MJCF. Pins, in BOTH the default and strict (exact-Newton)
solver modes:

  (a) COM-trajectory divergence (mm bound over the full 1 s),
  (b) per-leg stance/swing classification agreement + duty-factor match,
  (c) joint-angle tracking error.

Measured 1 s envelopes (CPU backend, this box, 2026-08-19;
scripts/dev/measure_walking_golden.py --steps 10000):
default — COM err max 1.44 mm (0.28 at T/4), joint err max 0.083 rad
(mean 0.0068), stance agreement/leg >= 0.768 (mean 0.847), duty diff
<= 0.093, distance 6.05 vs 7.32 mm; strict — COM max 1.09 mm (0.22 at
T/4), joint max 0.027 rad (mean 0.0041), agreement/leg >= 0.796 (mean
0.875), duty diff <= 0.056, distance 7.21 vs 7.32 mm. Bounds below carry
~1.5x headroom. Cross-check pattern follows the reference's
batched-vs-single strategy (flygym ``tests/warp/test_simulation.py:239-251``).
"""

import dataclasses
from functools import lru_cache

import numpy as np
import pytest

pytestmark = pytest.mark.golden

import jax

mujoco = pytest.importorskip("mujoco")

from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo import ReplayTargetData, make_model
from flygym_tpu.engine.step import step as engine_step

N_STEPS = 10000
SETTLE_STEPS = 300
FN_THRESH = 0.5  # normal-force threshold (model force units) for stance


def _mj_subtree_bodies(m, root_bid):
    out = set()
    for b in range(m.nbody):
        x = b
        while x != 0:
            if x == root_bid:
                out.add(b)
                break
            x = m.body_parentid[x]
    return out


@lru_cache(maxsize=2)
def _run_replay(strict: bool):
    fly, world, _cam = make_model(spawn_position=(0, 0, 1.2))
    if strict:
        world.spec.options["solver_exact"] = True
        world.spec.options["solver_iterations"] = 10
    model, state = world.compile()
    c = world.compiled

    m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)

    pos_specs = fly.jointdof_to_specactuator_by_type[ActuatorType.POSITION]
    pos_names = [a.full_identifier for a in pos_specs.values()]
    act_me = np.array([c.actuator_name2id[n] for n in pos_names], np.int32)
    act_mj = np.array(
        [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, n) for n in pos_names]
    )
    assert (act_mj >= 0).all()
    adh_names = [
        fly.leg_to_adhesionactuator[leg].full_identifier
        for leg in fly.get_legs_order()
    ]
    adh_me = np.array([c.actuator_name2id[n] for n in adh_names], np.int32)
    adh_mj = np.array(
        [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, n) for n in adh_names]
    )

    hinge_names = list(c.hinge_name2id)
    hq_me = np.array([c.hinge_qadr[n] for n in hinge_names])
    hq_mj = np.array(
        [
            m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)]
            for n in hinge_names
        ]
    )

    sensors = world.spec.contact_sensors
    slot_of = {s.full_identifier: i for i, s in enumerate(sensors)}
    leg_sensors = world.legpos_to_groundcontactsensors_by_fly[fly.name]
    legs = fly.get_legs_order()
    slots = np.array(
        [slot_of[leg_sensors[leg].full_identifier] for leg in legs], np.int32
    )
    mj_leg_bodies = []
    for leg in legs:
        bid = mujoco.mj_name2id(
            m, mujoco.mjtObj.mjOBJ_BODY, leg_sensors[leg].subtree_body
        )
        assert bid >= 0
        mj_leg_bodies.append(_mj_subtree_bodies(m, bid))

    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    replay = ReplayTargetData(1e-4, dof_order)
    targets = np.asarray(replay.dof_angles[:N_STEPS], np.float32)

    jstep = jax.jit(engine_step)

    ctrl0 = np.asarray(state.ctrl).copy()
    ctrl0[adh_me] = 1.0
    state = dataclasses.replace(state, ctrl=jax.numpy.asarray(ctrl0))
    d.ctrl[adh_mj] = 1.0
    for _ in range(SETTLE_STEPS):
        state = jstep(model, state)
        mujoco.mj_step(m, d)

    com_me, com_mj, q_me, q_mj, st_me, st_mj = [], [], [], [], [], []
    cf = np.zeros(6)
    for t in range(N_STEPS):
        ctrl = np.asarray(state.ctrl).copy()
        ctrl[act_me] = targets[t]
        state = dataclasses.replace(state, ctrl=jax.numpy.asarray(ctrl))
        d.ctrl[act_mj] = targets[t]
        state = jstep(model, state)
        mujoco.mj_step(m, d)

        com_me.append(np.asarray(state.qpos[:3]))
        com_mj.append(d.qpos[:3].copy())
        q_me.append(np.asarray(state.qpos)[hq_me])
        q_mj.append(d.qpos[hq_mj].copy())
        sd = np.asarray(state.contact_sensordata)
        st_me.append(sd[slots, 1] > FN_THRESH)
        fn = np.zeros(6)
        for ci in range(d.ncon):
            b1 = m.geom_bodyid[d.contact[ci].geom1]
            b2 = m.geom_bodyid[d.contact[ci].geom2]
            mujoco.mj_contactForce(m, d, ci, cf)
            for li, bodies in enumerate(mj_leg_bodies):
                if b1 in bodies or b2 in bodies:
                    fn[li] += abs(cf[0])
        st_mj.append(fn > FN_THRESH)

    return dict(
        com_me=np.array(com_me),
        com_mj=np.array(com_mj),
        q_me=np.array(q_me),
        q_mj=np.array(q_mj),
        st_me=np.array(st_me),
        st_mj=np.array(st_mj),
    )


@pytest.mark.parametrize("strict", [False, True], ids=["default", "strict"])
class TestWalkingGolden:
    def test_com_trajectory_matches_mujoco(self, strict):
        r = _run_replay(strict)
        com_err = np.linalg.norm(r["com_me"] - r["com_mj"], axis=1)
        # (a) COM divergence bounded over the whole 1 s replay.
        assert com_err.max() < (1.7 if strict else 2.2), com_err.max()
        # Early divergence is much tighter (error accumulates with contact
        # chaos; the first quarter-second must track closely).
        assert com_err[: N_STEPS // 4].max() < 0.6
        # Both engines actually locomote, by a comparable distance.
        dist_me = np.linalg.norm(r["com_me"][-1] - r["com_me"][0])
        dist_mj = np.linalg.norm(r["com_mj"][-1] - r["com_mj"][0])
        assert dist_mj > 2.0  # MuJoCo walked (sanity: the workload is real)
        assert 0.6 * dist_mj < dist_me < 1.4 * dist_mj, (dist_me, dist_mj)
        # Standing height agreement at the end of the clip.
        assert abs(r["com_me"][-1, 2] - r["com_mj"][-1, 2]) < 0.12

    def test_stance_swing_timing_matches_mujoco(self, strict):
        r = _run_replay(strict)
        agree = (r["st_me"] == r["st_mj"]).mean(axis=0)
        # (b) per-leg stance/swing classification agreement over 1 s
        # (measured floor: 0.768 default / 0.796 strict — the hind-right
        # leg's high duty factor makes its threshold crossings the
        # noisiest); the MEAN across legs is well above 0.8 in both modes.
        assert np.all(agree > (0.75 if strict else 0.72)), agree
        assert agree.mean() > 0.82, agree
        duty_me = r["st_me"].mean(axis=0)
        duty_mj = r["st_mj"].mean(axis=0)
        assert np.all(
            np.abs(duty_me - duty_mj) < (0.10 if strict else 0.14)
        ), (duty_me, duty_mj)
        # The gait is a real mixed stance/swing cycle in both engines, not
        # an always-down or always-up degenerate match.
        assert np.all(duty_mj > 0.2) and np.all(duty_mj < 0.98)
        assert np.all(duty_me > 0.2) and np.all(duty_me < 0.98)

    def test_joint_angles_track_mujoco(self, strict):
        r = _run_replay(strict)
        qerr = np.abs(r["q_me"] - r["q_mj"])
        # (c) joint-angle tracking error across all 66 leg DoFs over 1 s.
        assert qerr.max() < (0.06 if strict else 0.15), qerr.max()
        assert qerr.mean() < (0.008 if strict else 0.013), qerr.mean()
