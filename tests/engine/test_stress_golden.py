"""Stress-regime golden tests vs MuJoCo: the solver parity envelope.

The walking/settling/spinning regimes are covered by test_golden_mujoco.py.
These tests pin down where agreement ends under violent transients — high
drops, high-speed impacts, lateral shoves — and exercise the strict-parity
solver mode (``solver_exact`` + more iterations, the analog of MuJoCo's
Newton/100 in ``mujoco_globals.yaml``), quantifying the divergence envelope
the default fast solver accepts.

Exported MJCF pins MuJoCo at Newton/100 (spec.to_mjcf_xml), so every
comparison here is against full-accuracy MuJoCo.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.golden

import jax

mujoco = pytest.importorskip("mujoco")

from flygym_tpu.compose.spec import (
    BodySpec,
    GeomSpec,
    JointSpec,
    ModelSpec,
    PairSpec,
)
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.engine.step import step


def _capsule_spec(drop_z=2.0, exact=False, iterations=2):
    spec = ModelSpec("stress_world")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    body = BodySpec(name="ball", parent=None)
    body.add_joint(JointSpec(name="ballfree", type="free"))
    body.add_geom(
        GeomSpec(name="ballgeom", type="capsule", size=(0.5, 0.3), mass=1e-3)
    )
    spec.add_body(body)
    spec.pairs.append(
        PairSpec(
            geom1="ballgeom",
            geom2="ground",
            friction=(1.0, 1.0, 0.02, 1e-4, 1e-4),
            solref=(2e-4, 1.0),
            solimp=(0.98, 0.99, 1e-5, 0.5, 3.0),
            margin=1e-3,
        )
    )
    spec.neutral_joint_qpos["ballfree"] = [0, 0, drop_z, 1, 0, 0, 0]
    spec.options["solver_exact"] = exact
    spec.options["solver_iterations"] = iterations
    return spec


def _run_both(spec, n_steps, qvel0=None):
    """Step the TPU engine and MuJoCo side by side; returns (qpos_me, qpos_mj)
    trajectories of shape (n_steps, nq)."""
    compiled = spec.compile()
    state = make_initial_state(compiled.model)
    if qvel0 is not None:
        import dataclasses

        state = dataclasses.replace(
            state, qvel=state.qvel.at[: len(qvel0)].set(np.asarray(qvel0))
        )
    jstep = jax.jit(step)

    m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    if qvel0 is not None:
        d.qvel[: len(qvel0)] = qvel0

    qs_me, qs_mj = [], []
    for _ in range(n_steps):
        state = jstep(compiled.model, state)
        mujoco.mj_step(m, d)
        qs_me.append(np.asarray(state.qpos))
        qs_mj.append(d.qpos.copy())
    return np.array(qs_me), np.array(qs_mj)


class TestHighDrop:
    """Drop from 10x the usual height (20 mm, impact at ~600 mm/s)."""

    def test_rest_height_and_envelope(self):
        spec = _capsule_spec(drop_z=20.0, exact=True, iterations=10)
        qs_me, qs_mj = _run_both(spec, 2500)
        z_me, z_mj = qs_me[:, 2], qs_mj[:, 2]
        # Free fall (first ~60 ms) matches tightly.
        assert np.abs(z_me[:600] - z_mj[:600]).max() < 1e-3
        # Impact transient (bounces): envelope within 0.5 mm of MuJoCo.
        assert np.abs(z_me[600:] - z_mj[600:]).max() < 0.5
        # Both settle to the same rest height.
        assert abs(z_me[-1] - z_mj[-1]) < 2e-3
        assert abs(z_me[-1] - 0.801) < 5e-3

    def test_exact_mode_at_least_as_close_as_fast(self):
        """The strict solver must not be further from MuJoCo than the
        default frozen-Hessian solver through the bounce transient."""
        err = {}
        for exact, iters in ((False, 2), (True, 10)):
            qs_me, qs_mj = _run_both(
                _capsule_spec(drop_z=20.0, exact=exact, iterations=iters), 2000
            )
            err[exact] = np.abs(qs_me[:, 2] - qs_mj[:, 2]).max()
        assert err[True] <= err[False] + 1e-6, err


class TestHighSpeedImpact:
    """Downward launch at 500 mm/s from just above the ground."""

    def test_impact_velocity_trajectory(self):
        spec = _capsule_spec(drop_z=1.5, exact=True, iterations=10)
        qs_me, qs_mj = _run_both(spec, 1500, qvel0=[0, 0, -500.0, 0, 0, 0])
        z_me, z_mj = qs_me[:, 2], qs_mj[:, 2]
        # No tunneling through the ground in either engine.
        assert z_me.min() > 0.5
        # Transient envelope within 0.5 mm; same rest height.
        assert np.abs(z_me - z_mj).max() < 0.5
        assert abs(z_me[-1] - z_mj[-1]) < 2e-3


class TestLateralShove:
    """Horizontal kick of a standing capsule at 200 mm/s: it slides, tips
    over, and rocks — an active-set storm (slide → tip → rock transitions
    every few steps). The strict solver must track MuJoCo's trajectory
    through the whole sequence (measured max |dx| = 0.0045 mm)."""

    def test_shove_trajectory_matches(self):
        spec = _capsule_spec(drop_z=0.801, exact=True, iterations=10)
        # Settle 300 steps first, then shove sideways at 200 mm/s.
        compiled = spec.compile()
        state = make_initial_state(compiled.model)
        jstep = jax.jit(step)
        m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)
        for _ in range(300):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
        import dataclasses

        state = dataclasses.replace(
            state, qvel=state.qvel.at[0].set(200.0)
        )
        d.qvel[0] = 200.0
        err_x, err_z = [], []
        for _ in range(1500):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
            err_x.append(abs(float(state.qpos[0]) - d.qpos[0]))
            err_z.append(abs(float(state.qpos[2]) - d.qpos[2]))
        # The capsule travels ~6 mm, tips over (z 0.8 → 0.5), and rocks;
        # the whole trajectory stays within 50 µm of MuJoCo's.
        assert max(err_x) < 0.05, max(err_x)
        assert max(err_z) < 0.05, max(err_z)


class TestFlyHighDrop:
    """Full fly dropped from 12 mm (impact ~480 mm/s on 66 passive joints):
    the regime where warm-started fixed-iteration solvers usually diverge
    from MuJoCo. Measured envelope: max |dz_root| = 76 µm fast solver /
    53 µm strict solver over the full 0.25 s bounce-and-settle."""

    @pytest.mark.parametrize(
        "exact,iters,envelope", [(False, 2, 0.15), (True, 10, 0.10)]
    )
    def test_drop_envelope(self, exact, iters, envelope):
        from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
        from flygym_tpu.compose import (
            Fly,
            FlatGroundWorld,
            KinematicPosePreset,
        )
        from flygym_tpu.utils.math import Rotation3D

        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        world = FlatGroundWorld()
        world.add_fly(fly, (0, 0, 12.0), Rotation3D("quat", (1, 0, 0, 0)))
        world.spec.options["solver_exact"] = exact
        world.spec.options["solver_iterations"] = iters
        model, state = world.compile()
        jstep = jax.jit(step)
        m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)
        errs = []
        for _ in range(2500):
            state = jstep(model, state)
            mujoco.mj_step(m, d)
            errs.append(abs(float(state.qpos[2]) - d.qpos[2]))
        assert max(errs) < envelope, max(errs)
        assert errs[-1] < 0.02, errs[-1]  # same rest height


class TestSolverExactKernel:
    """The strict exact-Newton solver runs IN-kernel (ops/megastep.py
    emits the per-iteration refactor when ``model.solver_exact``): both
    solver modes must be kernel-eligible, and the strict mode must track
    MuJoCo when stepped THROUGH the kernel emitter — the exact per-world
    computation the Pallas mega-kernel lowers (same check as
    tests/engine/test_megastep.py's emitter==engine suite, but pinned
    against real MuJoCo rather than the repo's own engine)."""

    def test_exact_mode_kernel_eligible(self):
        from flygym_tpu.ops.megastep import megastep_supported

        assert megastep_supported(_capsule_spec(exact=True).compile().model)
        assert megastep_supported(_capsule_spec(exact=False).compile().model)

    def test_exact_mode_emitter_golden_vs_mujoco(self):
        """Capsule drop-and-settle in strict mode, stepped eagerly through
        ``ms.emit_step`` side by side with MuJoCo at Newton/100.

        Eager (op-by-op) execution of the emitter is the documented way to
        validate kernel physics off-TPU — jitting the emitter graph on CPU
        compiles for minutes. ~0.25 s/step eager; 400 steps ≈ 2 min."""
        import flygym_tpu.ops.megastep as ms

        spec = _capsule_spec(drop_z=0.9, exact=True, iterations=10)
        model = spec.compile().model
        state = make_initial_state(model)
        st = ms._Static(model)

        m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)

        import jax.numpy as jnp

        qpos = jnp.asarray(state.qpos)
        qvel = jnp.asarray(state.qvel)
        ctrl = jnp.asarray(state.ctrl)
        act = jnp.asarray(state.act)
        qacc = jnp.asarray(state.qacc)
        cols = lambda x: [x[i] for i in range(x.shape[0])]
        errs = []
        for _ in range(400):
            r = ms.emit_step(
                st, cols(qpos), cols(qvel), cols(ctrl), cols(act), cols(qacc)
            )
            qpos = jnp.stack(r["qpos"])
            qvel = jnp.stack(r["qvel"])
            qacc = jnp.stack(r["qacc"])
            mujoco.mj_step(m, d)
            errs.append(abs(float(qpos[2]) - d.qpos[2]))
        # Strict-mode envelope through impact (~44 mm/s) and settle.
        assert max(errs) < 5e-3, max(errs)
        assert errs[-1] < 1e-3, errs[-1]
        # Rest height: radius + halflength (z-aligned capsule) ~ 0.801.
        assert abs(float(qpos[2]) - 0.801) < 5e-3
