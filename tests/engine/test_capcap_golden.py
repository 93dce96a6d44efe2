"""Capsule-capsule (fly-fly) contact goldens vs MuJoCo (VERDICT r3 #3).

Every other contact regime has a MuJoCo golden; these pin the
capsule-capsule collider and the two-body signed-Jacobian rows — the
mechanism under multi-fly worlds (reference: explicit-pair multi-fly
attach ``/root/reference/src/flygym/compose/world.py:95-149`` with
MuJoCo's capsule-capsule collider underneath; golden strategy template
``/root/reference/tests/warp/test_simulation.py:239-251``).

Scenarios (all exported via ``spec.to_mjcf_xml()`` and stepped side by
side with MuJoCo at Newton/100):

1. Centered crossed-capsule drop (strict): B balances on A's crown — a
   single-point frictional balance. Measured parity: max|dqpos| = 3.2e-7
   over 2,500 steps. (The default fast solver does NOT hold this
   marginally stable balance — B tips off while MuJoCo balances — so the
   centered balance is a strict-mode-only golden; the fast solver's
   fidelity on capsule-capsule impacts is pinned by the slide-off and
   two-fly scenarios below.)
2. Off-center drop → slide-off (both modes): the transient is chaotic
   (unstable contact), so the golden pins bounded transient divergence
   plus exact rest-state agreement.
3. Compressed pair group (strict, ``pair_compress=True`` forced): one
   geom1 vs two geom2 members — the nearest-member winner selection vs
   MuJoCo solving ALL pairs. Parity holds because only one member is
   ever near contact (the compression contract). Measured max|dqpos| =
   5.8e-4 over 2,500 steps. Run through BOTH the jnp path and the
   kernel emitter (eager, per-step winner resampling) — the
   winner-blended geom2 row the Pallas mega-kernel executes.
4. Two full flies, one dropped onto the other (both modes, exact pair
   semantics ``pair_compress=False``): COM envelopes through a 0.2 s
   impact-and-settle; the top fly must end supported by fly-fly contacts
   in both engines.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.golden

import jax
import jax.numpy as jnp

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

_PP = dict(
    friction=(1.0, 1.0, 0.02, 1e-4, 1e-4),
    solref=(2e-4, 1.0),
    solimp=(0.98, 0.99, 1e-5, 0.5, 3.0),
    margin=1e-3,
)
_QX = (float(np.cos(np.pi / 4)), 0.0, float(np.sin(np.pi / 4)), 0.0)
_QY = (float(np.cos(np.pi / 4)), float(np.sin(np.pi / 4)), 0.0, 0.0)


def _capcap_spec(bx, by, exact, iterations):
    """Capsule A along x resting on the ground; capsule B along y dropped
    from 0.15 above contact (crossed, so the collider sees a single
    closest point, never MuJoCo's parallel-capsule two-contact case)."""
    spec = ModelSpec("capcap")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    a = BodySpec(name="a", parent=None)
    a.add_joint(JointSpec(name="afree", type="free"))
    a.add_geom(
        GeomSpec(name="acap", type="capsule", size=(0.5, 0.8), quat=_QX, mass=1e-3)
    )
    spec.add_body(a)
    b = BodySpec(name="b", parent=None)
    b.add_joint(JointSpec(name="bfree", type="free"))
    b.add_geom(
        GeomSpec(name="bcap", type="capsule", size=(0.4, 0.6), quat=_QY, mass=1e-3)
    )
    spec.add_body(b)
    spec.pairs.append(PairSpec(geom1="acap", geom2="ground", **_PP))
    spec.pairs.append(PairSpec(geom1="bcap", geom2="ground", **_PP))
    spec.pairs.append(PairSpec(geom1="bcap", geom2="acap", **_PP))
    spec.neutral_joint_qpos["afree"] = [0, 0, 0.5, 1, 0, 0, 0]
    spec.neutral_joint_qpos["bfree"] = [bx, by, 1.55, 1, 0, 0, 0]
    spec.options["solver_exact"] = exact
    spec.options["solver_iterations"] = iterations
    return spec


def _run_both(spec, n_steps):
    model = spec.compile().model
    state = make_initial_state(model)
    jstep = jax.jit(step)
    m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    qs_me, qs_mj = [], []
    for _ in range(n_steps):
        state = jstep(model, state)
        mujoco.mj_step(m, d)
        qs_me.append(np.asarray(state.qpos))
        qs_mj.append(d.qpos.copy())
    return np.array(qs_me), np.array(qs_mj)


class TestCapsuleCapsuleBalance:
    def test_strict_centered_drop_matches_mujoco(self):
        """B dropped dead-center onto crossed A: single-point frictional
        balance. Strict mode tracks MuJoCo through impact, bounce, and
        balance to sub-µm (measured 3.2e-7 over the full 0.25 s)."""
        qs_me, qs_mj = _run_both(_capcap_spec(0.0, 0.0, True, 10), 2500)
        err = np.abs(qs_me - qs_mj).max()
        assert err < 1e-4, err
        # B actually balances on top of A in both engines (z = A rest
        # height 0.501 + radii 0.5 + 0.4 ≈ 1.402), not on the ground.
        assert abs(qs_me[-1, 9] - 1.402) < 5e-3, qs_me[-1, 9]
        assert abs(qs_mj[-1, 9] - 1.402) < 5e-3, qs_mj[-1, 9]


class TestCapsuleCapsuleSlideOff:
    @pytest.mark.parametrize(
        "exact,iters,envelope",
        [(False, 2, 0.5), (True, 10, 0.25)],
        ids=["default", "strict"],
    )
    def test_offcenter_drop_rest_state_matches(self, exact, iters, envelope):
        """B dropped off-center tips off A and lands on the ground. The
        slide-off transient is chaotic (unstable single-point contact), so
        the golden pins a bounded transient plus exact rest agreement:
        A undisturbed at 0.501, B on the ground at 0.401, in BOTH engines.
        Measured max|dz|: 0.13 strict / ~0.27 fast."""
        qs_me, qs_mj = _run_both(_capcap_spec(0.1, 0.05, exact, iters), 2500)
        dz = np.abs(qs_me[:, [2, 9]] - qs_mj[:, [2, 9]]).max()
        assert dz < envelope, dz
        # Rest-state parity (same heights, A never kicked away).
        assert abs(qs_me[-1, 2] - 0.501) < 2e-3
        assert abs(qs_mj[-1, 2] - 0.501) < 2e-3
        assert abs(qs_me[-1, 9] - 0.401) < 2e-3, qs_me[-1, 9]
        assert abs(qs_mj[-1, 9] - 0.401) < 2e-3, qs_mj[-1, 9]
        assert np.abs(qs_me[-1, :2]).max() < 2.0  # A stays near origin


def _compressed_spec(exact=True, iterations=10):
    """One geom1 capsule vs TWO geom2 capsules on the same body — a
    compressed pair group of size 2 (pair_compress forced on). B lands on
    member acap1 while acap2 stays 3 mm away: exactly the regime the
    nearest-member compression contract promises parity in."""
    spec = ModelSpec("compgroup")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    a = BodySpec(name="a", parent=None)
    a.add_joint(JointSpec(name="afree", type="free"))
    a.add_geom(
        GeomSpec(
            name="acap1", type="capsule", size=(0.5, 0.8), pos=(0, 0, 0),
            quat=_QX, mass=5e-4,
        )
    )
    a.add_geom(
        GeomSpec(
            name="acap2", type="capsule", size=(0.5, 0.8), pos=(0, 3.0, 0),
            quat=_QX, mass=5e-4,
        )
    )
    spec.add_body(a)
    b = BodySpec(name="b", parent=None)
    b.add_joint(JointSpec(name="bfree", type="free"))
    b.add_geom(
        GeomSpec(name="bcap", type="capsule", size=(0.4, 0.3), quat=_QY, mass=1e-3)
    )
    spec.add_body(b)
    spec.pairs.append(PairSpec(geom1="acap1", geom2="ground", **_PP))
    spec.pairs.append(PairSpec(geom1="acap2", geom2="ground", **_PP))
    spec.pairs.append(PairSpec(geom1="bcap", geom2="ground", **_PP))
    spec.pairs.append(PairSpec(geom1="bcap", geom2="acap1", **_PP))
    spec.pairs.append(PairSpec(geom1="bcap", geom2="acap2", **_PP))
    spec.neutral_joint_qpos["afree"] = [0, 0, 0.5, 1, 0, 0, 0]
    spec.neutral_joint_qpos["bfree"] = [0, 0, 1.55, 1, 0, 0, 0]
    spec.options["solver_exact"] = exact
    spec.options["solver_iterations"] = iterations
    spec.options["pair_compress"] = True
    return spec


class TestCompressedPairGolden:
    def test_jnp_winner_selection_matches_mujoco(self):
        """jnp path with a compressed group of 2 vs MuJoCo solving all
        pairs: sub-mm over the full impact-and-balance (measured 5.8e-4)."""
        spec = _compressed_spec()
        model = spec.compile().model
        assert model.pair_compress and model.pair_groups == ((0, 2),)
        qs_me, qs_mj = _run_both(spec, 2500)
        err = np.abs(qs_me - qs_mj).max()
        assert err < 2e-3, err
        assert abs(qs_me[-1, 9] - 1.402) < 5e-3  # B balanced on acap1

    def test_pinned_winner_engine_matches_emitter(self):
        """step(model, s, widx=w) vs ms.emit_step fed the SAME winners.

        The hardware fidelity check (validate_twofly_kernel.py) compares
        the mega-kernel against the pinned-winner ENGINE step, because
        jitting the eager emitter SIGSEGVs the remote TPU compile helper
        (~1e5-op graph, measured 2026-08-20). This is the CPU guard for
        that substitution: with winners pinned to the same indices, engine
        and emitter must agree to fp noise — so kernel==emitter (the test
        below) plus emitter==pinned-engine (this test) gives the full
        chain kernel==pinned-engine that the hardware check relies on.
        """
        import flygym_tpu.ops.megastep as ms
        from flygym_tpu.engine.contact import make_pair_winner_sampler

        spec = _compressed_spec(exact=False)
        model = spec.compile().model
        state = make_initial_state(model)
        st = ms._Static(model)
        sampler = make_pair_winner_sampler(model)

        # Settle a few hundred steps so contacts are active, then compare
        # one step with winners pinned BOTH ways (each group member) —
        # the pinned path must track the emitter whichever winner is fed.
        s = state
        for _ in range(220):
            s = step(model, s)
        cols = lambda x: [x[i] for i in range(x.shape[0])]
        for forced in (None, 0, 1):
            if forced is None:
                w = sampler(s.xpos[None], s.xquat[None])[0]
            else:
                w = jnp.full((1,), forced, jnp.int32)
            eng = step(model, s, widx=w)
            r = ms.emit_step(
                st,
                cols(s.qpos),
                cols(s.qvel),
                cols(s.ctrl),
                cols(s.act),
                cols(s.qacc),
                widx=[w[g] for g in range(w.shape[0])],
            )
            d_q = np.abs(np.asarray(jnp.stack(r["qpos"])) - eng.qpos).max()
            d_v = np.abs(np.asarray(jnp.stack(r["qvel"])) - eng.qvel).max()
            assert d_q < 1e-5, (forced, d_q)
            assert d_v < 1e-2, (forced, d_v)

    def test_kernel_winner_blend_matches_mujoco(self):
        """The winner-blended geom2 row the Pallas mega-kernel executes,
        stepped eagerly through ms.emit_step with per-step winner
        resampling, vs MuJoCo — through the impact and onto the balance
        (300 steps ≈ impact at ~55 plus the first bounce)."""
        import flygym_tpu.ops.megastep as ms
        from flygym_tpu.engine.contact import make_pair_winner_sampler

        spec = _compressed_spec()
        model = spec.compile().model
        state = make_initial_state(model)
        st = ms._Static(model)
        sampler = make_pair_winner_sampler(model)
        assert sampler is not None

        m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)

        qpos = jnp.asarray(state.qpos)
        qvel = jnp.asarray(state.qvel)
        ctrl = jnp.asarray(state.ctrl)
        act = jnp.asarray(state.act)
        qacc = jnp.asarray(state.qacc)
        xpos = jnp.asarray(state.xpos)
        xquat = jnp.asarray(state.xquat)
        cols = lambda x: [x[i] for i in range(x.shape[0])]
        errs = []
        for _ in range(300):
            w = sampler(xpos[None], xquat[None])[0]
            r = ms.emit_step(
                st,
                cols(qpos),
                cols(qvel),
                cols(ctrl),
                cols(act),
                cols(qacc),
                widx=[w[g] for g in range(w.shape[0])],
            )
            qpos = jnp.stack(r["qpos"])
            qvel = jnp.stack(r["qvel"])
            qacc = jnp.stack(r["qacc"])
            xpos = jnp.stack([jnp.stack(p) for p in r["xpos"]])
            xquat = jnp.stack([jnp.stack(p) for p in r["xquat"]])
            mujoco.mj_step(m, d)
            errs.append(np.abs(np.asarray(qpos) - d.qpos).max())
        assert max(errs) < 2e-3, max(errs)
        # Impact actually happened inside the horizon.
        assert d.qpos[9] < 1.45


class TestTwoFlyDropGolden:
    """Fly b dropped from 1.8 mm above fly a (3,025 explicit capsule-capsule
    pairs, exact pair semantics): COM envelopes through the 0.2 s
    impact-and-settle. Contact-rich 144-DoF dynamics are chaotic, so the
    envelopes are loose transiently but both engines must agree on the
    outcome: b supported ON a (not fallen through, not bounced off), a
    still grounded. Measured: fast max|dbz| 0.14 / final 0.05; strict
    max|dbz| 0.55 / final 0.27."""

    @staticmethod
    def _run(exact, iters, n_steps=2000):
        from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
        from flygym_tpu.compose import (
            Fly,
            FlatGroundWorld,
            KinematicPosePreset,
        )
        from flygym_tpu.utils.math import Rotation3D

        def mkfly(name):
            fly = Fly(name=name)
            fly.add_joints(
                Skeleton(
                    axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
                ),
                neutral_pose=KinematicPosePreset.NEUTRAL,
            )
            return fly

        world = FlatGroundWorld()
        world.add_fly(mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
        world.add_fly(mkfly("b"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
        assert world.add_fly_fly_contacts("a", "b") == 3025
        world._spec.options["solver_exact"] = exact
        world._spec.options["solver_iterations"] = iters
        world._spec.options["pair_compress"] = False
        model, state = world.compile()
        jstep = jax.jit(step)
        m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)
        nq1 = model.nq // 2
        roots_me, roots_mj = [], []
        for _ in range(n_steps):
            state = jstep(model, state)
            mujoco.mj_step(m, d)
            q = np.asarray(state.qpos)
            roots_me.append(
                [q[0], q[1], q[2], q[nq1], q[nq1 + 1], q[nq1 + 2]]
            )
            roots_mj.append(
                [d.qpos[0], d.qpos[1], d.qpos[2], d.qpos[nq1],
                 d.qpos[nq1 + 1], d.qpos[nq1 + 2]]
            )
        return np.array(roots_me), np.array(roots_mj)

    @pytest.mark.parametrize(
        "exact,iters,env_bz,env_xy,env_final",
        [(False, 2, 0.3, 0.45, 0.15), (True, 10, 0.9, 1.0, 0.45)],
        ids=["default", "strict"],
    )
    def test_drop_envelope(self, exact, iters, env_bz, env_xy, env_final):
        me, mj = self._run(exact, iters)
        # Transient envelopes on both root trajectories.
        assert np.abs(me[:, 2] - mj[:, 2]).max() < env_bz  # fly a z
        assert np.abs(me[:, 5] - mj[:, 5]).max() < env_bz  # fly b z
        assert np.abs(me[:, [0, 1, 3, 4]] - mj[:, [0, 1, 3, 4]]).max() < env_xy
        # Outcome agreement: b supported ON a in both engines.
        assert me[-1, 5] > 1.4 and mj[-1, 5] > 1.4, (me[-1, 5], mj[-1, 5])
        assert abs(me[-1, 5] - mj[-1, 5]) < env_final
        # Fly a still grounded at a normal standing height in both.
        assert 0.6 < me[-1, 2] < 1.0 and 0.6 < mj[-1, 2] < 1.0


class TestStackedRingGolden:
    """The settled two-fly stack sustains a contact RING in BOTH engines.

    Round-5 finding (2026-08-20): a fly resting on another never becomes
    quiescent under stiff solref contacts — it sustains a mm/s-scale
    oscillation. Measured over a 4000-step settle of the 49-pair config:
    MuJoCo max|qvel| = 1.86 mm/s, this engine = 1.44 mm/s. The ring is
    REFERENCE behavior (the same marginal stability, same magnitude
    class), not a solver deficiency here — and it is why one-step
    kernel-vs-engine comparisons at this state must be gated on the
    state's conditioning (Lipschitz ~4e4 in qvel; see
    tests/tpu/test_megastep_tpu.py and ROADMAP).
    Reference chain: flygym ``simulation.py:76`` -> ``mj_step``.
    """

    @pytest.mark.slow
    def test_both_engines_sustain_same_order_ring(self):
        from flygym_tpu.anatomy import (
            ALL_SEGMENT_NAMES,
            AxisOrder,
            BodySegment,
            JointPreset,
            Skeleton,
        )
        from flygym_tpu.compose import (
            Fly,
            FlatGroundWorld,
            KinematicPosePreset,
        )
        from flygym_tpu.utils.math import Rotation3D

        def mkfly(name):
            fly = Fly(name=name)
            fly.add_joints(
                Skeleton(
                    axis_order=AxisOrder.YPR,
                    joint_preset=JointPreset.LEGS_ONLY,
                ),
                neutral_pose=KinematicPosePreset.NEUTRAL,
            )
            return fly

        world = FlatGroundWorld()
        world.add_fly(
            mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0))
        )
        world.add_fly(
            mkfly("b"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0))
        )
        segs = ["c_thorax"] + [
            n for n in ALL_SEGMENT_NAMES if n.endswith("tarsus5")
        ]
        world.add_fly_fly_contacts(
            "a", "b", bodysegs=[BodySegment(s) for s in segs]
        )
        model, state = world.compile()

        m = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
        d = mujoco.MjData(m)
        mujoco.mj_resetDataKeyframe(m, d, 0)
        for _ in range(4000):
            mujoco.mj_step(m, d)
        mj_ring = float(np.abs(d.qvel).max())

        jstep = jax.jit(lambda s: step(model, s))
        for _ in range(4000):
            state = jstep(state)
        me_ring = float(np.abs(np.asarray(state.qvel)).max())

        # Both engines ring at mm/s scale (neither is quiescent, neither
        # is unstable), within 3x of each other.
        assert 0.3 < mj_ring < 6.0, mj_ring
        assert 0.3 < me_ring < 6.0, me_ring
        assert me_ring < 3.0 * mj_ring and mj_ring < 3.0 * me_ring, (
            me_ring,
            mj_ring,
        )
        # Both piles supported (fly b resting on a, above its body height).
        nq1 = model.free_joints[1][1]
        assert d.qpos[nq1 + 2] > 1.0, d.qpos[nq1 + 2]
        assert float(state.qpos[nq1 + 2]) > 1.0, state.qpos[nq1 + 2]
