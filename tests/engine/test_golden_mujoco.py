"""Golden-trajectory cross-validation against MuJoCo.

The compiled model is exported as MJCF (capsule geoms + explicit inertials)
and stepped by MuJoCo side by side with the TPU engine. This is the
north-star acceptance gate: "matching MuJoCo reference contact trajectories"
(BASELINE.json), and mirrors the reference's batched-vs-single cross-check
strategy (flygym ``tests/warp/test_simulation.py:239-251``).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.golden

import jax

mujoco = pytest.importorskip("mujoco")

from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AxisOrder,
    JointPreset,
    Skeleton,
)
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
    TetheredWorld,
)
from flygym_tpu.compose.spec import BodySpec, GeomSpec, JointSpec, ModelSpec, PairSpec
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D


def _mujoco_from(world_or_spec):
    spec = getattr(world_or_spec, "spec", world_or_spec)
    m = mujoco.MjModel.from_xml_string(spec.to_mjcf_xml())
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    return m, d


# ---------------------------------------------------------------------------
# Minimal primitive: capsule dropping on the ground plane
# ---------------------------------------------------------------------------


class TestCapsuleDrop:
    @pytest.fixture(scope="class")
    def spec(self):
        spec = ModelSpec("ball_world")
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
        spec.neutral_joint_qpos["ballfree"] = [0, 0, 2.0, 1, 0, 0, 0]
        return spec

    def test_freefall_and_rest_height(self, spec):
        compiled = spec.compile()
        state = make_initial_state(compiled.model)
        jstep = jax.jit(step)
        m, d = _mujoco_from(spec)
        zs_me, zs_mj = [], []
        for _ in range(1200):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
            zs_me.append(float(state.qpos[2]))
            zs_mj.append(float(d.qpos[2]))
        zs_me, zs_mj = np.array(zs_me), np.array(zs_mj)
        # Free-fall phase matches tightly; rest height within 1e-3 mm.
        assert np.abs(zs_me[:500] - zs_mj[:500]).max() < 1e-3
        assert abs(zs_me[-1] - zs_mj[-1]) < 1e-3
        # Rest height ≈ radius + halflen + margin.
        assert abs(zs_me[-1] - 0.801) < 5e-3


# ---------------------------------------------------------------------------
# Full fly model
# ---------------------------------------------------------------------------


def _build_fly():
    fly = Fly()
    skeleton = Skeleton(
        axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=JointPreset.LEGS_ONLY
    )
    fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)
    return fly


@pytest.fixture(scope="module")
def tethered_world():
    fly = _build_fly()
    world = TetheredWorld()
    world.add_fly(fly, (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
    return fly, world


@pytest.fixture(scope="module")
def flat_world():
    fly = _build_fly()
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    fly.add_actuators(
        dofs,
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
    return fly, world


class TestFlyGolden:
    def test_fk_matches_mujoco(self, tethered_world):
        _fly, world = tethered_world
        model, state = world.compile()
        m, d = _mujoco_from(world)
        mujoco.mj_forward(m, d)
        id2name = {v: k for k, v in world.compiled.body_name2id.items()}
        for bid in range(1, model.nbody):
            mj_bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, id2name[bid])
            assert mj_bid >= 0
            assert np.allclose(
                np.asarray(state.xpos[bid]), d.xpos[mj_bid], atol=1e-5
            ), id2name[bid]
            q_me, q_mj = np.asarray(state.xquat[bid]), d.xquat[mj_bid]
            assert min(
                np.abs(q_me - q_mj).max(), np.abs(q_me + q_mj).max()
            ) < 1e-5, id2name[bid]

    def test_inertials_match_mujoco(self, tethered_world):
        _fly, world = tethered_world
        model, _state = world.compile()
        m, _d = _mujoco_from(world)
        id2name = {v: k for k, v in world.compiled.body_name2id.items()}
        for bid in range(1, model.nbody):
            mj_bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, id2name[bid])
            assert np.isclose(
                float(model.body_mass[bid]), m.body_mass[mj_bid], rtol=1e-5
            )
            assert np.allclose(
                np.asarray(model.body_inertia[bid]),
                m.body_inertia[mj_bid],
                rtol=1e-4,
                atol=1e-14,
            )

    def test_tethered_passive_dynamics_matches(self, tethered_world):
        """Passive spring-damper swing of all 66 leg DoFs vs MuJoCo."""
        _fly, world = tethered_world
        model, state = world.compile()
        m, d = _mujoco_from(world)
        names = list(world.compiled.hinge_name2id)
        hq_mj = np.array(
            [
                m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)]
                for n in names
            ]
        )
        hq_me = np.array([world.compiled.hinge_qadr[n] for n in names])
        jstep = jax.jit(step)
        for _ in range(150):
            state = jstep(model, state)
            mujoco.mj_step(m, d)
        err = np.abs(np.asarray(state.qpos)[hq_me] - d.qpos[hq_mj]).max()
        assert err < 1e-4, err

    def test_flat_ground_settles_like_mujoco(self, flat_world):
        """Drop onto flat ground with position actuators + adhesion: the fly
        must stand (all six leg sensors in contact) at a rest height within a
        few percent of MuJoCo's."""
        _fly, world = flat_world
        model, state = world.compile()
        m, d = _mujoco_from(world)
        jstep = jax.jit(step)
        # ~1700 steps to pass the micro-bounce transient; assert over the
        # last 100 steps so the check is robust to the exact stopping phase.
        sensor_hist = []
        for i in range(2000):
            state = jstep(model, state)
            mujoco.mj_step(m, d)
            if i >= 1900:
                sensor_hist.append(np.asarray(state.contact_sensordata))
        sensor_hist = np.stack(sensor_hist)  # (100, 6, 16)
        z_me = float(state.qpos[2])
        z_mj = float(d.qpos[2])
        assert abs(z_me - z_mj) < 0.06, (z_me, z_mj)  # < 6% of body height
        # Stable stance: every leg sensor in contact throughout the window.
        frac = sensor_hist[:, :, 0].mean(axis=0)
        assert np.all(frac >= 0.95), frac
        # Total normal constraint force supports the body weight plus the
        # adhesion pull (adhesion is an applied force through the actuator
        # pathway, like MuJoCo; ctrl clamps to >= 1 so each of the 6 legs
        # pulls with gain * 1).
        total_fn = float(sensor_hist[:, :, 1].sum(axis=1).mean())
        weight = float(
            np.asarray(model.body_mass).sum() * -float(model.gravity[2])
        )
        expected = weight + 6.0
        assert 0.8 * expected < total_fn < 1.2 * expected


class TestNonLegChainsGolden:
    """Head/antenna/proboscis/abdomen/wing chains vs MuJoCo.

    The leg-only goldens above leave ALL_BIOLOGICAL's 60 non-leg DoFs and
    ALL_POSSIBLE's full 204-DoF skeleton uncovered; these cross-check FK,
    inertials, and passive dynamics on those chains (reference presets:
    flygym ``anatomy.py:388-460``)."""

    @staticmethod
    def _tethered(preset):
        fly = Fly()
        skeleton = Skeleton(
            axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=preset
        )
        fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)
        world = TetheredWorld()
        world.add_fly(fly, (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
        return fly, world

    @pytest.fixture(scope="class")
    def bio_world(self):
        return self._tethered(JointPreset.ALL_BIOLOGICAL)

    @pytest.fixture(scope="class")
    def full_world(self):
        return self._tethered(JointPreset.ALL_POSSIBLE)

    def _assert_fk_matches(self, world, atol=1e-5):
        model, state = world.compile()
        m, d = _mujoco_from(world)
        mujoco.mj_forward(m, d)
        id2name = {v: k for k, v in world.compiled.body_name2id.items()}
        for bid in range(1, model.nbody):
            mj_bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, id2name[bid])
            assert mj_bid >= 0
            assert np.allclose(
                np.asarray(state.xpos[bid]), d.xpos[mj_bid], atol=atol
            ), id2name[bid]
            q_me, q_mj = np.asarray(state.xquat[bid]), d.xquat[mj_bid]
            assert min(
                np.abs(q_me - q_mj).max(), np.abs(q_me + q_mj).max()
            ) < atol, id2name[bid]

    def test_bio_fk_matches_mujoco(self, bio_world):
        _fly, world = bio_world
        assert world.compile()[0].nv == 126
        self._assert_fk_matches(world)

    def test_bio_inertials_match_mujoco(self, bio_world):
        _fly, world = bio_world
        model, _state = world.compile()
        m, _d = _mujoco_from(world)
        id2name = {v: k for k, v in world.compiled.body_name2id.items()}
        for bid in range(1, model.nbody):
            mj_bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, id2name[bid])
            assert np.isclose(
                float(model.body_mass[bid]), m.body_mass[mj_bid], rtol=1e-5
            )
            assert np.allclose(
                np.asarray(model.body_inertia[bid]),
                m.body_inertia[mj_bid],
                rtol=1e-4,
                atol=1e-14,
            )

    def test_bio_passive_dynamics_matches(self, bio_world):
        """Passive spring-damper swing of all 126 DoFs — including the
        head, antennae, proboscis, abdomen, and wing chains — vs MuJoCo."""
        _fly, world = bio_world
        model, state = world.compile()
        m, d = _mujoco_from(world)
        names = list(world.compiled.hinge_name2id)
        hq_mj = np.array(
            [
                m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)]
                for n in names
            ]
        )
        hq_me = np.array([world.compiled.hinge_qadr[n] for n in names])
        jstep = jax.jit(step)
        for _ in range(150):
            state = jstep(model, state)
            mujoco.mj_step(m, d)
        err = np.abs(np.asarray(state.qpos)[hq_me] - d.qpos[hq_mj]).max()
        assert err < 1e-4, err

    def test_full_204dof_fk_matches_mujoco(self, full_world):
        _fly, world = full_world
        assert world.compile()[0].nv == 204
        self._assert_fk_matches(world)


class TestCondimGolden:
    """Torsional/rolling friction (condim 4/6) vs MuJoCo's pyramidal cones."""

    def _capsule_spec(self, condim):
        spec = ModelSpec(f"condim{condim}_world")
        spec.world_geoms.append(
            GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
        )
        body = BodySpec(name="puck", parent=None)
        body.add_joint(JointSpec(name="puckfree", type="free"))
        body.add_geom(
            GeomSpec(name="puckgeom", type="capsule", size=(0.5, 0.3), mass=1e-3)
        )
        spec.add_body(body)
        spec.pairs.append(
            PairSpec(
                geom1="puckgeom",
                geom2="ground",
                condim=condim,
                friction=(1.0, 1.0, 0.05, 0.01, 0.01),
                solref=(2e-4, 1.0),
                solimp=(0.9, 0.95, 1e-3, 0.5, 2.0),
                margin=1e-3,
            )
        )
        spec.neutral_joint_qpos["puckfree"] = [0, 0, 1.0, 1, 0, 0, 0]
        return spec

    def _run_spin(self, condim, wz):
        """Drop to rest, spin about z, compare the spin decay."""
        spec = self._capsule_spec(condim)
        compiled = spec.compile()
        state = make_initial_state(compiled.model)
        m, d = _mujoco_from(spec)
        jstep = jax.jit(step)
        for _ in range(300):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
        import dataclasses

        qvel = np.asarray(state.qvel).copy()
        qvel[5] = wz
        state = dataclasses.replace(state, qvel=jax.numpy.asarray(qvel))
        d.qvel[5] = wz
        for _ in range(400):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
        return float(state.qvel[5]), float(d.qvel[5]), wz

    def test_condim4_torsional_spin_decay_matches(self):
        wz_me, wz_mj, wz0 = self._run_spin(4, wz=30.0)
        # Torsional friction must visibly decelerate the spin...
        assert wz_mj < 0.8 * wz0
        # ...and our decay must track MuJoCo's.
        assert abs(wz_me - wz_mj) < 0.1 * wz0, (wz_me, wz_mj)

    def test_condim3_spin_persists(self):
        wz_me, wz_mj, wz0 = self._run_spin(3, wz=30.0)
        # condim 3 has no torsional resistance: both engines keep spinning.
        assert wz_me > 0.9 * wz0 and wz_mj > 0.9 * wz0, (wz_me, wz_mj)

    def test_condim6_rolling_decay_matches(self):
        """Sphere spun about y rolls along +x; rolling friction (condim 6)
        brings it to rest. Compare displacement and |omega| decay (component
        conventions for free-joint angular velocity differ between engines,
        so only frame-invariant quantities are asserted)."""
        spec = ModelSpec("roll_world")
        spec.world_geoms.append(
            GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
        )
        body = BodySpec(name="ball", parent=None)
        body.add_joint(JointSpec(name="ballfree", type="free"))
        body.add_geom(
            GeomSpec(name="ballgeom", type="sphere", size=(0.5,), mass=1e-3)
        )
        spec.add_body(body)
        spec.pairs.append(
            PairSpec(
                geom1="ballgeom",
                geom2="ground",
                condim=6,
                friction=(1.0, 1.0, 0.05, 0.01, 0.01),
                solref=(2e-4, 1.0),
                solimp=(0.9, 0.95, 1e-3, 0.5, 2.0),
                margin=1e-3,
            )
        )
        spec.neutral_joint_qpos["ballfree"] = [0, 0, 0.6, 1, 0, 0, 0]
        compiled = spec.compile()
        state = make_initial_state(compiled.model)
        m, d = _mujoco_from(spec)
        jstep = jax.jit(step)
        for _ in range(200):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
        import dataclasses

        qvel = np.asarray(state.qvel).copy()
        qvel[4] = 20.0  # spin about y -> rolls toward +x
        state = dataclasses.replace(state, qvel=jax.numpy.asarray(qvel))
        d.qvel[4] = 20.0
        for _ in range(600):
            state = jstep(compiled.model, state)
            mujoco.mj_step(m, d)
        w_me = float(np.linalg.norm(np.asarray(state.qvel)[3:6]))
        w_mj = float(np.linalg.norm(d.qvel[3:6]))
        x_me, x_mj = float(state.qpos[0]), float(d.qpos[0])
        assert x_mj > 0.05  # it rolled
        assert w_mj < 15.0  # rolling resistance decayed the spin
        assert abs(x_me - x_mj) < 0.2 * max(x_mj, 0.1), (x_me, x_mj)
        assert abs(w_me - w_mj) < 3.0, (w_me, w_mj)
