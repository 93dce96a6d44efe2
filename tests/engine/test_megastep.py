"""Mega-step emitter vs the jnp engine.

The Pallas mega-kernel's per-world computation (ops/megastep.py emit_step)
is pure elementwise jnp over lane vectors, so it can be executed directly on
(B,) batch vectors and compared against the vmapped reference step — the
same code that runs inside the kernel, minus the Pallas plumbing.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import flygym_tpu
from flygym_tpu.anatomy import ActuatedDOFPreset, AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.engine.step import step
from flygym_tpu.ops import megastep as ms
from flygym_tpu.utils.math import Rotation3D

B = 4


def _world(actuator=ActuatorType.POSITION, **kw):
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    if actuator == ActuatorType.POSITION:
        kw.setdefault("kp", 50.0)
        kw.setdefault("neutral_input", KinematicPosePreset.NEUTRAL)
    fly.add_actuators(dofs, actuator, **kw)
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    return world


def _batched_state(model, state0, n_steps=0, ctrl=None):
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    if ctrl is not None:
        import dataclasses

        bstate = dataclasses.replace(
            bstate, ctrl=jnp.broadcast_to(ctrl, (B,) + ctrl.shape)
        )
    if n_steps:
        f = jax.jit(jax.vmap(lambda s: step(model, s)))
        for _ in range(n_steps):
            bstate = f(bstate)
    return bstate


def _emit_batched(model, bstate):
    """Run the emitter on (B,) lane vectors and pack a State-like dict."""
    st = ms._Static(model)

    def cols(x):
        return [x[:, i] for i in range(x.shape[1])]

    r = ms.emit_step(
        st,
        cols(bstate.qpos),
        cols(bstate.qvel),
        cols(bstate.ctrl),
        cols(bstate.act),
        cols(bstate.qacc),
    )
    pack = lambda lst: jnp.stack(lst, axis=1) if lst else jnp.zeros((B, 0))
    out = dict(
        qpos=pack(r["qpos"]),
        qvel=pack(r["qvel"]),
        act=pack(r["act"]),
        qacc=pack(r["qacc"]),
        xpos=jnp.stack([jnp.stack(p, 1) for p in r["xpos"]], 1),
        xquat=jnp.stack([jnp.stack(p, 1) for p in r["xquat"]], 1),
        actuator_force=pack(r["actuator_force"]),
        sensordata=(
            jnp.stack([jnp.stack(s, 1) for s in r["sensordata"]], 1)
            if r["sensordata"]
            else jnp.zeros((B, 0, 16))
        ),
    )
    return out


@pytest.fixture(scope="module")
def settled():
    world = _world()
    model, state0 = world.compile()
    adh = [u for u in range(model.nu)]  # ctrl: adhesion on (clamped >= 1)
    ctrl = jnp.zeros((model.nu,), jnp.float32)
    bstate = _batched_state(model, state0, n_steps=300, ctrl=ctrl)
    return model, bstate


class TestEmitterMatchesEngine:
    def test_single_step_outputs_match(self, settled):
        model, bstate = settled
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        # Eager execution: the emitter unrolls to ~1e5 tiny ops — jitting
        # it on CPU takes tens of minutes, eager a few seconds.
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["xpos"]), np.asarray(ref.xpos), atol=1e-5
        )
        np.testing.assert_allclose(
            # Sequential lane accumulation vs XLA matmul trees: fp32
            # summation-order differences on near-cancelling ~1e4 terms.
            np.asarray(got["qacc"]), np.asarray(ref.qacc), rtol=6e-3, atol=0.2
        )
        np.testing.assert_allclose(
            np.asarray(got["qvel"]), np.asarray(ref.qvel), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["qpos"]), np.asarray(ref.qpos), atol=1e-6 + 2e-4 * float(model.timestep)
        )
        np.testing.assert_allclose(
            np.asarray(got["actuator_force"]),
            np.asarray(ref.actuator_force),
            rtol=1e-4,
            atol=1e-4,
        )
        # Sensor rows: found flag + normal force.
        np.testing.assert_allclose(
            np.asarray(got["sensordata"])[..., :4],
            np.asarray(ref.contact_sensordata)[..., :4],
            atol=2e-3,
        )

    def test_trajectory_tracks_engine(self, settled):
        """20 chained emitter steps stay on the engine's trajectory.

        Chained from a QUIESCENT state (settled ~2500 steps; the fixture's
        300-step state is still mid-bounce with |qvel|~30, where chained
        comparison is chaotic — any per-step fp-reassociation noise, e.g.
        the emitter's incremental Newton iterates, blows up to O(1) within
        20 steps and the test becomes a coin flip).
        """
        model, bstate = settled
        from flygym_tpu.engine.model import State

        f_ref = jax.jit(jax.vmap(lambda s: step(model, s)))
        for _ in range(2200):  # fixture's 300 → ~2500: max|qvel| ≈ 0.1
            bstate = f_ref(bstate)

        def emit_state_step(s):
            got = _emit_batched(model, s)
            return State(
                qpos=got["qpos"],
                qvel=got["qvel"],
                ctrl=s.ctrl,
                act=got["act"],
                time=s.time + model.timestep,
                qacc=got["qacc"],
                xpos=got["xpos"],
                xquat=got["xquat"],
                site_xpos=s.site_xpos,
                actuator_force=got["actuator_force"],
                contact_sensordata=got["sensordata"],
            )

        f_emit = emit_state_step  # eager (see note above)
        s_ref, s_emit = bstate, bstate
        for _ in range(20):
            s_ref = f_ref(s_ref)
            s_emit = f_emit(s_emit)
        # Measured: dqpos ~1.5e-7, dqvel ~4e-4, flat over the 20 steps.
        np.testing.assert_allclose(
            np.asarray(s_emit.qpos), np.asarray(s_ref.qpos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_emit.qvel), np.asarray(s_ref.qvel), atol=3e-3
        )


class TestEmitterStrictMode:
    """Strict-parity exact-Newton mode runs IN-KERNEL: the emitter re-fills
    and re-factors the Hessian from the current active set at every Newton
    iteration, mirroring engine/contact.py _solve_primal_newton's
    ``model.solver_exact`` branch."""

    @pytest.fixture(scope="class")
    def strict_settled(self):
        world = _world()
        world.spec.options["solver_exact"] = True
        world.spec.options["solver_iterations"] = 10
        model, state0 = world.compile()
        assert model.solver_exact
        ctrl = jnp.zeros((model.nu,), jnp.float32)
        bstate = _batched_state(model, state0, n_steps=300, ctrl=ctrl)
        return model, bstate

    def test_supported_and_matches_engine(self, strict_settled):
        model, bstate = strict_settled
        assert ms.megastep_supported(model), (
            "strict exact-Newton must be kernel-eligible"
        )
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["qacc"]), np.asarray(ref.qacc), rtol=6e-3, atol=0.2
        )
        np.testing.assert_allclose(
            np.asarray(got["qvel"]), np.asarray(ref.qvel), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["qpos"]),
            np.asarray(ref.qpos),
            atol=1e-6 + 2e-4 * float(model.timestep),
        )


class TestPallasCallPlumbing:
    """The full pallas_call glue — input packing/transpose, padding to the
    (SUBLANES, LANE) world block, 4-D block specs, per-row read/write
    offsets, output unpack — through the Pallas interpreter on CPU.

    The real emitter is ~2e5 ops (the interpreter costs ~2 ms/op, so the
    full kernel can never run interpreted in CI); it is validated separately
    on (B,) arrays by the emitter tests above, and on real hardware by the
    TPU smoke test (tests/tpu/). Here a cheap mock emitter with a distinct,
    shape-generic transform per field proves every input row is routed to
    the kernel and every kernel output lands in the right State field —
    exactly the plumbing a packing/layout regression would break."""

    def test_megastep_glue_routes_all_rows(self, settled, monkeypatch):
        model, bstate = settled
        st_real = ms._Static(model)
        nbody, nsite, nsensor = st_real.nbody, st_real.nsite, st_real.nsensor

        def mock_emit(st, q, v, ctrl, act, warm, terrain=None, widx=None):
            z = jnp.zeros_like(q[0])
            return dict(
                qpos=[2.0 * x + 1.0 for x in q],
                qvel=[3.0 * x for x in v],
                act=[x + 0.5 for x in act],
                qacc=[x - 1.0 for x in warm],
                xpos=[
                    (q[0] + float(b), v[0] - float(b), z + float(b))
                    for b in range(st.nbody)
                ],
                xquat=[
                    (z + 1.0, z, z + float(b), z - float(b))
                    for b in range(st.nbody)
                ],
                site_xpos=[
                    (z + float(s), q[1] + float(s), z) for s in range(st.nsite)
                ],
                actuator_force=[4.0 * c for c in ctrl],
                sensordata=[
                    [z + float(s * 16 + k) for k in range(16)]
                    for s in range(st.nsensor)
                ],
            )

        monkeypatch.setattr(ms, "emit_step", mock_emit)
        mega = ms.make_megastep(model, interpret=True)
        got = mega(bstate)
        bs = lambda x: np.asarray(x)

        np.testing.assert_allclose(bs(got.qpos), 2 * bs(bstate.qpos) + 1, rtol=1e-6)
        np.testing.assert_allclose(bs(got.qvel), 3 * bs(bstate.qvel), rtol=1e-6)
        np.testing.assert_allclose(bs(got.act), bs(bstate.act) + 0.5, rtol=1e-6)
        np.testing.assert_allclose(bs(got.qacc), bs(bstate.qacc) - 1, rtol=1e-6)
        np.testing.assert_allclose(bs(got.actuator_force), 4 * bs(bstate.ctrl), rtol=1e-6)
        q0 = bs(bstate.qpos)[:, 0]
        v0 = bs(bstate.qvel)[:, 0]
        q1 = bs(bstate.qpos)[:, 1]
        b_idx = np.arange(nbody, dtype=np.float32)
        np.testing.assert_allclose(bs(got.xpos)[:, :, 0], q0[:, None] + b_idx, rtol=1e-6)
        np.testing.assert_allclose(bs(got.xpos)[:, :, 1], v0[:, None] - b_idx, rtol=1e-6)
        np.testing.assert_allclose(bs(got.xpos)[:, :, 2], np.broadcast_to(b_idx, (B, nbody)), rtol=1e-6)
        np.testing.assert_allclose(bs(got.xquat)[:, :, 0], np.ones((B, nbody)), rtol=1e-6)
        np.testing.assert_allclose(bs(got.xquat)[:, :, 2], np.broadcast_to(b_idx, (B, nbody)), rtol=1e-6)
        s_idx = np.arange(nsite, dtype=np.float32)
        np.testing.assert_allclose(bs(got.site_xpos)[:, :, 0], np.broadcast_to(s_idx, (B, nsite)), rtol=1e-6)
        np.testing.assert_allclose(bs(got.site_xpos)[:, :, 1], q1[:, None] + s_idx, rtol=1e-6)
        sens_idx = np.arange(nsensor * 16, dtype=np.float32).reshape(nsensor, 16)
        np.testing.assert_allclose(
            bs(got.contact_sensordata), np.broadcast_to(sens_idx, (B, nsensor, 16)), rtol=1e-6
        )
        # Bookkeeping fields the wrapper must pass through / advance.
        np.testing.assert_allclose(bs(got.time), bs(bstate.time) + model.timestep, rtol=1e-6)
        np.testing.assert_array_equal(bs(got.ctrl), bs(bstate.ctrl))


class TestEmitterMuscle:
    def test_muscle_forces_match(self):
        world = _world(
            ActuatorType.MUSCLE,
            lengthrange=(-1.0, 1.0),
            forcelimited=False,
            forcerange=(-50, 50),
            ctrlrange=(0.0, 1.0),
        )
        model, state0 = world.compile()
        ctrl = jnp.full((model.nu,), 0.7, jnp.float32)
        bstate = _batched_state(model, state0, n_steps=80, ctrl=ctrl)
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        # Eager execution: the emitter unrolls to ~1e5 tiny ops — jitting
        # it on CPU takes tens of minutes, eager a few seconds.
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["actuator_force"]),
            np.asarray(ref.actuator_force),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["act"]), np.asarray(ref.act), atol=1e-6
        )


class TestEmitterHeightfield:
    def test_blocks_terrain_matches_engine_at_rest(self):
        """On heightfield terrain the kernel uses ground planes sampled from
        the previous step's FK; at/near rest that equals the engine's
        in-step sampling, so outputs must match."""
        from flygym_tpu.compose import BlocksTerrainWorld
        from flygym_tpu.engine.contact import ground_height_normal
        from flygym_tpu.engine.maths import quat_mul, quat_rotate
        from flygym_tpu.ops.megastep import megastep_supported

        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
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
        world = BlocksTerrainWorld(rng_seed=2)
        world.add_fly(fly, (0, 0, 1.6), Rotation3D("quat", (1, 0, 0, 0)))
        model, state0 = world.compile()
        assert megastep_supported(model)

        bstate = _batched_state(
            model, state0, n_steps=800, ctrl=jnp.zeros((model.nu,), jnp.float32)
        )
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)

        def planes(xpos, xquat):
            gb = model.geom_body[model.can_geom]
            gpos = xpos[gb] + quat_rotate(xquat[gb], model.geom_pos[model.can_geom])
            gquat = quat_mul(xquat[gb], model.geom_quat[model.can_geom])
            zax = quat_rotate(gquat, jnp.array([0.0, 0.0, 1.0]))
            halflen = model.geom_size[model.can_geom, 1]
            ep = gpos + (model.can_end * halflen)[:, None] * zax
            h, n = ground_height_normal(model, ep[:, :2])
            return jnp.concatenate([h[:, None], n], axis=1)

        pl_b = jax.vmap(planes)(bstate.xpos, bstate.xquat)  # (B, ncand, 4)
        st = ms._Static(model)
        cols = lambda x: [x[:, i] for i in range(x.shape[1])]
        terrain = [tuple(pl_b[:, c, k] for k in range(4)) for c in range(model.ncand)]
        r = ms.emit_step(
            st,
            cols(bstate.qpos),
            cols(bstate.qvel),
            cols(bstate.ctrl),
            cols(bstate.act),
            cols(bstate.qacc),
            terrain,
        )
        qpos = jnp.stack(r["qpos"], axis=1)
        qvel = jnp.stack(r["qvel"], axis=1)
        # Micro-bounce impacts amplify fp reordering noise; 3e-4 in qpos is
        # one step of ~3 mm/s velocity-level difference on impact transients.
        np.testing.assert_allclose(
            np.asarray(qpos), np.asarray(ref.qpos), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(qvel), np.asarray(ref.qvel), atol=3.0
        )
        # Contact sensors see terrain normals (nonzero tangential variety).
        sens = np.stack([np.stack(s, 1) for s in r["sensordata"]], 1)
        assert np.isfinite(sens).all()


class TestMegastepGating:
    def test_cpu_backend_disables_megastep(self):
        import flygym_tpu

        world = _world()
        sim = flygym_tpu.BatchSimulation(world, 2)
        assert sim._megastep is None  # CPU backend in tests

    def test_env_optout(self, monkeypatch):
        import flygym_tpu

        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP", "0")
        world = _world()
        sim = flygym_tpu.BatchSimulation(world, 2)
        assert sim._megastep is None

    def test_supported_flags(self):
        from flygym_tpu.compose import BlocksTerrainWorld
        from flygym_tpu.ops.megastep import megastep_supported

        model, _ = _world().compile()
        assert megastep_supported(model)
        model.__class__  # hfield worlds now supported too
        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        w = BlocksTerrainWorld()
        w.add_fly(fly, (0, 0, 1.5), Rotation3D("quat", (1, 0, 0, 0)))
        m2, _ = w.compile()
        assert megastep_supported(m2)
        # PGS cross-check solver stays on the jnp path.
        w2 = _world()
        w2.spec.options["solver"] = "pgs"
        m3, _ = w2.compile()
        assert not megastep_supported(m3)


class TestTerrainResampleChunking:
    """rollout_batched amortizes terrain-plane sampling over K-step chunks
    when the batched step exposes sample_planes (the mega-step kernel's
    heightfield path). A mock step encodes which planes it received so the
    resample schedule is observable from the trajectory."""

    def test_planes_sampled_once_per_chunk(self, settled, monkeypatch):
        import dataclasses

        from flygym_tpu.engine.step import rollout_batched

        model, bstate = settled
        monkeypatch.setenv("FLYGYM_TPU_TERRAIN_RESAMPLE", "8")

        def mock_step(s, planes=None):
            assert planes is not None, "chunked path must pass planes"
            # qpos counts steps; qvel records the planes in use.
            return dataclasses.replace(
                s,
                qpos=s.qpos + 1.0,
                qvel=jnp.broadcast_to(planes[:, :1], s.qvel.shape),
            )

        # Planes snapshot = qpos[0] at sampling time.
        mock_step.sample_planes = lambda s: s.qpos[:, :1]

        n_steps = 24  # 3 chunks of 8
        ctrl = jnp.full(
            (n_steps, bstate.qpos.shape[0], model.nu), jnp.nan, jnp.float32
        )
        final, traj = rollout_batched(
            model, bstate, ctrl, n_steps, batched_step=mock_step
        )
        q0 = np.asarray(bstate.qpos[:, 0])
        np.testing.assert_allclose(
            np.asarray(final.qpos), np.asarray(bstate.qpos) + n_steps, atol=1e-5
        )
        # Final qvel carries the planes sampled at the LAST chunk start
        # (after 16 steps), not a per-step sample (which would read 23).
        np.testing.assert_allclose(
            np.asarray(final.qvel[:, 0]), q0 + 16.0, atol=1e-5
        )
        assert traj.shape[0] == n_steps

    def test_non_divisible_steps_fall_back(self, settled, monkeypatch):
        import dataclasses

        from flygym_tpu.engine.step import rollout_batched

        model, bstate = settled
        monkeypatch.setenv("FLYGYM_TPU_TERRAIN_RESAMPLE", "8")
        calls = {"with_planes": False}

        def mock_step(s, planes=None):
            # Fallback path calls with a single argument.
            assert planes is None
            return dataclasses.replace(s, qpos=s.qpos + 1.0)

        mock_step.sample_planes = lambda s: s.qpos[:, :1]
        ctrl = jnp.full((7, bstate.qpos.shape[0], model.nu), jnp.nan, jnp.float32)
        final, traj = rollout_batched(
            model, bstate, ctrl, 7, batched_step=mock_step
        )
        np.testing.assert_allclose(
            np.asarray(final.qpos), np.asarray(bstate.qpos) + 7.0, atol=1e-5
        )


@pytest.fixture(scope="module")
def stacked():
    from flygym_tpu.anatomy import ContactBodiesPreset

    def mkfly(name):
        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        return fly

    world = FlatGroundWorld()
    world.add_fly(mkfly("lo"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(mkfly("hi"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
    # Narrow pair set (body trunks only). NOTE: even this 49-row set is
    # VMEM-gated off the real Mosaic kernel (measured 152.45 MiB on v5e,
    # 2026-08-19 — ~1.1 MiB of register pressure per uncompressed pair
    # row); the EMITTER math tested here is budget-independent (eager on
    # (B,) lane vectors), and tests/tpu covers an in-budget 16-row config
    # through the compiled kernel.
    segs = [
        s
        for s in ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
        if "thorax" in s.name or "abdomen" in s.name or "head" in s.name
    ]
    n = world.add_fly_fly_contacts("lo", "hi", bodysegs=segs)
    assert n > 0
    model, state0 = world.compile()

    assert model.ncand_pair == n
    # Drop "hi" onto "lo" so pair rows are ACTIVE in the settled state.
    ctrl = jnp.zeros((model.nu,), jnp.float32)
    bstate = _batched_state(model, state0, n_steps=250, ctrl=ctrl)
    return model, bstate


class TestPairRowsMatchEngine:
    """Fly-fly capsule-capsule pair rows in the kernel emitter: a fly
    dropped onto another must produce the same constrained step as the jnp
    path (which builds the identical candidate table, then top-K-compresses
    — agreement requires active contacts <= ncon, true here)."""

    def test_emitter_matches_jnp_step_with_pair_contacts(self, stacked):
        model, bstate = stacked
        # Sanity: the upper fly is resting on/near the lower one, not the
        # ground: pair rows are doing work in this state.
        z_hi = float(bstate.xpos[0, model.nbody // 2 + 1, 2])
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["xpos"]), np.asarray(ref.xpos), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["qvel"]), np.asarray(ref.qvel), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(got["qpos"]), np.asarray(ref.qpos), atol=2e-4
        )

    def test_flies_interact_in_emitter(self, stacked):
        """The settled two-fly stack rests with the upper fly clearly above
        the lower one's body height (not fallen through to the ground)."""
        model, bstate = stacked
        # Root z of each fly (free joint slots 2 and 9+2... read from qpos):
        z_lo = float(bstate.qpos[0, 2])
        hi_qadr = model.free_joints[1][1]
        z_hi = float(bstate.qpos[0, hi_qadr + 2])
        assert z_hi > z_lo + 0.4, (z_lo, z_hi)


class TestCompressedMaskRowPlumbing:
    """Winner-mask input rows through the REAL pallas_call plumbing.

    For pair-compressed models the winner eq one-hots, per-unique-run
    sign masks, and r2/h2/invw scalars are expanded OUT of the kernel
    (sample_planes/_wsampler) into aux input rows the emitter reads back
    via per-row lazy readers — an offset mismatch between the sampler's
    layout and the reader's would scramble the blended geom2 geometry.

    Running the REAL emitter through the Pallas interpreter is not
    viable even for the tiny group-of-2 spec: unjitted interpret mode
    compiles+caches one CPU executable per op (measured >45 min and
    78 GB RSS, 2026-08-20), and jitting the interpreted call is a
    >9-minute XLA CPU compile. So, exactly like TestPallasCallPlumbing,
    a MOCK emitter runs through the interpreter instead — one that
    ECHOES every lazy mask-row reader into output rows — and the echo
    is compared against the masks _wmask_from_widx computes from the
    winner index directly. That pins the full chain the deleted
    real-emitter test covered: sample_planes packs the rows at the
    offsets the kernel's readers consume, through real block specs and
    lane packing."""

    def test_mask_rows_echo_through_kernel(self, monkeypatch):
        from flygym_tpu.engine.contact import make_pair_winner_sampler
        from flygym_tpu.engine.model import make_initial_state
        from tests.engine.test_capcap_golden import _compressed_spec

        spec = _compressed_spec(exact=False)
        model = spec.compile().model
        assert model.pair_compress and model.pair_groups == ((0, 2),)
        assert ms.megastep_supported(model)
        state0 = make_initial_state(model)
        Bp = 4
        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (Bp,) + jnp.shape(x)),
            state0,
        )
        # Vary B's drop height per world so the winner argmin input varies
        # across lanes (contact active in some worlds, not others).
        bstate = dataclasses.replace(
            bstate,
            qpos=bstate.qpos.at[:, 9].set(
                jnp.linspace(1.30, 1.70, Bp, dtype=jnp.float32)
            ),
        )

        st = ms._Static(model)
        grp = st.pair_comp_groups[0]
        nmem, n_runs = len(grp["members"]), len(grp["listed"])
        n_echo = nmem + n_runs + 3
        assert n_echo <= model.nq, "echo slots must fit the qpos rows"

        def mock_emit(st_, q, v, ctrl, act, warm, terrain=None, widx=None):
            wm = widx[0]
            # One representative DoF per listed sign row, in row order.
            k_to_dof = {}
            for d, k in grp["dof_sign_idx"].items():
                k_to_dof.setdefault(k, d)
            vals = (
                [wm["eq"][j]() for j in range(nmem)]
                + [wm["sign"][k_to_dof[k]]() for k in range(n_runs)]
                + [wm["r2"](), wm["h2"](), wm["invw"]()]
            )
            z = jnp.zeros_like(q[0])
            qpos_out = list(vals) + [z] * (st_.nq - n_echo)
            return dict(
                qpos=qpos_out,
                qvel=[jnp.zeros_like(x) for x in v],
                act=list(act),
                qacc=list(warm),
                xpos=[(z, z, z) for _ in range(st_.nbody)],
                xquat=[(z, z, z, z) for _ in range(st_.nbody)],
                site_xpos=[(z, z, z) for _ in range(st_.nsite)],
                actuator_force=list(ctrl),
                sensordata=[
                    [z] * 16 for _ in range(st_.nsensor)
                ],
            )

        monkeypatch.setattr(ms, "emit_step", mock_emit)
        mega = ms.make_megastep(model, interpret=True)
        got = mega(bstate)
        echoed = np.asarray(got.qpos)[:, :n_echo]

        # Expected masks straight from the winner index (the adapter the
        # eager cross-checks use — same values sample_planes must pack).
        widx_b = make_pair_winner_sampler(model)(bstate.xpos, bstate.xquat)
        wm_ref = ms._wmask_from_widx(st, [widx_b[:, 0]])[0]
        k_to_dof = {}
        for d, k in grp["dof_sign_idx"].items():
            k_to_dof.setdefault(k, d)
        expect = np.stack(
            [np.asarray(wm_ref["eq"][j]()) for j in range(nmem)]
            + [
                np.asarray(wm_ref["sign"][k_to_dof[k]]())
                for k in range(n_runs)
            ]
            + [
                np.asarray(wm_ref["r2"]()),
                np.asarray(wm_ref["h2"]()),
                np.asarray(wm_ref["invw"]()),
            ],
            axis=-1,
        )
        np.testing.assert_allclose(echoed, expect, atol=1e-6)
        # The winner actually varies across the drop heights would make
        # this vacuous if every lane picked member 0 — require both
        # one-hot columns to be exercised somewhere in the batch OR the
        # sampler to be deterministic single-winner (then the eq columns
        # must still be a valid one-hot per lane).
        assert np.allclose(echoed[:, :nmem].sum(axis=1), 1.0)


class TestStreamingContactEmitter:
    """The streaming contact emitter (_emit_contacts_stream) is the same
    math as the fused one in a different evaluation order — big models
    (est > STREAM_ABOVE_MB of Mosaic value stack) use it to stay under the
    measured spill cliff. Outputs must agree to fp-reassociation noise."""

    def _run(self, model, bstate, stream):
        st = ms._Static(model)
        st.stream = stream

        def cols(x):
            return [x[:, i] for i in range(x.shape[1])]

        return ms.emit_step(
            st,
            cols(bstate.qpos),
            cols(bstate.qvel),
            cols(bstate.ctrl),
            cols(bstate.act),
            cols(bstate.qacc),
        )

    def _assert_match(self, rf, rs, model):
        for k in ["qpos", "qvel", "qacc", "actuator_force"]:
            if not rf[k]:
                continue
            a, b = np.asarray(jnp.stack(rf[k])), np.asarray(jnp.stack(rs[k]))
            scale = max(np.abs(a).max(), 1e-9)
            np.testing.assert_allclose(b, a, atol=1e-4 * scale, err_msg=k)
        sf = np.asarray([[np.asarray(x) for x in row] for row in rf["sensordata"]])
        ss = np.asarray([[np.asarray(x) for x in row] for row in rs["sensordata"]])
        np.testing.assert_allclose(
            ss, sf, atol=1e-3 * max(np.abs(sf).max(), 1.0), err_msg="sensordata"
        )

    def test_matches_fused_single_fly(self, settled):
        model, bstate = settled
        self._assert_match(
            self._run(model, bstate, False), self._run(model, bstate, True), model
        )

    def test_matches_fused_with_pair_rows(self, stacked):
        model, bstate = stacked
        self._assert_match(
            self._run(model, bstate, False), self._run(model, bstate, True), model
        )

    def test_stream_mode_selection(self, stacked, monkeypatch):
        small_model, _ = _world().compile()
        # Default ("rescue"): fused for models the fused estimate fits...
        assert not ms._stream_mode(small_model)
        # ...but a model that would be VMEM-GATED fused (the 49-pair
        # uncompressed two-fly set: 152.45 MiB measured 2026-08-19) whose
        # STREAM estimate fits is rescued onto the streaming kernel
        # instead of falling to the jnp path.
        assert ms._est_scoped_mb(stacked[0]) > ms._VMEM_GATE_MB
        assert ms._est_stream_mb(stacked[0]) <= ms._VMEM_GATE_MB
        assert ms._stream_mode(stacked[0])
        assert ms.megastep_supported(stacked[0])
        # The unified kernel estimator resolves the same mode choice.
        assert ms._est_kernel_mb(stacked[0]) == ms._est_stream_mb(stacked[0])
        # auto: est-based selection; 1: forced on; 0: forced fused.
        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_STREAM", "auto")
        assert not ms._stream_mode(small_model)
        assert ms._stream_mode(stacked[0])
        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_STREAM", "1")
        assert ms._stream_mode(small_model)
        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_STREAM", "0")
        assert not ms._stream_mode(stacked[0])


class TestConstFoldedQuatHelpers:
    """The trace-time constant-folded quaternion ops must match the dense
    formulas for arbitrary (not just sparse) constants."""

    def _rand(self, key, n=8):
        import jax
        import jax.numpy as jnp

        q = jax.random.normal(key, (4, n))
        q = q / jnp.linalg.norm(q, axis=0)
        return tuple(q)

    def test_qmul_c_matches_dense(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from flygym_tpu.ops import megastep as ms

        z = jnp.zeros(8)
        a = self._rand(jax.random.PRNGKey(0))
        for c in [
            (1.0, 0.0, 0.0, 0.0),
            (0.7071, 0.7071, 0.0, 0.0),
            (0.5, -0.5, 0.5, -0.5),
            (0.9, 0.1, -0.2, 0.3),
        ]:
            got = ms._qmul_c(a, c, z)
            cw = tuple(jnp.full(8, v) for v in c)
            # Dense reference: standard Hamilton product.
            aw, ax, ay, az = a
            bw, bx, by, bz = cw
            want = (
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-6
            )

    def test_qrot_c_matches_scipy(self):
        import jax
        import numpy as np
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from flygym_tpu.ops import megastep as ms

        z = jnp.zeros(8)
        q = self._rand(jax.random.PRNGKey(1))
        for c in [(0.0, 1.0, 0.0), (1.0, 0.0, 0.0), (0.3, -0.4, 1.2),
                  (0.0, 0.0, 0.0)]:
            got = np.asarray(ms._qrot_c(q, c, z)).T  # (8, 3)
            qn = np.asarray(q).T  # (8, 4) wxyz
            want = Rotation.from_quat(
                qn[:, [1, 2, 3, 0]]
            ).apply(np.asarray(c))
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_qmul_sp_matches_dense(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from flygym_tpu.ops import megastep as ms

        z = jnp.zeros(8)
        a = self._rand(jax.random.PRNGKey(2))
        s = jnp.linspace(-1.0, 1.0, 8)
        c_ = jnp.sqrt(jnp.clip(1 - s * s, 0.0, 1.0))
        for axis in range(3):
            for sign in (1.0, -1.0):
                hq = [c_, None, None, None]
                hq[axis + 1] = sign * s
                got = ms._qmul_sp(a, hq, z)
                dense = [c_, z, z, z]
                dense[axis + 1] = sign * s
                aw, ax, ay, az = a
                bw, bx, by, bz = dense
                want = (
                    aw * bw - ax * bx - ay * by - az * bz,
                    aw * bx + ax * bw + ay * bz - az * by,
                    aw * by - ax * bz + ay * bw + az * bx,
                    aw * bz + ax * by - ay * bx + az * bw,
                )
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=1e-6
                )


class TestVmemGate:
    """The scoped-VMEM estimator gate (recalibrated 2026-08-19): the
    204-DoF ALL_POSSIBLE preset measured 146.32 MiB on v5e with Mh
    resident — past the 128 MiB ceiling (it silently rode the kernel
    before the recalibration and OOM'd at compile). The H0-matvec mode
    frees Mh's live range after the Hessian fill, which brings the deep
    tree back under the gate; small presets keep the cheaper pairs
    matvec. The estimator tracks mass-matrix TREE PAIRS, not nv."""

    def test_all_possible_gating_modes(self):
        from flygym_tpu.anatomy import JointPreset, Skeleton
        from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
        from flygym_tpu.utils.math import Rotation3D

        def model_for(preset):
            fly = Fly(name="f")
            fly.add_joints(
                Skeleton(axis_order="ypr", joint_preset=preset),
                neutral_pose=KinematicPosePreset.NEUTRAL,
            )
            world = FlatGroundWorld()
            world.add_fly(fly, (0, 0, 0.8), Rotation3D("quat", (1, 0, 0, 0)))
            return world.compile()[0]

        assert ms.megastep_supported(model_for(JointPreset.LEGS_ONLY))
        assert ms.megastep_supported(model_for(JointPreset.ALL_BIOLOGICAL))
        m_ap = model_for(JointPreset.ALL_POSSIBLE)
        # The PLAIN (Mh-resident) estimate reproduces the measured
        # hardware OOM point (~146 MiB) — over the gate...
        assert 125.0 < ms._est_scoped_mb(m_ap, h0_matvec=False) < 160.0
        assert ms._est_scoped_mb(m_ap, h0_matvec=False) > ms._VMEM_GATE_MB
        # ...so auto mode picks the H0 matvec (Mh freed after the fill),
        # which brings the deep tree back under the gate.
        assert ms._use_h0_matvec(m_ap)
        assert ms._est_scoped_mb(m_ap) <= ms._VMEM_GATE_MB
        assert ms.megastep_supported(m_ap)
        # Small models keep the cheaper pairs matvec.
        assert not ms._use_h0_matvec(model_for(JointPreset.LEGS_ONLY))


class TestH0Matvec:
    """The H0-matvec mode (M·x recovered from the frozen LDL factor,
    freeing Mh's live range — what fits the 204-DoF tree in VMEM) must be
    numerically equivalent to the explicit pairs matvec: the identity
    M = H0 − JᵀΣ0J − 1e-9·I is exact when no cross-tree fill is dropped,
    so only fp reassociation separates the two (measured ~2e-6 relative
    on a settled state)."""

    def test_tree_mul_inverts_tree_solve(self):
        rng = np.random.RandomState(0)
        nv = 9
        parent = [-1, 0, 1, 1, 0, 4, 4, 6, 6]
        chains = []
        for d in range(nv):
            ch, p = [], parent[d]
            while p >= 0:
                ch.append(p)
                p = parent[p]
            chains.append(ch)

        class St:
            pass

        st = St()
        st.nv = nv
        st.dof_chains = chains
        st.elim_order = sorted(range(nv), key=lambda d: -len(chains[d]))
        A = {}
        dense = np.zeros((nv, nv))
        for d in range(nv):
            A[(d, d)] = jnp.asarray(3.0 + rng.rand())
            dense[d, d] = float(A[(d, d)])
            for a in chains[d]:
                v = rng.randn() * 0.3
                A[(a, d)] = jnp.asarray(v)
                dense[a, d] = dense[d, a] = v
        z = jnp.asarray(0.0)
        L, dvec = ms._tree_ldl(st, A, z)
        x = rng.randn(nv)
        want = dense @ x
        got = ms._tree_mul(st, L, dvec, [jnp.asarray(v) for v in x])
        np.testing.assert_allclose(
            np.array([float(g) for g in got]), want, atol=1e-5
        )

    def test_emitter_h0_matches_pairs_matvec(self, settled, monkeypatch):
        model, bstate = settled

        def run(mode):
            monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_MATVEC", mode)
            return _emit_batched(model, bstate)

        r_pairs = run("pairs")
        r_h0 = run("h0")
        for k, rel in (("qpos", 1e-7), ("qvel", 1e-5), ("qacc", 1e-4)):
            a = np.asarray(r_pairs[k])
            b = np.asarray(r_h0[k])
            scale = max(float(np.abs(a).max()), 1e-9)
            assert np.abs(a - b).max() <= rel * scale, (
                k, np.abs(a - b).max(), scale)
