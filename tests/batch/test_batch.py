"""Batched simulation tests.

Modeled on flygym ``tests/warp/test_simulation.py``: batched shapes, world-0
consistency vs single-world simulation, control inputs affecting joint angles
— but running on the CPU backend (no special hardware needed, unlike the
reference's GPU-required warp tests).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import flygym_tpu
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
)
from flygym_tpu.utils.math import Rotation3D

FLY = "batchfly"
N_WORLDS = 4


@pytest.fixture(scope="module")
def world():
    fly = Fly(name=FLY)
    skeleton = Skeleton(
        axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=JointPreset.LEGS_ONLY
    )
    fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)
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
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return world


@pytest.fixture(scope="module")
def bsim(world):
    return flygym_tpu.BatchSimulation(world, N_WORLDS)


class TestShapes:
    def test_batched_readouts(self, bsim):
        bsim.reset()
        bsim.step()
        assert bsim.get_joint_angles(FLY).shape == (N_WORLDS, 66)
        assert bsim.get_joint_velocities(FLY).shape == (N_WORLDS, 66)
        assert bsim.get_body_positions(FLY).shape == (N_WORLDS, 69, 3)
        assert bsim.get_body_rotations(FLY).shape == (N_WORLDS, 69, 4)
        found, forces, *_ = bsim.get_ground_contact_info(FLY)
        assert found.shape == (N_WORLDS, 6)
        assert forces.shape == (N_WORLDS, 6, 3)

    def test_time_is_world0(self, bsim):
        bsim.reset()
        bsim.step()
        assert bsim.time == pytest.approx(1e-4)


class TestConsistency:
    def test_world0_matches_single_sim(self, world, bsim):
        """The reference's world-0 vs CPU cross-check
        (tests/warp/test_simulation.py:239-251)."""
        bsim.reset()
        sim = flygym_tpu.Simulation(world)
        ctrl = np.ones(6, np.float32)
        bsim.set_leg_adhesion_states(FLY, np.broadcast_to(ctrl, (N_WORLDS, 6)))
        sim.set_leg_adhesion_states(FLY, ctrl)
        for _ in range(30):
            bsim.step()
            sim.step()
        batched = np.asarray(bsim.get_joint_angles(FLY))
        single = sim.get_joint_angles(FLY)
        assert np.allclose(batched[0], single, atol=1e-6)

    def test_identical_worlds_stay_identical(self, bsim):
        bsim.reset()
        for _ in range(20):
            bsim.step()
        angles = np.asarray(bsim.get_joint_angles(FLY))
        for w in range(1, N_WORLDS):
            assert np.array_equal(angles[0], angles[w])

    def test_per_world_control_diverges_worlds(self, bsim):
        bsim.reset()
        targets = np.zeros((N_WORLDS, 42), np.float32)
        targets[1] += 0.5  # world 1 gets different targets
        bsim.set_actuator_inputs(FLY, ActuatorType.POSITION, targets)
        for _ in range(50):
            bsim.step()
        angles = np.asarray(bsim.get_joint_angles(FLY))
        assert not np.allclose(angles[0], angles[1], atol=1e-3)
        assert np.allclose(angles[0], angles[2], atol=1e-6)


class TestBatchedRollout:
    def test_rollout_shapes_and_consistency(self, world):
        bsim = flygym_tpu.BatchSimulation(world, 2)
        traj = bsim.rollout(None, 25)
        assert traj.shape == (25, 2, bsim.model.nq)
        assert np.allclose(np.asarray(traj[:, 0]), np.asarray(traj[:, 1]))

    def test_parallel_perf_report(self, bsim):
        bsim.reset()
        for _ in range(2):
            bsim.step_with_profile()
        bsim.print_performance_report(show_in_notebook=False)

    def test_vmem_gated_fallback_rollout_auto_splits(self, world, monkeypatch):
        """VMEM-gated models fall back to the vmapped jnp path, whose XLA
        compile is pathological at large batch (204-DoF ALL_POSSIBLE at
        4096 worlds: >40 min on TPU, 2026-08-20). BatchSimulation.rollout
        must warn and split such rollouts into world chunks — and the
        chunked trajectory must equal the unchunked one exactly (worlds
        are independent)."""
        from flygym_tpu.ops import megastep as ms

        bsim = flygym_tpu.BatchSimulation(world, 6)
        ref = bsim.rollout(None, 10)
        ref_state = bsim.state

        bsim2 = flygym_tpu.BatchSimulation(world, 6)
        assert bsim2._megastep is None  # CPU backend: jnp fallback
        monkeypatch.setattr(ms, "vmem_gated", lambda m: True)
        monkeypatch.setenv("FLYGYM_TPU_FALLBACK_MAX_WORLDS", "2")
        with pytest.warns(UserWarning, match="chunks"):
            got = bsim2.rollout(None, 10)
        assert got.shape == ref.shape
        # Different batch shapes compile different XLA programs, so the
        # chunked run matches to fp-reassociation noise, not bitwise.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(bsim2.state.qpos), np.asarray(ref_state.qpos),
            atol=1e-9,
        )
        # Final qvel is settle noise (~1e-6 mm/s scale) — absolute bound.
        np.testing.assert_allclose(
            np.asarray(bsim2.state.qvel), np.asarray(ref_state.qvel),
            atol=1e-5, rtol=0,
        )
        # Cap=0 disables the fence.
        bsim3 = flygym_tpu.BatchSimulation(world, 6)
        monkeypatch.setenv("FLYGYM_TPU_FALLBACK_MAX_WORLDS", "0")
        assert bsim3._fallback_world_chunk() is None

    def test_k_fusion_clamped_to_vmem_gate(self, world, monkeypatch):
        """K-step fusion widens the kernel's double-buffered I/O windows
        ((K-1)*nu ctrl rows in, (K-1)*nq trajectory rows out), so rollout
        K selection must consult the K-aware VMEM estimate: the 204-DoF
        ALL_POSSIBLE kernel OOM'd on hardware at K=8 / 4096 worlds
        (133.88 MiB vs 128) while fitting at the clamped K. Estimates are
        faked here so the clamp logic is testable on a small model."""
        from flygym_tpu.ops import megastep as ms

        bsim = flygym_tpu.BatchSimulation(world, 2)
        dummy = lambda s: s
        dummy.interpret_mode = False
        monkeypatch.setattr(bsim, "_megastep", dummy)
        built = {}

        def fake_make(model, k_steps=1, **kw):
            built["k"] = k_steps
            fn = lambda *a, **k: None
            fn.k_steps = k_steps
            return fn

        monkeypatch.setattr(ms, "make_megastep", fake_make)
        monkeypatch.setattr(
            ms,
            "_est_scoped_mb",
            lambda model, h0_matvec=None, k_steps=1, sublanes=8: (
                ms._VMEM_GATE_MB - 1.0
                if k_steps <= 3
                else ms._VMEM_GATE_MB + 1.0
            ),
        )
        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_K", "8")
        # K=8 and K=4 exceed the gate; K=3 fits and divides n_steps=24.
        kfn = bsim._get_megastep_k(24)
        assert kfn is not None and built["k"] == 3
        # No K>1 fits -> fall back to the single-step kernel.
        bsim._megastep_k_fn = None
        monkeypatch.setattr(
            ms,
            "_est_scoped_mb",
            lambda model, h0_matvec=None, k_steps=1, sublanes=8: (
                ms._VMEM_GATE_MB + (1.0 if k_steps > 1 else -1.0)
            ),
        )
        assert bsim._get_megastep_k(24) is None


class TestSharding:
    def test_sharded_over_virtual_mesh(self, world):
        """Worlds shard over an 8-device CPU mesh (the multi-chip path)."""
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
        mesh = Mesh(np.array(devices[:8]), axis_names=("world",))
        bsim = flygym_tpu.BatchSimulation(world, 16, mesh=mesh)
        bsim.set_leg_adhesion_states(FLY, np.ones((16, 6), np.float32))
        for _ in range(3):
            bsim.step()
        angles = np.asarray(bsim.get_joint_angles(FLY))
        assert angles.shape == (16, 66)
        # Sharded result identical to unsharded.
        ref = flygym_tpu.BatchSimulation(world, 16)
        ref.set_leg_adhesion_states(FLY, np.ones((16, 6), np.float32))
        for _ in range(3):
            ref.step()
        assert np.allclose(angles, np.asarray(ref.get_joint_angles(FLY)), atol=1e-6)

    def test_mesh_sharded_megastep_wiring(self, world, monkeypatch):
        """Mesh-sharded runs route stepping through the Pallas mega-kernel
        via shard_map over the world axis (each device runs the kernel on
        its shard). Exercised on the virtual CPU mesh with the Pallas
        interpreter and a cheap mock emitter (the real ~2e5-op emitter is
        interpreter-prohibitive; its physics is covered by the emitter and
        on-TPU tests)."""
        import jax.numpy as jnp

        from flygym_tpu.ops import megastep as ms

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")

        def mock_emit(st, q, v, ctrl, act, warm, terrain=None, widx=None):
            z = jnp.zeros_like(q[0])
            return dict(
                qpos=[x + 1.0 for x in q],
                qvel=list(v),
                act=list(act),
                qacc=list(warm),
                xpos=[(z, z, z) for _ in range(st.nbody)],
                xquat=[(z + 1.0, z, z, z) for _ in range(st.nbody)],
                site_xpos=[(z, z, z) for _ in range(st.nsite)],
                actuator_force=[2.0 * c for c in ctrl],
                sensordata=[[z] * 16 for _ in range(st.nsensor)],
            )

        monkeypatch.setattr(ms, "emit_step", mock_emit)
        monkeypatch.setenv("FLYGYM_TPU_MEGASTEP_INTERPRET", "1")
        mesh = Mesh(np.array(devices[:8]), axis_names=("world",))
        bsim = flygym_tpu.BatchSimulation(world, 16, mesh=mesh)
        assert bsim._megastep is not None, "mesh run must use the mega-kernel"
        qpos0 = np.asarray(bsim.state.qpos)
        ctrl0 = np.asarray(bsim.state.ctrl)
        bsim.step()
        np.testing.assert_allclose(
            np.asarray(bsim.state.qpos), qpos0 + 1.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(bsim.state.actuator_force), 2.0 * ctrl0, atol=1e-6
        )
        # State stays sharded over the mesh after the kernel step.
        shd = bsim.state.qpos.sharding
        assert getattr(shd, "mesh", None) is not None

    def test_indivisible_worlds_raises(self, world):
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(devices[:8]), axis_names=("world",))
        with pytest.raises(ValueError):
            flygym_tpu.BatchSimulation(world, 12, mesh=mesh)


class TestShardedTerrainPlanes:
    """make_megastep_sharded threads precomputed terrain planes through
    shard_map (sample_planes attribute), so mesh rollouts get the same
    K-step plane-resampling amortization as single-chip ones."""

    def test_sample_planes_exposed_and_threaded(self, monkeypatch):
        import dataclasses

        import jax.numpy as jnp

        from flygym_tpu.compose import BlocksTerrainWorld
        from flygym_tpu.ops import megastep as ms

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")

        fly = Fly(name=FLY)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YAW_PITCH_ROLL,
                joint_preset=JointPreset.LEGS_ONLY,
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        w = BlocksTerrainWorld()
        w.add_fly(fly, (0, 0, 1.5), Rotation3D("quat", (1, 0, 0, 0)))
        model, state0 = w.compile()
        assert model.has_hfield

        def mock_emit(st, q, v, ctrl, act, warm, terrain=None, widx=None):
            # Terrain rows must arrive; fold the first plane height into
            # qpos so threading is observable.
            assert terrain is not None and len(terrain) == st.ncand
            h0 = terrain[0][0]
            z = jnp.zeros_like(q[0])
            return dict(
                qpos=[x + h0 + 1.0 for x in q],
                qvel=list(v),
                act=list(act),
                qacc=list(warm),
                xpos=[(z, z, z) for _ in range(st.nbody)],
                xquat=[(z + 1.0, z, z, z) for _ in range(st.nbody)],
                site_xpos=[(z, z, z) for _ in range(st.nsite)],
                actuator_force=[c for c in ctrl],
                sensordata=[[z] * 16 for _ in range(st.nsensor)],
            )

        monkeypatch.setattr(ms, "emit_step", mock_emit)
        mesh = Mesh(np.array(devices[:8]), axis_names=("world",))
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (16,) + x.shape), state0
        )
        mega = ms.make_megastep_sharded(model, mesh, "world", bstate,
                                        interpret=True)
        assert mega.sample_planes is not None
        planes = mega.sample_planes(bstate)
        assert planes.shape == (16, 4 * model.ncand)

        out_auto = mega(bstate)            # samples planes internally
        out_given = mega(bstate, planes)   # precomputed planes threaded
        np.testing.assert_allclose(
            np.asarray(out_auto.qpos), np.asarray(out_given.qpos), atol=1e-6
        )
        # The mock adds (candidate-0 plane height + 1) to every qpos entry,
        # so the exact planes the kernel received are observable.
        expected = np.asarray(bstate.qpos) + np.asarray(planes[:, 0:1]) + 1.0
        np.testing.assert_allclose(
            np.asarray(out_given.qpos), expected, atol=1e-6
        )


@pytest.mark.slow
class TestShardedKernelRealEmitter:
    """The REAL emit_step physics through the Pallas kernel under
    shard_map (VERDICT r3 #1): on a small real model (capsule drop,
    nv=6) the real emitter graph is interpretable, so the sharded and
    unsharded kernel episodes can be compared with no emitter
    substitution. Mirrors __graft_entry__.dryrun_multichip section 2."""

    def test_sharded_equals_unsharded_real_physics(self):
        import dataclasses

        import jax.numpy as jnp

        from flygym_tpu.engine.model import make_initial_state
        from flygym_tpu.ops import megastep as ms
        from flygym_tpu.parallel import make_world_mesh
        from tests.engine.test_stress_golden import _capsule_spec

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")

        model = _capsule_spec(drop_z=0.9).compile().model
        assert ms.megastep_supported(model)
        state0 = make_initial_state(model)
        B = 16
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)),
            state0,
        )
        # Straddle the contact (rest height 0.801): some worlds already in
        # contact, some in flight — shard/lane offset bugs cannot hide.
        bstate = dataclasses.replace(
            bstate, qpos=bstate.qpos.at[:, 2].set(jnp.linspace(0.78, 1.2, B))
        )

        mesh = make_world_mesh(devices[:8])
        kern_sharded = ms.make_megastep_sharded(
            model, mesh, "world", bstate, interpret=True
        )
        kern_ref = ms.make_megastep(model, interpret=True, jit=False)

        def episode(fn):
            def body(s, _):
                return fn(s), None

            return jax.jit(
                lambda s0: jax.lax.scan(body, s0, None, length=16)[0]
            )

        s_a = episode(kern_sharded)(bstate)
        s_b = episode(kern_ref)(bstate)
        np.testing.assert_array_equal(
            np.asarray(s_a.qpos), np.asarray(s_b.qpos)
        )
        np.testing.assert_array_equal(
            np.asarray(s_a.qvel), np.asarray(s_b.qvel)
        )
        assert getattr(s_a.qpos.sharding, "mesh", None) is not None
        # Real physics ran: contact worlds stay near rest, flight worlds
        # fell.
        z = np.asarray(s_a.qpos[:, 2])
        assert z[0] > 0.75 and z[-1] < 1.2

    def test_sharded_kstep_kernel_matches_sequential(self):
        """The K-step fused kernel under shard_map (the multi-chip rollout
        fast path, simulation._get_megastep_k on meshes): one sharded
        K=4 launch must equal 4 sequential unsharded kernel steps, with
        the (K, B, nq) trajectory world-sharded on dim 1."""
        import dataclasses

        import jax.numpy as jnp

        from flygym_tpu.engine.model import make_initial_state
        from flygym_tpu.ops import megastep as ms
        from flygym_tpu.parallel import make_world_mesh
        from tests.engine.test_stress_golden import _capsule_spec

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")

        model = _capsule_spec(drop_z=0.9).compile().model
        state0 = make_initial_state(model)
        B, K = 16, 4
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)),
            state0,
        )
        bstate = dataclasses.replace(
            bstate, qpos=bstate.qpos.at[:, 2].set(jnp.linspace(0.78, 1.2, B))
        )
        ctrl_seq = jnp.broadcast_to(
            bstate.ctrl[None], (K,) + bstate.ctrl.shape
        )

        mesh = make_world_mesh(devices[:8])
        kern_k = ms.make_megastep_sharded(
            model, mesh, "world", bstate, interpret=True, k_steps=K
        )
        assert kern_k.k_steps == K
        kern_1 = ms.make_megastep(model, interpret=True, jit=False)

        s_k, traj = kern_k(bstate, ctrl_seq)
        s_ref = bstate
        ref_traj = []
        for _ in range(K):
            s_ref = kern_1(s_ref)
            ref_traj.append(np.asarray(s_ref.qpos))

        np.testing.assert_allclose(
            np.asarray(s_k.qpos), np.asarray(s_ref.qpos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_k.qvel), np.asarray(s_ref.qvel), atol=1e-5
        )
        assert traj.shape == (K, B, model.nq)
        np.testing.assert_allclose(
            np.asarray(traj), np.stack(ref_traj), atol=1e-6
        )
