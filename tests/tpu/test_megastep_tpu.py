"""On-TPU smoke tests for the Pallas mega-step kernel.

Run with real hardware (the regular suite forces the CPU backend and skips
these):

    FLYGYM_TPU_TEST_BACKEND=tpu python -m pytest tests/tpu -m tpu -q

Compares the Mosaic-compiled kernel against the vmapped jnp step for a
128-world batch — the regression net for Mosaic lowering / sublane-packing
bugs that the CPU-side tests (emitter on (B,) arrays; pallas_call glue with a
mock emitter) cannot see.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":  # pragma: no cover - env-dependent
    pytest.skip("requires the TPU backend", allow_module_level=True)

from flygym_tpu.anatomy import ActuatedDOFPreset, AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.engine.step import step
from flygym_tpu.ops.megastep import make_megastep
from flygym_tpu.utils.math import Rotation3D

B = 128


@pytest.fixture(scope="module")
def flat_world_state():
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    fly.add_actuators(
        dofs, ActuatorType.POSITION, kp=50.0, neutral_input=KinematicPosePreset.NEUTRAL
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    model, state0 = world.compile()

    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    # Perturb controls per world so lanes are NOT identical — a lane/sublane
    # transposition bug would pass on a broadcast batch.
    key = jax.random.PRNGKey(0)
    ctrl = bstate.ctrl + 0.02 * jax.random.normal(key, bstate.ctrl.shape)
    bstate = dataclasses.replace(bstate, ctrl=ctrl.astype(jnp.float32))
    f = jax.jit(jax.vmap(lambda s: step(model, s)))
    # Settle on the ground with a scanned rollout: ONE compile + one device
    # call instead of 300 dispatches over the axon tunnel.
    from flygym_tpu.engine.step import rollout_batched

    nan_ctrl = jnp.full((300, B, model.nu), jnp.nan, jnp.float32)
    bstate, _ = rollout_batched(model, bstate, nan_ctrl, 300)
    mega = make_megastep(model)  # compiled once, shared by all tests
    return model, bstate, f, mega


class TestMegastepOnTPU:
    def test_kernel_matches_vmapped_step(self, flat_world_state):
        model, bstate, f, mega = flat_world_state
        got = jax.block_until_ready(mega(bstate))
        ref = f(bstate)
        # Host fetch is the only reliable sync on the axon backend.
        got_np = jax.tree_util.tree_map(np.asarray, got)
        ref_np = jax.tree_util.tree_map(np.asarray, ref)
        np.testing.assert_allclose(got_np.xpos, ref_np.xpos, atol=1e-4)
        np.testing.assert_allclose(got_np.qpos, ref_np.qpos, atol=1e-4)
        np.testing.assert_allclose(got_np.qvel, ref_np.qvel, atol=5e-2)
        np.testing.assert_allclose(
            got_np.actuator_force, ref_np.actuator_force, rtol=1e-3, atol=1e-3
        )
        # Contact forces: Mosaic's fp32 accumulation order differs from the
        # XLA step's matmul trees; near-cancelling Newton terms leave ~0.5%
        # relative noise on O(1) mN forces (measured 1.2e-2 max abs).
        np.testing.assert_allclose(
            got_np.contact_sensordata[..., :4],
            ref_np.contact_sensordata[..., :4],
            rtol=1e-2,
            atol=2e-2,
        )

    def test_kernel_world_permutation_equivariance(self, flat_world_state):
        """Permuting worlds permutes outputs — catches sublane/lane packing
        transpositions that identical-lane batches would hide."""
        model, bstate, _, mega = flat_world_state
        perm = np.random.RandomState(1).permutation(B)
        permuted = jax.tree_util.tree_map(lambda x: x[perm], bstate)
        out = mega(bstate)
        out_perm = mega(permuted)
        np.testing.assert_allclose(
            np.asarray(out.qpos)[perm], np.asarray(out_perm.qpos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out.contact_sensordata)[perm],
            np.asarray(out_perm.contact_sensordata),
            atol=1e-6,
        )

    def test_non_multiple_batch_padding(self, flat_world_state):
        """B not a multiple of the 1024-world block: pad/slice must be exact."""
        model, bstate, _, mega = flat_world_state
        small = jax.tree_util.tree_map(lambda x: x[:37], bstate)
        out_small = mega(small)
        out_full = mega(bstate)
        np.testing.assert_allclose(
            np.asarray(out_small.qpos),
            np.asarray(out_full.qpos)[:37],
            atol=1e-6,
        )


class TestPairRowsOnTPU:
    """Mosaic-compiled kernel with fly-fly capsule-capsule pair rows: one
    fly resting on another must match the vmapped jnp step."""

    @pytest.fixture(scope="class")
    def stacked_state(self):
        from flygym_tpu.anatomy import ContactBodiesPreset
        from flygym_tpu.engine.step import rollout_batched
        from flygym_tpu.ops.megastep import make_megastep, megastep_supported

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
        # 4 body capsules -> 16 uncompressed pair rows. The previous 7-seg
        # set (49 rows) measured 152.45 MiB of Mosaic scoped VMEM on
        # hardware (2026-08-19 OOM dump): an uncompressed pair row holds
        # two-body Jacobians over both flies' path-DoF unions, ~1.1 MiB of
        # register pressure each, so 16 rows (~117 MiB est) is the
        # in-budget stacking config.
        segs = [
            s
            for s in ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
            if s.name in ("c_thorax", "c_head", "c_abdomen12", "c_abdomen3")
        ]
        assert world.add_fly_fly_contacts("lo", "hi", bodysegs=segs) == 16
        model, state0 = world.compile()
        assert megastep_supported(model), model.ncand

        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
        )
        # Settle well past the drop-impact transient (~25 ms free fall +
        # bounce): at 250 steps |qvel| is still ~15 and fp-contraction
        # differences between Mosaic and XLA amplify through the contact
        # solve; at 600 steps the stack is quasi-static.
        nan_ctrl = jnp.full((600, B, model.nu), jnp.nan, jnp.float32)
        bstate, _ = rollout_batched(model, bstate, nan_ctrl, 600)
        mega = make_megastep(model)
        return model, bstate, mega

    def test_pair_kernel_matches_jnp(self, stacked_state):
        model, bstate, mega = stacked_state
        from flygym_tpu.engine.step import step as engine_step

        ref = jax.jit(jax.vmap(lambda s: engine_step(model, s)))(bstate)
        got = mega(bstate)
        np.testing.assert_allclose(
            np.asarray(got.xpos), np.asarray(ref.xpos), atol=5e-4
        )
        # qvel tolerance covers Mosaic-vs-XLA fp contraction/ordering noise
        # through the contact solve (sub-1% relative on residual motion).
        np.testing.assert_allclose(
            np.asarray(got.qvel), np.asarray(ref.qvel), atol=1e-1
        )


class TestKStepFusionOnTPU:
    """K-step fused kernel (make_megastep(k_steps=K)): K physics steps per
    kernel invocation must match K sequential 1-step kernel launches, and
    the emitted per-step qpos trajectory must match step by step."""

    def test_kstep_matches_sequential(self, flat_world_state):
        from flygym_tpu.ops.megastep import make_megastep

        model, bstate, _, mega = flat_world_state
        K = 8
        kk = make_megastep(model, k_steps=K)
        rng = np.random.RandomState(2)
        ctrl_seq = jnp.asarray(
            np.asarray(bstate.ctrl)[None]
            + 0.01 * rng.randn(K, B, model.nu).astype(np.float32)
        )
        s = bstate
        traj_ref = []
        for k in range(K):
            s = mega(dataclasses.replace(s, ctrl=ctrl_seq[k]))
            traj_ref.append(np.asarray(s.qpos))
        s2, traj = kk(bstate, ctrl_seq)
        traj = np.asarray(traj)
        assert traj.shape == (K, B, model.nq)
        for k in range(K):
            # Same op sequence on the same values; only Mosaic scheduling
            # differences between the loop body and the straight-line
            # kernel can introduce ulp-level noise.
            np.testing.assert_allclose(traj[k], traj_ref[k], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s2.qpos), traj_ref[-1], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s2.qvel), np.asarray(s.qvel), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(s2.contact_sensordata[..., :4]),
            np.asarray(s.contact_sensordata[..., :4]),
            rtol=1e-2,
            atol=2e-2,
        )


class TestStrictModeOnTPU:
    """Strict exact-Newton mode in-kernel (re-factor per iteration) vs the
    engine's jnp exact path."""

    def test_strict_kernel_matches_jnp(self):
        from flygym_tpu.engine.step import rollout_batched
        from flygym_tpu.ops.megastep import make_megastep, megastep_supported

        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        world = FlatGroundWorld()
        world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
        world.spec.options["solver_exact"] = True
        world.spec.options["solver_iterations"] = 10
        model, state0 = world.compile()
        assert model.solver_exact and megastep_supported(model)

        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
        )
        nan_ctrl = jnp.full((600, B, model.nu), jnp.nan, jnp.float32)
        bstate, _ = rollout_batched(model, bstate, nan_ctrl, 600)
        mega = make_megastep(model)
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        got = mega(bstate)
        np.testing.assert_allclose(
            np.asarray(got.xpos), np.asarray(ref.xpos), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.qpos), np.asarray(ref.qpos), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.qvel), np.asarray(ref.qvel), atol=5e-2
        )


class TestCompressedPairsOnTPU:
    """Pair-compressed two-fly contacts through the REAL Mosaic kernel: the
    winner-blended compressed rows must compile within the model's VMEM
    limit and reproduce the jnp engine step (which re-selects winners
    in-step) from a quiescent stacking state.

    The FULL fly-fly preset (55x55 segments -> 55 winner rows) is
    kernel-supported again as of 2026-08-20: the winner-INDEX-row
    redesign (eq one-hots became lazy in-kernel compares, ~2.9k mask
    rows instead of ~5.8k) plus the stream-rescue emitter choice bring
    its estimate under the gate (fused alone still exceeds it; history:
    248.96 MiB measured 2026-08-19 with in-kernel mask rebuilds).
    Hardware coverage of the winner-blend path uses a 7x7 subset (thorax
    + the six tarsal tips, the segments that actually carry a stacked
    fly), comfortably within budget; scripts/dev/validate_twofly_kernel
    --full drives the 55x55 compile itself."""

    @staticmethod
    def _mkfly(name):
        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR,
                joint_preset=JointPreset.LEGS_ONLY,
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        return fly

    @classmethod
    def _two_fly_world(cls):
        world = FlatGroundWorld()
        world.add_fly(
            cls._mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0))
        )
        world.add_fly(
            cls._mkfly("b"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0))
        )
        return world

    def test_full_preset_stream_rescued_onto_kernel(self):
        # Round-4 history: 55 winner rows compiled to 248.96 MiB of
        # scoped VMEM with in-kernel mask rebuilds (measured 2026-08-19)
        # and stayed gated even as precomputed input rows (~5.8k of
        # them). The 2026-08-20 winner-INDEX-row redesign (eq one-hots
        # are lazy in-kernel compares; ~2.9k rows) plus the stream-
        # rescue emitter choice bring the estimate under the gate, so
        # the preset runs in-kernel again — streaming, fused still gated.
        import flygym_tpu.ops.megastep as ms

        world = self._two_fly_world()
        assert world.add_fly_fly_contacts("a", "b") == 3025
        model, _ = world.compile()
        assert model.pair_compress
        assert ms._est_scoped_mb(model) > ms._VMEM_GATE_MB
        assert ms._stream_mode(model)
        assert ms.megastep_supported(model)

    def test_compressed_kernel_matches_jnp(self):
        from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment
        from flygym_tpu.engine.step import rollout_batched
        from flygym_tpu.ops.megastep import megastep_supported

        world = self._two_fly_world()
        segs = ["c_thorax"] + [
            n for n in ALL_SEGMENT_NAMES if n.endswith("tarsus5")
        ]
        n_pairs = world.add_fly_fly_contacts(
            "a", "b", bodysegs=[BodySegment(s) for s in segs]
        )
        assert n_pairs == 49
        world._spec.options["pair_compress"] = True
        model, state0 = world.compile()
        assert model.pair_compress and megastep_supported(model)

        Bp = 128
        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (Bp,) + x.shape), state0
        )
        # Diversify the worlds: broadcasting makes 128 IDENTICAL copies,
        # so one contact row at its activation edge poisons every world
        # at once (solref stiffness amplifies Mosaic-vs-XLA fp noise in
        # dist into an O(g*dt) flip; pinning winners cannot remove a
        # row's own on/off edge — measured 2026-08-20). Tens-of-microns
        # per-world offsets decorrelate tie-breaking WITHOUT
        # destabilizing the stack (0.15 mm made it slide: every world
        # ended near an edge with contact-force-scale deltas).
        nq1 = model.free_joints[1][1]
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        qpos = (
            bstate.qpos.at[:, nq1 + 0]
            .add(jax.random.uniform(kx, (Bp,), minval=-0.02, maxval=0.02))
            .at[:, nq1 + 1]
            .add(jax.random.uniform(ky, (Bp,), minval=-0.02, maxval=0.02))
        )
        bstate = dataclasses.replace(bstate, qpos=qpos)
        # Settle the stack to quiescence on the jnp path (fly b rests on a).
        nan_ctrl = jnp.full((1500, Bp, max(model.nu, 1)), jnp.nan, jnp.float32)
        nan_ctrl = nan_ctrl[:, :, : model.nu]
        bstate, _ = rollout_batched(model, bstate, nan_ctrl, 1500)
        mega = make_megastep(model)

        # PRIMARY: kernel vs the ENGINE step fed the SAME winner indices
        # (step(..., widx=...)) — isolates Mosaic lowering from winner-
        # selection timing. The winners are sampled ONCE and fed to BOTH
        # sides (expand_winners -> terrain_planes): separate XLA
        # compilations of the argmin can break a symmetric resting-stack
        # tie differently at fp-reassociation scale (measured
        # 2026-08-20). NOTE: jitting the eager EMITTER as the reference
        # is not viable on hardware — its ~1e5-op XLA graph SIGKILLs the
        # remote tpu_compile_helper (measured twice, 2026-08-20); the
        # pinned-winner engine step compiles the same graph class the
        # settle already used.
        from flygym_tpu.engine.contact import make_pair_winner_sampler

        widx_b = make_pair_winner_sampler(model)(bstate.xpos, bstate.xquat)
        got = mega(bstate, terrain_planes=mega.expand_winners(widx_b))
        got_q = np.asarray(got.qpos)

        @jax.jit
        def emit_ref(s):
            out = jax.vmap(
                lambda sw, w: step(model, sw, widx=w), in_axes=(0, 0)
            )(s, widx_b)
            return out.qpos, out.qvel

        eq, ev = emit_ref(bstate)
        g = float(np.abs(np.asarray(model.gravity)).max())
        dt = float(model.timestep)
        one_step_flip_bound = 3.0 * g * dt  # = 2.94 mm/s at 9810, 1e-4
        # CONTROL — CONDITIONING PROBE. The settled stack RINGS against
        # its stiff solref contacts (qvel ~1.2 mm/s steady state) and
        # the one-step map there is ill-conditioned: measured Lipschitz
        # ~4e4 in qvel (2026-08-20: 1e-5 relative state noise -> 1.36
        # qvel). Mosaic's approximate div/rsqrt inject ~1e-5 relative
        # noise through the FK->CRBA->LDL->Newton chain, so the kernel
        # is gated at the probe's amplification of that budget, not an
        # absolute atol (round 4's "winner-flip envelope" readings were
        # this conditioning, not winner flips).
        eps = 1e-5
        kq_, kv_ = jax.random.split(jax.random.PRNGKey(42))
        pert = dataclasses.replace(
            bstate,
            qpos=bstate.qpos
            * (1.0 + eps * jax.random.normal(kq_, bstate.qpos.shape)),
            qvel=bstate.qvel
            + eps * jax.random.normal(kv_, bstate.qvel.shape),
        )
        pq, pv = emit_ref(pert)
        amp_q = float(np.abs(np.asarray(pq) - np.asarray(eq)).max())
        amp_v = float(np.abs(np.asarray(pv) - np.asarray(ev)).max())
        dq_w = np.abs(got_q - np.asarray(eq)).max(axis=1)
        dv_w = np.abs(np.asarray(got.qvel) - np.asarray(ev)).max(axis=1)
        assert dq_w.max() <= max(3e-5, 3.0 * amp_q), (dq_w.max(), amp_q)
        assert dv_w.max() <= max(5e-2, 3.0 * amp_v), (dv_w.max(), amp_v)

        # SECONDARY: vs the jnp engine, which re-selects winners IN-STEP
        # from fresh FK. On the symmetric resting stack that argmin can
        # sit on a tie; a flip (un)supports the segment for one step.
        # DERIVED transient bound: the flipped row drops at most the
        # segment's share of the contact force, so the one-step qvel
        # error is bounded by the free-fall increment g*dt times a
        # lever/mass-ratio factor; C=3 covers the measured flip envelope
        # (1.18-1.31 = 1.2-1.4 g*dt across settles, 2026-08-20) with
        # margin, instead of the old uncalibrated atol=2.0.
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        np.testing.assert_allclose(got_q, np.asarray(ref.qpos), atol=3e-3)
        dv = np.abs(np.asarray(got.qvel) - np.asarray(ref.qvel))
        assert dv.max() <= max(one_step_flip_bound, 3.0 * amp_v), (
            dv.max(),
            one_step_flip_bound,
            amp_v,
        )
        # TRAJECTORY: the check one-step conditioning cannot fake. Roll
        # both paths forward (each with its own winner selection) — they
        # must stay on the same attractor; an actual kernel error of the
        # magnitude the raw one-step deltas suggest would blow the stack
        # apart within a few hundred steps.
        n_decay = 200
        nanc = jnp.full(
            (n_decay, Bp, max(model.nu, 1)), jnp.nan, jnp.float32
        )[:, :, : model.nu]
        ref_T, _ = rollout_batched(model, bstate, nanc, n_decay)
        spl = mega.sample_planes

        @jax.jit
        def decay_rollout(s0):
            def body(s, _):
                return mega(s, terrain_planes=spl(s)), None

            out, _ = jax.lax.scan(body, s0, None, length=n_decay)
            return out

        kstate = decay_rollout(got)
        dq_T = np.abs(np.asarray(kstate.qpos) - np.asarray(ref_T.qpos))
        v_k = float(np.abs(np.asarray(kstate.qvel)).max())
        v_r = float(np.abs(np.asarray(ref_T.qvel)).max())
        # The stacked config is MARGINALLY STABLE (sustains a contact
        # ring, never settles; over 2000 steps the engine's ring grows
        # 1.18 -> 15.7 mm/s and positions wander ~72 um — measured
        # 2026-08-20). Honest bounds: same configuration neighborhood,
        # ring bounded, pile supported.
        assert dq_T.max() <= 0.1, dq_T.max()  # ~10x the 2000-step wander rate
        assert v_k <= max(20.0, 2.0 * v_r), (v_k, v_r)
        z_k = float(np.asarray(kstate.qpos)[:, nq1 + 2].min())
        assert z_k > 1.0, z_k
        # Fly b is SUPPORTED by compressed fly-fly rows, not fallen through.
        zb = float(got_q[0, model.free_joints[1][1] + 2])
        assert zb > 1.0, zb


class TestShardedKernelOnTPU:
    """make_megastep_sharded on a REAL (1-device) TPU mesh: the jitted
    shard_map wrapping must Mosaic-compile and match the unsharded kernel,
    in both single-step and K-fused forms (the multi-chip rollout path)."""

    @pytest.fixture(scope="class")
    def capsule_setup(self):
        from flygym_tpu.engine.model import make_initial_state
        from flygym_tpu.parallel import make_world_mesh
        from tests.engine.test_stress_golden import _capsule_spec

        model = _capsule_spec(drop_z=0.9).compile().model
        state0 = make_initial_state(model)
        Bk = 16
        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (Bk,) + jnp.shape(x)),
            state0,
        )
        bstate = dataclasses.replace(
            bstate, qpos=bstate.qpos.at[:, 2].set(jnp.linspace(0.78, 1.2, Bk))
        )
        mesh = make_world_mesh(jax.devices()[:1])
        return model, bstate, mesh

    def test_sharded_matches_unsharded(self, capsule_setup):
        from flygym_tpu.ops.megastep import make_megastep, make_megastep_sharded

        model, bstate, mesh = capsule_setup
        kern_s = make_megastep_sharded(model, mesh, "world", bstate)
        kern_u = make_megastep(model)
        s_a, s_b = kern_s(bstate), kern_u(bstate)
        np.testing.assert_allclose(
            np.asarray(s_a.qpos), np.asarray(s_b.qpos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_a.qvel), np.asarray(s_b.qvel), atol=1e-5
        )

    def test_sharded_kstep_matches_sequential(self, capsule_setup):
        from flygym_tpu.ops.megastep import make_megastep, make_megastep_sharded

        model, bstate, mesh = capsule_setup
        K = 4
        kern_k = make_megastep_sharded(
            model, mesh, "world", bstate, k_steps=K
        )
        kern_1 = make_megastep(model)
        ctrl_seq = jnp.broadcast_to(
            bstate.ctrl[None], (K,) + bstate.ctrl.shape
        )
        s_k, traj = kern_k(bstate, ctrl_seq)
        s_ref = bstate
        for _ in range(K):
            s_ref = kern_1(s_ref)
        np.testing.assert_allclose(
            np.asarray(s_k.qpos), np.asarray(s_ref.qpos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_k.qvel), np.asarray(s_ref.qvel), atol=1e-3
        )
        assert traj.shape == (K, bstate.qpos.shape[0], model.nq)
        np.testing.assert_allclose(
            np.asarray(traj[-1]), np.asarray(s_k.qpos), atol=1e-6
        )


class TestAllPossibleOnTPU:
    """The 204-DoF ALL_POSSIBLE preset through the REAL Mosaic kernel.

    The deep single tree (nv=210, 3,408 mass-matrix tree pairs) only fits
    VMEM in H0-matvec mode (M·x recovered from the frozen LDL factor so Mh
    dies after the Hessian fill) — hardware-validated 2026-08-20
    (|dqpos| 1.6e-06 vs the jnp engine at B=128; see
    scripts/dev/validate_204_kernel.py). The first compile takes ~10 min
    on a fresh machine, so this class is gated behind
    FLYGYM_TPU_TEST_BIGMODELS=1 to keep the default tpu smoke tier fast.
    """

    pytestmark = pytest.mark.skipif(
        os.environ.get("FLYGYM_TPU_TEST_BIGMODELS") != "1",
        reason="10-min Mosaic compile; set FLYGYM_TPU_TEST_BIGMODELS=1",
    )

    def test_204dof_kernel_matches_jnp(self):
        from flygym_tpu.engine.step import rollout_batched
        from flygym_tpu.ops import megastep as ms

        fly = Fly(name="f")
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR,
                joint_preset=JointPreset.ALL_POSSIBLE,
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_leg_adhesion()
        world = FlatGroundWorld()
        world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
        model, state0 = world.compile()
        assert ms._use_h0_matvec(model) and ms.megastep_supported(model)

        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
        )
        nan_ctrl = jnp.full((300, B, model.nu), jnp.nan, jnp.float32)
        bstate, _ = rollout_batched(model, bstate, nan_ctrl, 300)
        mega = ms.make_megastep(model)
        got = mega(bstate)
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        np.testing.assert_allclose(
            np.asarray(got.qpos), np.asarray(ref.qpos), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.qvel), np.asarray(ref.qvel), atol=0.5
        )
