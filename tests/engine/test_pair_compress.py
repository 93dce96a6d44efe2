"""Nearest-neighbor pair compression (PhysicsModel.pair_compress).

The default two-fly fly-fly contact preset emits 55x55 = 3,025
capsule-capsule pair rows; compression reduces that to one row per geom1
(its closest geom2) before the solver, making the model tractable for
both the jnp solver and the mega-step kernel. These tests pin: (a) the
compile-time auto gate and group table, (b) bit-equality with the
uncompressed model when no fly-fly contact is near (the selection can
only matter when pairs activate), and (c) physical sanity + bounded
divergence in an actual stacking contact scene.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D


def _mkfly(name):
    fly = Fly(name=name)
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    return fly


def _two_fly_world(dz, compress=None):
    world = FlatGroundWorld()
    world.add_fly(_mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(_mkfly("b"), (0, 0, 1.2 + dz), Rotation3D("quat", (1, 0, 0, 0)))
    n = world.add_fly_fly_contacts("a", "b")
    assert n == 3025
    if compress is not None:
        world._spec.options["pair_compress"] = compress
    return world


class TestCompileGate:
    def test_auto_compresses_default_preset(self):
        model, _ = _two_fly_world(dz=2.0).compile()
        assert model.pair_compress
        assert model.ncand_pair == 3025
        assert len(model.pair_groups) == 55
        assert all(size == 55 for _, size in model.pair_groups)
        # Groups tile the pair-row range contiguously.
        ends = [s + n for s, n in model.pair_groups]
        starts = [s for s, _ in model.pair_groups]
        assert starts[0] == 0 and ends[-1] == 3025
        assert starts[1:] == ends[:-1]
        # ncon sized from the EFFECTIVE candidate count.
        assert model.ncon == 32

    def test_small_sets_stay_exact(self):
        from flygym_tpu.anatomy import ContactBodiesPreset

        world = FlatGroundWorld()
        world.add_fly(_mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
        world.add_fly(_mkfly("b"), (0, 0, 3.2), Rotation3D("quat", (1, 0, 0, 0)))
        segs = [
            s
            for s in ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD.to_body_segments_list()
            if "thorax" in s.name
        ]
        world.add_fly_fly_contacts("a", "b", bodysegs=segs)
        model, _ = world.compile()
        assert not model.pair_compress

    def test_explicit_override(self):
        model, _ = _two_fly_world(dz=2.0, compress=False).compile()
        assert not model.pair_compress


class TestSemantics:
    def test_bit_equal_when_pairs_inactive(self):
        """Flies far apart: no pair row is ever near activation, so the
        compressed and full models must produce identical trajectories
        (the ground rows dominate the top-K in both)."""
        mc, sc = _two_fly_world(dz=30.0).compile()
        mf, sf = _two_fly_world(dz=30.0, compress=False).compile()
        assert mc.ncon == mf.ncon  # same solver shapes
        stepc = jax.jit(lambda s: step(mc, s))
        stepf = jax.jit(lambda s: step(mf, s))
        for _ in range(30):
            sc = stepc(sc)
            sf = stepf(sf)
        np.testing.assert_array_equal(np.asarray(sc.qpos), np.asarray(sf.qpos))

    def test_stacking_scene_stays_physical(self):
        """Fly b dropped onto fly a: with compression the top fly must be
        supported by fly-fly contacts (not fall through) and stay finite;
        divergence vs the full pair set stays bounded over the impact."""
        mc, sc = _two_fly_world(dz=1.8).compile()
        mf, sf = _two_fly_world(dz=1.8, compress=False).compile()
        stepc = jax.jit(lambda s: step(mc, s))
        stepf = jax.jit(lambda s: step(mf, s))
        nq1 = mc.nq // 2
        for _ in range(120):
            sc = stepc(sc)
            sf = stepf(sf)
        zc = float(sc.qpos[nq1 + 2])
        zf = float(sf.qpos[nq1 + 2])
        assert np.isfinite(np.asarray(sc.qpos)).all()
        assert zc > 1.0, f"top fly fell through (z={zc})"
        # Same supported height to within a contact-softness envelope.
        assert abs(zc - zf) < 0.1, (zc, zf)


def test_kernel_gate_matches_engine_semantics():
    """VMEM gating of pair rows (hardware-calibrated): the full
    3,025-row UNCOMPRESSED pair set stays gated off the kernel on VMEM
    grounds (both emitters blow the budget at ~1.1 MiB of fused register
    pressure / 38 stream lanes per candidate row x 3,245 rows). The
    COMPRESSED 55x55 preset, gated out through round 4, is kernel-
    supported again as of 2026-08-20: the winner-index-row redesign (eq
    one-hots became lazy in-kernel compares, halving the mask-row I/O
    from ~5.8k to ~2.9k rows) plus the stream-rescue emitter choice
    bring its estimate under the gate — fused still exceeds it, so the
    gate resolves to the STREAMING emitter (same _contacts_impl math,
    smaller live set)."""
    import flygym_tpu.ops.megastep as ms

    mc, _ = _two_fly_world(dz=2.0).compile()
    mf, _ = _two_fly_world(dz=2.0, compress=False).compile()
    assert not ms.megastep_supported(mf)
    assert mc.pair_compress
    # Fused alone would gate; streaming only fits at the NARROW 4-sublane
    # block (hardware-validated 2026-08-20: 131.89 MiB at 8 sublanes,
    # compiled+ran at 4); the rescue takes stream + narrow.
    assert ms._est_scoped_mb(mc) > ms._VMEM_GATE_MB
    assert ms._est_stream_mb(mc) > ms._VMEM_GATE_MB  # 8 sublanes: too big
    assert ms._est_stream_mb(mc, sublanes=4) <= ms._VMEM_GATE_MB
    assert ms._stream_mode(mc)
    assert ms._kernel_sublanes(mc) == 4
    assert ms.megastep_supported(mc)
    # Forcing fused restores the round-4 gating semantics.
    import os

    os.environ["FLYGYM_TPU_MEGASTEP_STREAM"] = "0"
    try:
        assert not ms.megastep_supported(mc)
    finally:
        del os.environ["FLYGYM_TPU_MEGASTEP_STREAM"]


class TestKernelCompressedRows:
    """The mega-step emitter's compressed pair rows (one row per geom1
    group, geom2 blended from the out-of-kernel winner index) vs the jnp
    engine, which re-selects winners in-step. From a settled stacking
    state both selections agree (capsules move ~1e-3 mm/step), so the
    constrained step must match to fp-reassociation noise."""

    @pytest.fixture(scope="class")
    def settled_stack(self):
        model, state0 = _two_fly_world(dz=1.8).compile()
        assert model.pair_compress
        B = 2
        bstate = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
        )
        f = jax.jit(jax.vmap(lambda s: step(model, s)))
        for _ in range(250):
            bstate = f(bstate)
        return model, bstate

    def test_emitter_matches_engine(self, settled_stack):
        from flygym_tpu.engine.contact import make_pair_winner_sampler
        from flygym_tpu.ops import megastep as ms

        model, bstate = settled_stack
        st = ms._Static(model)
        assert st.ncand == model.ncand - model.ncand_pair + len(
            model.pair_groups
        )
        widx_b = make_pair_winner_sampler(model)(bstate.xpos, bstate.xquat)
        widx = [widx_b[:, g] for g in range(widx_b.shape[1])]
        cols = lambda x: [x[:, i] for i in range(x.shape[1])]
        r = ms.emit_step(
            st,
            cols(bstate.qpos),
            cols(bstate.qvel),
            cols(bstate.ctrl),
            cols(bstate.act),
            cols(bstate.qacc),
            None,
            widx,
        )
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        got_qpos = np.asarray(jnp.stack(r["qpos"], axis=1))
        got_qvel = np.asarray(jnp.stack(r["qvel"], axis=1))
        np.testing.assert_allclose(got_qpos, np.asarray(ref.qpos), atol=3e-4)
        np.testing.assert_allclose(got_qvel, np.asarray(ref.qvel), atol=3e-2)
        # The upper fly is supported by compressed fly-fly rows: its root z
        # stays well above the ground-rest height.
        hi_qadr = model.free_joints[1][1]
        assert float(got_qpos[0, hi_qadr + 2]) > 1.0
