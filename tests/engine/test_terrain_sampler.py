"""Equality tests for the heightfield plane samplers (engine/terrain.py).

The mega-step kernel's terrain path takes per-candidate local ground
planes sampled out-of-kernel; three interchangeable samplers exist
(full-grid one-hot, flat gather, windowed one-hot — the perf default).
These tests pin them against each other and against the engine's
``ground_height_normal`` (the jnp contact path), so swapping the method
can never change physics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import BlocksTerrainWorld, Fly, KinematicPosePreset
from flygym_tpu.engine.maths import quat_mul, quat_rotate
from flygym_tpu.engine.terrain import candidate_group_windows, make_plane_sampler
from flygym_tpu.utils.math import Rotation3D


@pytest.fixture(scope="module")
def model_and_states():
    fly = Fly(name="ts")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    world = BlocksTerrainWorld(rng_seed=3)
    world.add_fly(fly, (0, 0, 1.5), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()

    # Batched poses at different spots on the grid (incl. near an edge),
    # tilted, so candidates land in different cells per world.
    rng = np.random.default_rng(0)
    B = 4
    xpos = np.broadcast_to(np.asarray(state.xpos), (B,) + state.xpos.shape).copy()
    xquat = np.broadcast_to(np.asarray(state.xquat), (B,) + state.xquat.shape).copy()
    offsets = np.array(
        [[0.0, 0.0], [7.3, -4.1], [-38.0, -38.0], [17.9, 22.4]], np.float32
    )
    xpos[..., :2] += offsets[:, None]
    xpos[..., 2] += rng.uniform(-0.1, 0.4, size=(B, xpos.shape[1])).astype(np.float32)
    return model, jnp.asarray(xpos), jnp.asarray(xquat)


def test_methods_agree(model_and_states):
    model, xpos, xquat = model_and_states
    ref = np.asarray(make_plane_sampler(model, "onehot")(xpos, xquat))
    # take/window/window_gather select exact grid values; onehot_bf16
    # rounds the height grid to bf16 (<= 2^-9 relative) which also leaks
    # into the cell-gradient normals.
    for method, atol in (
        ("take", 2e-4),
        ("window", 2e-4),
        ("window_gather", 2e-4),
        ("onehot_bf16", 2e-2),
    ):
        out = np.asarray(make_plane_sampler(model, method)(xpos, xquat))
        np.testing.assert_allclose(out, ref, rtol=0, atol=atol, err_msg=method)


def test_auto_picks_window_on_blocks(model_and_states):
    model, _, _ = model_and_states
    sampler = make_plane_sampler(model)
    assert sampler.method == "window"
    # Static spread bound comfortably under the 320-cell grid.
    for cand_idx, (Wy, Wx) in sampler.groups:
        assert Wy * 2 <= model.hfield_data.shape[0]
        assert Wx * 2 <= model.hfield_data.shape[1]
        assert len(cand_idx) > 0


def test_matches_ground_height_normal(model_and_states):
    """The sampler's (h, n) equals the jnp contact path's bilinear sample
    evaluated at the same candidate endpoints."""
    from flygym_tpu.engine.contact import ground_height_normal

    model, xpos, xquat = model_and_states
    out = np.asarray(make_plane_sampler(model, "window")(xpos, xquat))

    gb = model.geom_body[model.can_geom]
    gpos = xpos[:, gb] + quat_rotate(xquat[:, gb], model.geom_pos[model.can_geom])
    gquat = quat_mul(xquat[:, gb], model.geom_quat[model.can_geom])
    zax = quat_rotate(gquat, jnp.array([0.0, 0.0, 1.0], jnp.float32))
    halflen = model.geom_size[model.can_geom, 1]
    ep = gpos + (model.can_end * halflen)[None, :, None] * zax
    h, n = ground_height_normal(model, ep[..., :2])
    np.testing.assert_allclose(out[..., 0], np.asarray(h), atol=2e-4)
    np.testing.assert_allclose(out[..., 1:], np.asarray(n), atol=2e-4)


def test_group_windows_cover_candidate_spread(model_and_states):
    """The static W bound must cover the measured candidate spread with
    margin at every tested pose (the windowed sampler's correctness
    precondition)."""
    model, xpos, xquat = model_and_states
    gb = model.geom_body[model.can_geom]
    gpos = xpos[:, gb] + quat_rotate(xquat[:, gb], model.geom_pos[model.can_geom])
    gquat = quat_mul(xquat[:, gb], model.geom_quat[model.can_geom])
    zax = quat_rotate(gquat, jnp.array([0.0, 0.0, 1.0], jnp.float32))
    halflen = model.geom_size[model.can_geom, 1]
    ep = np.asarray(gpos + (model.can_end * halflen)[None, :, None] * zax)
    cell = float(np.asarray(model.hfield_cell).min())
    for cand_idx, (Wy, Wx) in candidate_group_windows(model):
        xy = ep[:, cand_idx, :2]
        spread = (xy.max(axis=1) - xy.min(axis=1)).max() / cell
        assert spread + 3 < min(Wy, Wx)


def test_nonsquare_grid_window_coverage():
    """ADVICE r3: on a strongly non-square grid where the reach bound
    exceeds the SHORT dim, a forced window sampler must still produce the
    onehot reference heights — the window clamps per axis, never shrinking
    coverage along the long axis."""
    from flygym_tpu.compose import HeightfieldTerrainWorld

    # 25 x 257 grid (y short, x long): ~6 x 64 mm at 4 cells/mm.
    rng = np.random.default_rng(7)
    H = rng.uniform(0.0, 0.5, size=(25, 257)).astype(np.float32)
    fly = Fly(name="nsq")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    world = HeightfieldTerrainWorld(
        heights=H, xy0=(-32.0, -3.0), cell=(0.25, 0.25)
    )
    world.add_fly(fly, (0, 0, 1.5), Rotation3D("quat", (1, 0, 0, 0)))
    model, state = world.compile()

    # The fly's reach bound (W = 32 cells) exceeds the short (y) dim of
    # 25 — exactly the case the old square min-clamp corrupted.
    groups = candidate_group_windows(model)
    assert any(wy == 25 and wx > 25 for _c, (wy, wx) in groups), groups

    B = 3
    xpos = np.broadcast_to(np.asarray(state.xpos), (B,) + state.xpos.shape).copy()
    xquat = np.broadcast_to(
        np.asarray(state.xquat), (B,) + state.xquat.shape
    ).copy()
    xpos[..., 0] += np.array([0.0, 20.0, -25.0], np.float32)[:, None]
    xpos, xquat = jnp.asarray(xpos), jnp.asarray(xquat)

    ref = np.asarray(make_plane_sampler(model, "onehot")(xpos, xquat))
    win = np.asarray(make_plane_sampler(model, "window")(xpos, xquat))
    np.testing.assert_allclose(win, ref, atol=2e-4)
