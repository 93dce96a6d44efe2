"""Tests for the tree-sparse LDLᵀ factorization against dense solves."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.engine import dynamics
from flygym_tpu.engine.kinematics import dof_subspace, kinematics_full
from flygym_tpu.engine.linalg import tree_ldl_factor, tree_ldl_solve
from flygym_tpu.utils.math import Rotation3D


@pytest.fixture(scope="module")
def model():
    fly = Fly(name="ldlfly")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    m, _ = world.compile()
    return m


def _mass_matrix(model, qpos):
    xpos, xquat, hinge_xaxis = kinematics_full(model, qpos)
    ref = xpos[model.ref_body]
    S = dof_subspace(model, xpos, hinge_xaxis, ref)
    I_body = dynamics.body_spatial_inertias(model, xpos, xquat, ref)
    M = dynamics.crba(model, I_body, S)
    return M + model.timestep * jnp.diag(model.dof_damping)


class TestTreeLDL:
    def test_structure_tables(self, model):
        anc = np.asarray(model.dof_anc)
        assert anc.shape[0] == model.nv
        # Free-joint dofs 1..5 chain under dof 0; a leg-tip dof has a long chain.
        chain_lens = (anc >= 0).sum(axis=1)
        assert chain_lens[0] == 0
        assert chain_lens.max() >= 10
        # Levels partition all dofs.
        heights = sorted(i for lvl in model.dof_height_levels for i in lvl)
        depths = sorted(i for lvl in model.dof_depth_levels for i in lvl)
        assert heights == list(range(model.nv))
        assert depths == list(range(model.nv))

    def test_solve_matches_dense(self, model):
        Mh = _mass_matrix(model, model.qpos0)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.normal(size=(model.nv,)), jnp.float32)
        factor = jax.jit(tree_ldl_factor, static_argnums=())(model, Mh)
        x = tree_ldl_solve(model, factor, b)
        x_dense = jnp.linalg.solve(Mh.astype(jnp.float64) if False else Mh, b)
        # Residual check is the robust criterion in fp32.
        res = np.asarray(Mh @ x - b)
        res_dense = np.asarray(Mh @ x_dense - b)
        assert np.abs(res).max() < 10 * max(np.abs(res_dense).max(), 1e-5)
        assert np.allclose(np.asarray(x), np.asarray(x_dense), rtol=2e-2, atol=1e-4)

    def test_solve_contact_hessian(self, model):
        """H = Mh + JᵀWJ with random contact rows along root-paths stays
        tree-sparse and solvable."""
        Mh = _mass_matrix(model, model.qpos0)
        rng = np.random.default_rng(1)
        # Build a fake contact-like rank update on a leg chain + root.
        anc = np.asarray(model.dof_anc)
        leaf = int(np.argmax((anc >= 0).sum(axis=1)))
        support = [leaf] + [int(a) for a in anc[leaf] if a >= 0]
        J = np.zeros((4, model.nv), np.float32)
        J[:, support] = rng.normal(size=(4, len(support)))
        W = np.abs(rng.normal(size=4)).astype(np.float32) * 100
        H = np.asarray(Mh) + (J.T * W) @ J
        b = jnp.asarray(rng.normal(size=(model.nv,)), jnp.float32)
        factor = tree_ldl_factor(model, jnp.asarray(H))
        x = tree_ldl_solve(model, factor, b)
        # Same-precision dense solve as the accuracy yardstick (the matrix is
        # deliberately ill-conditioned; compare methods, not exactness).
        x_dense = np.asarray(jnp.linalg.solve(jnp.asarray(H), b))
        res = np.abs(np.asarray(jnp.asarray(H) @ x - b)).max()
        res_dense = np.abs(H @ x_dense - np.asarray(b)).max()
        assert res < 10 * max(res_dense, 1e-4), (res, res_dense)

    def test_batched_via_vmap(self, model):
        Mh = _mass_matrix(model, model.qpos0)
        batch = jnp.stack([Mh, Mh * 1.5, Mh * 0.7])
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.normal(size=(3, model.nv)), jnp.float32)
        factor = jax.vmap(tree_ldl_factor, in_axes=(None, 0))(model, batch)
        x = jax.vmap(tree_ldl_solve, in_axes=(None, 0, 0))(model, factor, b)
        for i in range(3):
            res = np.asarray(batch[i] @ x[i] - b[i])
            assert np.abs(res).max() < 1e-3
