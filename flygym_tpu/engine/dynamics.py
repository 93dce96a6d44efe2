"""Mass matrix (CRBA) and bias forces (RNEA) as dense masked matmuls.

TPU-first design: instead of the pointer-chasing backward accumulation the
MuJoCo C engine uses (``mj_crb`` / ``mj_rne`` behind the reference's
``mj_step``, flygym ``simulation.py:76``), subtree sums are expressed as
matmuls with a precomputed (nbody × nbody) subtree mask and the mass matrix as
an (nv × 6) @ (6 × nv) product masked by DoF ancestry — large dense ops that
map straight onto the MXU and batch perfectly under ``vmap``.

All spatial quantities are world-axis Plücker vectors referenced at the fly
root (see kinematics.py).
"""

import jax.numpy as jnp

from flygym_tpu.engine.maths import (
    force_cross,
    quat_mul,
    quat_rotate,
    quat_to_mat,
    spatial_inertia,
)
from flygym_tpu.engine.model import PhysicsModel

__all__ = ["body_spatial_inertias", "crba", "rnea_bias", "passive_forces"]


def body_spatial_inertias(
    model: PhysicsModel,
    xpos: jnp.ndarray,
    xquat: jnp.ndarray,
    ref: jnp.ndarray,
) -> jnp.ndarray:
    """Per-body 6x6 spatial inertia about the reference point: (nbody, 6, 6)."""
    iquat_world = quat_mul(xquat, model.body_iquat)
    R = quat_to_mat(iquat_world)  # principal axes in world
    inertia_world = R @ (model.body_inertia[:, :, None] * jnp.swapaxes(R, -1, -2))
    com_world = xpos + quat_rotate(xquat, model.body_ipos)
    return spatial_inertia(model.body_mass, inertia_world, com_world - ref)


def crba(
    model: PhysicsModel,
    I_body: jnp.ndarray,
    S: jnp.ndarray,
) -> jnp.ndarray:
    """Composite-rigid-body mass matrix M (nv, nv).

    M[i, j] = S_iᵀ I^C_{body(j)} S_j for i ancestor-or-self of j, symmetrized,
    with armature added on the diagonal.
    """
    # Composite inertia of each body's subtree: one (nb, nb) @ (nb, 36) matmul.
    nb = model.nbody
    I_comp = (model.body_subtree_mask @ I_body.reshape(nb, 36)).reshape(nb, 6, 6)

    # F_d = I^C_{body(d)} S_d, then a single (nv, 6) @ (6, nv) matmul.
    F = jnp.einsum("dij,dj->di", I_comp[model.dof_body], S)
    W = (S @ F.T) * model.dof_ancestor_mask
    M = W + W.T - jnp.diag(jnp.diag(W))
    return M + jnp.diag(model.dof_armature)


def rnea_bias(
    model: PhysicsModel,
    I_body: jnp.ndarray,
    S: jnp.ndarray,
    cvel: jnp.ndarray,
    cacc_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Bias force C(q, qvel) + gravity, shape (nv,).

    Runs the RNEA backward pass as a masked matmul: net spatial force per body
    with qacc = 0 (gravity folded in as a base acceleration of -g), subtree
    sums via the subtree mask, then projection onto each DoF's subspace.
    """
    # Base acceleration trick: a0 = (0; -g) makes gravity appear in the bias.
    a0 = jnp.concatenate([jnp.zeros(3, cvel.dtype), -model.gravity])
    acc = cacc_bias + a0  # (nb, 6)

    f_net = jnp.einsum("bij,bj->bi", I_body, acc) + force_cross(
        cvel, jnp.einsum("bij,bj->bi", I_body, cvel)
    )
    f_subtree = (model.body_subtree_mask @ f_net.reshape(model.nbody, 6)).reshape(
        model.nbody, 6
    )
    return jnp.einsum("di,di->d", S, f_subtree[model.dof_body])


def passive_forces(model: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray):
    """Joint-level passive spring-damper forces (nv,).

    Springs act on hinge DoFs toward their spring reference angle; damping
    acts on every DoF with nonzero model damping (flygym joints carry
    stiffness/damping/springref per hinge, ``fly.py:285-295``).
    """
    qfrc = -model.dof_damping * qvel
    if model.nhinge:
        angles = qpos[model.hinge_qadr]
        spring = -model.hinge_stiffness * (angles - model.hinge_springref)
        qfrc = qfrc.at[model.hinge_vadr].add(spring)
    return qfrc
