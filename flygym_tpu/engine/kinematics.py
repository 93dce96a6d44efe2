"""Forward kinematics and velocity propagation over the body tree.

TPU-first design: tree recursions are restructured into a handful of large
batched ops instead of long chains of tiny kernels (the serialized-kernel
overhead, not FLOPs, dominates TPU step time for this model size):

- **FK by pointer doubling**: all local joint transforms are built in one
  vectorized pass, then composed along precomputed ancestor-jump tables
  (``model.ancestor_jumps``: parent, grandparent, 4th ancestor, ...) in
  O(log depth) rounds — 4 rounds for the fly's 10-deep tree, each one gather
  + quaternion compose over all 70 bodies at once. This replaces the per-step
  ``mj_kinematics`` C recursion behind the reference's ``simulation.py:76``.
- **Velocities and bias accelerations as mask matmuls**: a body's spatial
  velocity is the ancestor-masked sum of DoF subspace columns, so the whole
  velocity pass is one ``(nbody, nv) @ (nv, 6)`` matmul; the velocity-product
  (Coriolis) accumulation likewise uses the DoF-ancestor mask.

Hinge semantics match MuJoCo: a body's world orientation is
``parent ∘ body_quat ∘ R(a1, q1) ∘ R(a2, q2) ∘ R(a3, q3)`` where the axes are
expressed in the child body frame and all hinge anchors sit at the child body
origin (joints are added at the child origin, reference ``fly.py:285-295``).

Spatial quantities are 6D Plücker vectors ``(angular, linear)`` in world axes,
referenced at the position of ``model.ref_body`` (the fly root) for float32
conditioning — the same trick MuJoCo uses by referencing at the subtree com.
"""

import jax.numpy as jnp

from flygym_tpu.engine.maths import (
    motion_cross,
    quat_from_axis_angle,
    quat_mul,
    quat_rotate,
)
from flygym_tpu.engine.model import PhysicsModel

__all__ = [
    "forward_kinematics",
    "kinematics_full",
    "dof_subspace",
    "velocity_pass",
    "geom_poses",
]


def forward_kinematics(model: PhysicsModel, qpos: jnp.ndarray):
    """Body world poses from generalized positions.

    Returns:
        xpos: (nbody, 3) body frame origins.
        xquat: (nbody, 4) body frame orientations.
    """
    xpos, xquat, _ = kinematics_full(model, qpos)
    return xpos, xquat


def _local_transforms(model: PhysicsModel, qpos: jnp.ndarray):
    """Per-body local transform (pos, quat in parent frame) + hinge data.

    Returns (lpos (nb,3), lquat (nb,4), hinge_prefix (nh,4) quaternions of
    the within-body rotation accumulated *before* each hinge).
    """
    nb = model.nbody
    dtype = qpos.dtype
    identity = jnp.zeros((1, 4), dtype).at[0, 0].set(1.0)

    if model.nhinge:
        angles = qpos[model.hinge_qadr]
        hq = quat_from_axis_angle(model.hinge_axis, angles)  # (nh, 4)
        hq_pad = jnp.concatenate([hq, identity], axis=0)
        idx = jnp.where(model.body_hinge_idx >= 0, model.body_hinge_idx, model.nhinge)
        q0 = hq_pad[idx[:, 0]]  # (nb, 4)
        q01 = quat_mul(q0, hq_pad[idx[:, 1]])
        jq = quat_mul(q01, hq_pad[idx[:, 2]])

        # Within-body prefix rotation before each hinge (slot 0: identity,
        # slot 1: q0, slot 2: q0 ⊗ q1).
        prefix_by_slot = jnp.stack(
            [jnp.broadcast_to(identity[0], (nb, 4)), q0, q01], axis=1
        )  # (nb, 3, 4)
        hinge_prefix = prefix_by_slot[model.hinge_body, model.hinge_slot]
    else:
        jq = jnp.broadcast_to(identity[0], (nb, 4))
        hinge_prefix = jnp.zeros((0, 4), dtype)

    lquat = quat_mul(model.body_quat, jq)
    lpos = model.body_pos

    # Free bodies: local transform = qpos pose directly (parent is world).
    for body, qadr, _vadr in model.free_joints:
        lpos = lpos.at[body].set(qpos[qadr : qadr + 3])
        lquat = lquat.at[body].set(qpos[qadr + 3 : qadr + 7])
    return lpos, lquat, hinge_prefix


def kinematics_full(model: PhysicsModel, qpos: jnp.ndarray):
    """FK via pointer doubling; also returns per-hinge world axes.

    The world axis of hinge k uses the rotation accumulated *before* that
    hinge (rotating about an axis leaves the axis invariant, so including the
    hinge's own rotation would be equivalent — but later hinges in the same
    body are not).

    Returns:
        xpos: (nbody, 3), xquat: (nbody, 4), hinge_xaxis: (nhinge, 3).
    """
    lpos, lquat, hinge_prefix = _local_transforms(model, qpos)

    # Compose along ancestor jumps: after round k, (pos, quat)[b] is the
    # transform from b's 2^(k+1)-th ancestor (or world) to b.
    pos, quat = lpos, lquat
    for jump in model.ancestor_jumps:
        anc = jnp.asarray(jump, jnp.int32)
        pos = pos[anc] + quat_rotate(quat[anc], pos)
        quat = quat_mul(quat[anc], quat)
    xpos, xquat = pos, quat

    if model.nhinge:
        parent_q = xquat[model.body_parent[model.hinge_body]]
        base = quat_mul(parent_q, model.body_quat[model.hinge_body])
        pre = quat_mul(base, hinge_prefix)
        hinge_xaxis = quat_rotate(pre, model.hinge_axis)
    else:
        hinge_xaxis = jnp.zeros((0, 3), qpos.dtype)
    return xpos, xquat, hinge_xaxis


def dof_subspace(
    model: PhysicsModel,
    xpos: jnp.ndarray,
    hinge_xaxis: jnp.ndarray,
    ref: jnp.ndarray,
) -> jnp.ndarray:
    """Motion subspace S (nv, 6) of every DoF, referenced at ``ref``.

    - free translation DoFs: (0; e_i)
    - free rotation DoFs:    (e_i; (p - ref) × e_i), anchored at body origin p
    - hinge DoFs:            (a; (p - ref) × a), world axis a, anchor p
    """
    nv = model.nv
    S = jnp.zeros((nv, 6), xpos.dtype)

    if model.nhinge:
        anchor = xpos[model.hinge_body] - ref
        lin = jnp.cross(anchor, hinge_xaxis)
        S = S.at[model.hinge_vadr].set(
            jnp.concatenate([hinge_xaxis, lin], axis=-1)
        )

    eye = jnp.eye(3, dtype=xpos.dtype)
    zeros3 = jnp.zeros((3, 3), xpos.dtype)
    for body, _qadr, vadr in model.free_joints:
        p = xpos[body] - ref
        s_trans = jnp.concatenate([zeros3, eye], axis=-1)  # (3, 6)
        s_rot = jnp.concatenate(
            [eye, jnp.cross(jnp.broadcast_to(p, (3, 3)), eye)], axis=-1
        )
        S = S.at[vadr : vadr + 3].set(s_trans)
        S = S.at[vadr + 3 : vadr + 6].set(s_rot)
    return S


def velocity_pass(
    model: PhysicsModel,
    qvel: jnp.ndarray,
    xpos: jnp.ndarray,
    S: jnp.ndarray,
):
    """Spatial velocities and velocity-product (bias) accelerations.

    cvel[b]   = Σ_{d ∈ ancestors(b)} S_d q̇_d                    (one matmul)
    cacc_bias[b] = Σ_{d ∈ ancestors(b)} v_dof(d) ×̂ (S_d q̇_d)     (one matmul)
    where v_dof(d) is the spatial velocity at DoF d's virtual body (sum over
    its ancestor-or-self DoFs — the dof_ancestor_mask) — plus the exact
    free-joint Ṡ q̇ term (0; ṗ × ω) broadcast over each free subtree.

    Returns:
        cvel: (nbody, 6), cacc_bias: (nbody, 6).
    """
    Sqd = S * qvel[:, None]  # (nv, 6)
    affects = model.body_subtree_mask[model.dof_body]  # (nv, nbody)
    cvel = affects.T @ Sqd  # (nbody, 6)

    # Velocity at each DoF's virtual body (ancestor-or-self sum).
    v_dof = model.dof_ancestor_mask.T @ Sqd  # (nv, 6)
    g = motion_cross(v_dof, Sqd)  # (nv, 6)

    # The generic formula applies to hinge DoFs; free-joint DoFs have their
    # own exact term added below.
    if model.free_joints:
        hinge_mask = jnp.ones((model.nv,), qvel.dtype)
        for _body, _qadr, vadr in model.free_joints:
            hinge_mask = hinge_mask.at[vadr : vadr + 6].set(0.0)
        g = g * hinge_mask[:, None]
    cacc = affects.T @ g

    for body, _qadr, vadr in model.free_joints:
        v_lin = qvel[vadr : vadr + 3]
        omega = qvel[vadr + 3 : vadr + 6]
        c_free = jnp.concatenate([jnp.zeros(3, qvel.dtype), jnp.cross(v_lin, omega)])
        cacc = cacc + model.body_subtree_mask[body][:, None] * c_free[None, :]
    return cvel, cacc


def geom_poses(model: PhysicsModel, xpos: jnp.ndarray, xquat: jnp.ndarray):
    """World poses of all geoms: (ngeom, 3) positions, (ngeom, 4) quats."""
    b = model.geom_body
    gpos = xpos[b] + quat_rotate(xquat[b], model.geom_pos)
    gquat = quat_mul(xquat[b], model.geom_quat)
    return gpos, gquat
