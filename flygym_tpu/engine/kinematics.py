"""Forward kinematics and velocity propagation over the body tree.

TPU-first design: the tree is processed level by level (tree depth ~11 for the
fly vs 69 bodies), with all bodies of a level updated in one vectorized
gather/compute/scatter. Under ``vmap`` each per-level op becomes a large
batched op across worlds, which is where the throughput comes from (the same
structure MJX uses, replacing the reference's per-step ``mj_kinematics`` C
call, flygym ``simulation.py:76``).

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

__all__ = ["forward_kinematics", "kinematics_full", "velocity_pass", "geom_poses"]


def forward_kinematics(model: PhysicsModel, qpos: jnp.ndarray):
    """Body world poses from generalized positions.

    Returns:
        xpos: (nbody, 3) body frame origins.
        xquat: (nbody, 4) body frame orientations.
    """
    xpos, xquat, _ = kinematics_full(model, qpos)
    return xpos, xquat


def kinematics_full(model: PhysicsModel, qpos: jnp.ndarray):
    """FK that additionally returns per-hinge world axes.

    The world axis of hinge k must be computed with the rotation accumulated
    *before* that hinge is applied (rotating about an axis leaves the axis
    itself invariant, so using the post-rotation frame of the same hinge is
    equivalent — but later hinges in the same body are not).

    Returns:
        xpos: (nbody, 3), xquat: (nbody, 4), hinge_xaxis: (nhinge, 3).
    """
    nb = model.nbody
    xpos = jnp.zeros((nb, 3), qpos.dtype)
    xquat = jnp.zeros((nb, 4), qpos.dtype).at[:, 0].set(1.0)
    hinge_xaxis = jnp.zeros((model.nhinge, 3), qpos.dtype)

    for level in model.levels[1:]:  # level 0 is the world body
        idx = jnp.asarray(level, jnp.int32)
        parent = model.body_parent[idx]
        pos = xpos[parent] + quat_rotate(xquat[parent], model.body_pos[idx])
        quat = quat_mul(xquat[parent], model.body_quat[idx])

        # Free joints override the accumulated frame with qpos directly
        # (free bodies are children of the world; spawn pose is in qpos0).
        free_qadr = model.body_free_qadr[idx]
        has_free = (free_qadr >= 0)[:, None]
        safe_adr = jnp.maximum(free_qadr, 0)
        gather = safe_adr[:, None] + jnp.arange(7)[None, :]
        free_q = qpos[gather]  # (k, 7)
        pos = jnp.where(has_free, free_q[:, :3], pos)
        quat = jnp.where(has_free, free_q[:, 3:7], quat)

        # Stacked hinge rotations (max 3 per body), applied in order.
        for k in range(3 if model.nhinge else 0):
            h = model.body_hinge_idx[idx, k]
            valid = h >= 0
            hs = jnp.maximum(h, 0)
            angle = qpos[model.hinge_qadr[hs]]
            axis_local = model.hinge_axis[hs]
            axis_world = quat_rotate(quat, axis_local)
            hinge_xaxis = hinge_xaxis.at[hs].set(
                jnp.where(valid[:, None], axis_world, hinge_xaxis[hs])
            )
            rot = quat_from_axis_angle(axis_local, angle)
            rotated = quat_mul(quat, rot)
            quat = jnp.where(valid[:, None], rotated, quat)

        xpos = xpos.at[idx].set(pos)
        xquat = xquat.at[idx].set(quat)

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

    # Hinges.
    if model.nhinge:
        anchor = xpos[model.hinge_body] - ref
        lin = jnp.cross(anchor, hinge_xaxis)
        S = S.at[model.hinge_vadr].set(
            jnp.concatenate([hinge_xaxis, lin], axis=-1)
        )

    # Free joints (static list, unrolled).
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
    """Propagate spatial velocities and velocity-product (bias) accelerations
    down the tree.

    Returns:
        cvel: (nbody, 6) spatial velocity of each body.
        cacc_bias: (nbody, 6) bias acceleration (Ṡ q̇ terms accumulated from
            the root; gravity NOT included).
    """
    nb = model.nbody
    cvel = jnp.zeros((nb, 6), qvel.dtype)
    cacc = jnp.zeros((nb, 6), qvel.dtype)

    for level in model.levels[1:]:
        idx = jnp.asarray(level, jnp.int32)
        parent = model.body_parent[idx]
        v = cvel[parent]
        c = cacc[parent]

        # Free joint contribution.
        free_vadr = model.body_free_vadr[idx]
        has_free = (free_vadr >= 0)[:, None]
        safe = jnp.maximum(free_vadr, 0)
        gather = safe[:, None] + jnp.arange(6)[None, :]
        qv_free = qvel[gather]  # (k, 6): [v_lin(3), omega(3)]
        v_lin, omega = qv_free[:, :3], qv_free[:, 3:]
        p = xpos[idx] - xpos[model.ref_body]
        # Spatial velocity at ref: (omega; v_lin + omega × (ref - p)).
        lin_at_ref = v_lin + jnp.cross(omega, -p)
        v_free = jnp.concatenate([omega, lin_at_ref], axis=-1)
        v = v + jnp.where(has_free, v_free, 0.0)
        # Free-joint Ṡ q̇ = (0; ṗ × ω).
        c_free = jnp.concatenate(
            [jnp.zeros_like(v_lin), jnp.cross(v_lin, omega)], axis=-1
        )
        c = c + jnp.where(has_free, c_free, 0.0)

        # Hinge contributions, sequential within a body.
        for k in range(3 if model.nhinge else 0):
            h = model.body_hinge_idx[idx, k]
            valid = (h >= 0)[:, None]
            hs = jnp.maximum(h, 0)
            vJ = S[model.hinge_vadr[hs]] * qvel[model.hinge_vadr[hs]][:, None]
            v_new = v + jnp.where(valid, vJ, 0.0)
            c = c + jnp.where(valid, motion_cross(v_new, vJ), 0.0)
            v = v_new

        cvel = cvel.at[idx].set(v)
        cacc = cacc.at[idx].set(c)

    return cvel, cacc


def geom_poses(model: PhysicsModel, xpos: jnp.ndarray, xquat: jnp.ndarray):
    """World poses of all geoms: (ngeom, 3) positions, (ngeom, 4) quats."""
    b = model.geom_body
    gpos = xpos[b] + quat_rotate(xquat[b], model.geom_pos)
    gquat = quat_mul(xquat[b], model.geom_quat)
    return gpos, gquat
