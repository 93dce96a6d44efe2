"""Collision detection and soft-constraint contact solver.

Replaces MuJoCo's collision pipeline + Newton constraint solver (the engine
underneath the reference's ``mj_step``) with a shape-static TPU pipeline:

1. A *static candidate table* of capsule-end vs ground-plane contact points
   (built at compose time from the world's explicit contact pairs, flygym
   ``world.py:292-309``). No dynamic broadphase — the fly's self-collisions
   are disabled in the reference too (geoms carry contype=0/conaffinity=0,
   ``fly.py:603-611``).
2. Top-K compression: only the ``ncon`` closest candidates are handed to the
   solver (static shapes; anything farther than the contact margin produces
   zero force anyway).
3. MuJoCo-compatible constraint dynamics: per-contact stiffness/damping from
   solref, impedance from solimp (reference ``compose/physics.py:60-77``), a
   reference acceleration ``aref = -b v - k d(r) r``, and regularization
   R = (1-d)/d diag(A).
4. A relaxed block-Jacobi dual solver with elliptic friction-cone projection
   (fixed iteration count → fully jittable). Adhesion actuators extend each
   contact's normal force lower bound to -gain*ctrl/n_active, shifting the
   friction cone accordingly (MuJoCo adhesion semantics; reference
   ``fly.py:407-441``).
"""

import jax
import jax.numpy as jnp

from flygym_tpu.engine.maths import quat_rotate
from flygym_tpu.engine.model import ActKind, PhysicsModel

__all__ = ["contact_candidates", "solve_contacts", "ContactInfo"]


def contact_candidates(model: PhysicsModel, gpos, gquat):
    """Distances and world positions of all candidate contact points.

    Returns:
        dist: (ncand,) signed surface distance to the ground plane.
        cpos: (ncand, 3) contact midpoint positions.
    """
    g = model.can_geom
    z_axis = quat_rotate(gquat[g], jnp.array([0.0, 0.0, 1.0], gpos.dtype))
    radius = model.geom_size[g, 0]
    halflen = model.geom_size[g, 1]
    endpoint = gpos[g] + model.can_end[:, None] * halflen[:, None] * z_axis
    n = model.ground_normal
    dist = (endpoint - model.ground_pos) @ n - radius
    cpos = endpoint - (radius + 0.5 * dist)[:, None] * n
    return dist, cpos


def _impedance(solimp: jnp.ndarray, pos_err: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo solimp impedance d(r) as a function of constraint violation."""
    dmin, dmax, width, mid, power = (
        solimp[:, 0],
        solimp[:, 1],
        solimp[:, 2],
        solimp[:, 3],
        solimp[:, 4],
    )
    x = jnp.clip(jnp.abs(pos_err) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    # Two-sided power sigmoid around the midpoint.
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(
        x < mid,
        a * jnp.power(x, power),
        1.0 - b * jnp.power(1.0 - x, power),
    )
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 0.9999)


class ContactInfo:
    """Per-step selected-contact data passed to sensors/readouts."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def solve_contacts(
    model: PhysicsModel,
    chol,
    qacc_smooth: jnp.ndarray,
    qvel: jnp.ndarray,
    xpos: jnp.ndarray,
    S: jnp.ndarray,
    gpos: jnp.ndarray,
    gquat: jnp.ndarray,
    ctrl: jnp.ndarray,
    ref: jnp.ndarray,
):
    """Detect contacts, solve for contact forces, return constrained qacc.

    Returns:
        qacc: (nv,) constrained acceleration.
        info: ContactInfo with per-selected-contact fields for sensors.
    """
    if model.ncand == 0:
        return qacc_smooth, None

    dtype = qacc_smooth.dtype
    K = model.ncon
    dist_all, cpos_all = contact_candidates(model, gpos, gquat)

    # Top-K closest candidates (static shape compression).
    _, sel = jax.lax.top_k(-dist_all, K)
    dist = dist_all[sel]
    cpos = cpos_all[sel]
    margin = model.can_margin[sel]
    active = dist < margin

    # Contact frame: x = normal (MuJoCo convention), then two tangents.
    n = model.ground_normal
    t1 = jnp.array([1.0, 0.0, 0.0], dtype)
    t1 = t1 - (t1 @ n) * n
    t1 = t1 / jnp.linalg.norm(t1)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([n, t1, t2])  # (3, 3) rows are directions
    frame_k = jnp.broadcast_to(frame, (K, 3, 3))

    # Contact Jacobian (K, 3, nv): point-velocity rows masked by DoF ancestry.
    body = model.can_body[sel]
    rel = cpos - ref  # (K, 3)
    jpoint = S[None, :, 3:] + jnp.cross(
        S[None, :, :3], rel[:, None, :]
    )  # (K, nv, 3)
    affects = model.body_subtree_mask[model.dof_body][:, body].T  # (K, nv)
    J = jnp.einsum("kud,kvd->kuv", frame_k, jpoint * affects[:, :, None])

    Jm = J.reshape(K * 3, model.nv)

    # Constraint dynamics (solref/solimp → k, b, impedance).
    solref = model.can_solref[sel]
    solimp = model.can_solimp[sel]
    pos_err = jnp.minimum(dist - margin, 0.0)
    imp = _impedance(solimp, pos_err)
    dmax = solimp[:, 1]
    tc, dr = solref[:, 0], solref[:, 1]
    b = 2.0 / (dmax * tc)
    k = 1.0 / (dmax * dmax * tc * tc * dr * dr)

    vel = J @ qvel  # (K, 3)
    aref = jnp.stack(
        [
            -b * vel[:, 0] - k * imp * pos_err,
            -b * vel[:, 1],
            -b * vel[:, 2],
        ],
        axis=-1,
    )

    # Dual system: A = J M⁻¹ Jᵀ (dense MXU work), regularized by R.
    X = jax.scipy.linalg.cho_solve(chol, Jm.T)  # (nv, 3K)
    A = Jm @ X  # (3K, 3K)
    diagA = jnp.clip(jnp.diag(A), 1e-12, None)
    imp_rows = jnp.repeat(imp, 3)
    R = (1.0 - imp_rows) / imp_rows * diagA
    b0 = Jm @ qacc_smooth - aref.reshape(-1)

    # Adhesion: per-contact normal lower bound −gain·ctrl/n_active.
    adh_act = model.can_adh_act[sel]
    has_adh = adh_act >= 0
    adh_idx = jnp.maximum(adh_act, 0)
    if model.nu:
        lo_c, hi_c = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
        c_cl = jnp.where(
            model.act_ctrllimited > 0, jnp.clip(ctrl, lo_c, hi_c), ctrl
        )
        adh_total = jnp.where(
            model.act_kind == ActKind.ADHESION, model.act_gain * c_cl, 0.0
        )
        # Count active contacts per adhesion actuator to distribute the force.
        counts = jnp.zeros((model.nu,), dtype).at[adh_idx].add(
            jnp.where(has_adh & active, 1.0, 0.0)
        )
        per_contact = adh_total[adh_idx] / jnp.maximum(counts[adh_idx], 1.0)
        f_lo = jnp.where(has_adh & active, -per_contact, 0.0)
    else:
        f_lo = jnp.zeros((K,), dtype)

    mu = model.can_friction[sel, 0]
    active_rows = jnp.repeat(active, 3)

    # Per-contact 3x3 diagonal blocks of (A + diag(R)).
    blocks = A.reshape(K, 3, K, 3)[jnp.arange(K), :, jnp.arange(K), :]
    blocks = blocks + jax.vmap(jnp.diag)(R.reshape(K, 3))
    blocks = blocks + 1e-10 * jnp.eye(3, dtype=dtype)

    relax = model.solver_relaxation

    # Precompute per-contact inverse blocks for the Gauss-Seidel sweeps.
    block_inv = jnp.linalg.inv(blocks)  # (K, 3, 3)
    A_rows = A.reshape(K, 3, K * 3)  # rows grouped per contact

    def project_one(fc, lo, mu_c, act):
        fn = jnp.clip(fc[0], lo, None)
        ft = fc[1:]
        # Friction cone shifted by the adhesion offset: |ft| <= mu (fn - lo).
        bound = mu_c * jnp.maximum(fn - lo, 0.0)
        ft_norm = jnp.linalg.norm(ft)
        scale = jnp.where(ft_norm > bound, bound / jnp.maximum(ft_norm, 1e-12), 1.0)
        return jnp.concatenate([fn[None], ft * scale]) * act

    def sweep(f, _):
        # Projected block Gauss-Seidel: sequential over contacts (robust for
        # stiff, strongly coupled systems); each inner op vectorizes across
        # vmapped worlds, so the sequential chain costs little in batch mode.
        def per_contact(f_carry, c):
            res = A_rows[c] @ f_carry + R.reshape(K, 3)[c] * f_carry.reshape(
                K, 3
            )[c] + b0.reshape(K, 3)[c]
            fc = f_carry.reshape(K, 3)[c] + relax * (block_inv[c] @ (-res))
            fc = project_one(fc, f_lo[c], mu[c], active[c].astype(dtype))
            f_new = jax.lax.dynamic_update_slice(f_carry, fc, (3 * c,))
            return f_new, None

        f, _ = jax.lax.scan(per_contact, f, jnp.arange(K))
        return f, None

    f, _ = jax.lax.scan(
        sweep, jnp.zeros((K * 3,), dtype), None, length=model.solver_iterations
    )

    qacc = qacc_smooth + X @ f

    f_con = f.reshape(K, 3)
    f_world = f_con @ frame  # rows are directions → world force
    info = ContactInfo(
        sel=sel,
        dist=dist,
        pos=cpos,
        active=active,
        force_frame=f_con,
        force_world=f_world,
        frame=frame,
        sensor=model.can_sensor[sel],
        adh_act=adh_act,
        body=body,
    )
    return qacc, info
