"""Collision detection, adhesion forces, and the contact constraint solver.

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
3. MuJoCo-compatible constraint dynamics: 4-row pyramidal friction cones per
   contact, per-row stiffness/damping from solref, impedance from solimp
   (reference ``compose/physics.py:60-77``), reference acceleration
   ``aref = -b v - k d(r) r`` and regularization R = (1-d)/d diag(A).
4. Adhesion actuators apply their force (gain x ctrl, split across the
   body's active contacts) as a smooth generalized force along the inward
   contact normal — the same pathway real MuJoCo uses (qfrc_actuator), so the
   solver sees a standard f >= 0 problem.
5. A **primal Newton solver** (MuJoCo's architecture): minimize
   ½(a-a_s)ᵀM(a-a_s) + Σ ½ D_r jar_r² over active rows. The Hessian
   M + JᵀDJ stays well-conditioned even with redundant contacts, each Newton
   iteration is dense batched linear algebra (MXU work), and 2-3 iterations
   with a 1D Newton line search converge for the fly's stiff contacts. A
   projected block Gauss-Seidel fallback (``solver="pgs"``) is kept for
   cross-checking.
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
    Mh: jnp.ndarray,
    chol,
    qfrc_smooth: jnp.ndarray,
    qvel: jnp.ndarray,
    xpos: jnp.ndarray,
    S: jnp.ndarray,
    gpos: jnp.ndarray,
    gquat: jnp.ndarray,
    ctrl: jnp.ndarray,
    ref: jnp.ndarray,
):
    """Detect contacts, apply adhesion, solve constraints.

    Args:
        chol: Cholesky factorization of the (damping-augmented) mass matrix.
        qfrc_smooth: smooth generalized forces excluding adhesion.

    Returns:
        qacc: (nv,) constrained acceleration.
        info: ContactInfo for sensors, or None when the model has no contacts.
    """
    if model.ncand == 0:
        qacc = jax.scipy.linalg.cho_solve(chol, qfrc_smooth)
        return qacc, None

    dtype = qfrc_smooth.dtype
    K = model.ncon
    dist_all, cpos_all = contact_candidates(model, gpos, gquat)

    # Top-K closest candidates (static shape compression).
    _, sel = jax.lax.top_k(-dist_all, K)
    dist = dist_all[sel]
    cpos = cpos_all[sel]
    margin = model.can_margin[sel]
    active = dist < margin

    # Contact frame (x = normal, MuJoCo convention) + tangents.
    n = model.ground_normal
    t1 = jnp.array([1.0, 0.0, 0.0], dtype)
    t1 = t1 - (t1 @ n) * n
    t1 = t1 / jnp.linalg.norm(t1)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([n, t1, t2])  # (3, 3)
    frame_k = jnp.broadcast_to(frame, (K, 3, 3))

    # Contact-frame Jacobian (K, 3, nv), rows [n, t1, t2].
    body = model.can_body[sel]
    rel = cpos - ref
    jpoint = S[None, :, 3:] + jnp.cross(S[None, :, :3], rel[:, None, :])
    affects = model.body_subtree_mask[model.dof_body][:, body].T  # (K, nv)
    J = jnp.einsum("kud,kvd->kuv", frame_k, jpoint * affects[:, :, None])

    # Constraint dynamics parameters.
    solref = model.can_solref[sel]
    solimp = model.can_solimp[sel]
    pos_err = jnp.minimum(dist - margin, 0.0)
    imp = _impedance(solimp, pos_err)
    dmax = solimp[:, 1]
    tc, dr = solref[:, 0], solref[:, 1]
    b_gain = 2.0 / (dmax * tc)
    k_gain = 1.0 / (dmax * dmax * tc * tc * dr * dr)
    mu = model.can_friction[sel, 0]

    # ---- adhesion as an applied generalized force (MuJoCo semantics) ----
    adh_act = model.can_adh_act[sel]
    has_adh = adh_act >= 0
    adh_idx = jnp.maximum(adh_act, 0)
    adh_force_per_contact = jnp.zeros((K,), dtype)
    if model.nu:
        lo_c, hi_c = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
        c_cl = jnp.where(
            model.act_ctrllimited > 0, jnp.clip(ctrl, lo_c, hi_c), ctrl
        )
        adh_total = jnp.where(
            model.act_kind == ActKind.ADHESION, model.act_gain * c_cl, 0.0
        )
        counts = jnp.zeros((model.nu,), dtype).at[adh_idx].add(
            jnp.where(has_adh & active, 1.0, 0.0)
        )
        adh_force_per_contact = jnp.where(
            has_adh & active,
            adh_total[adh_idx] / jnp.maximum(counts[adh_idx], 1.0),
            0.0,
        )
    # Pull toward the surface: force -f n at the contact point.
    qfrc_adh = jnp.einsum("k,kv->v", -adh_force_per_contact, J[:, 0, :])
    qfrc_total = qfrc_smooth + qfrc_adh
    qacc_smooth = jax.scipy.linalg.cho_solve(chol, qfrc_total)

    # ---- pyramidal rows (K, 4, nv): n ± mu t1, n ± mu t2 ----
    Jn, Jt1, Jt2 = J[:, 0], J[:, 1], J[:, 2]
    mu_ = mu[:, None]
    Jp = jnp.stack(
        [Jn + mu_ * Jt1, Jn - mu_ * Jt1, Jn + mu_ * Jt2, Jn - mu_ * Jt2],
        axis=1,
    )
    m_rows = K * 4
    Jp_flat = Jp.reshape(m_rows, model.nv)

    vel_rows = Jp_flat @ qvel  # (4K,)
    pos_rows = jnp.repeat(pos_err, 4)
    imp_rows = jnp.repeat(imp, 4)
    aref = (
        -jnp.repeat(b_gain, 4) * vel_rows
        - jnp.repeat(k_gain, 4) * imp_rows * pos_rows
    )
    row_active_mask = jnp.repeat(active, 4)

    # Row regularization: R = (1-d)/d diag(A), D = 1/R.
    X = jax.scipy.linalg.cho_solve(chol, Jp_flat.T)  # (nv, 4K)
    diagA = jnp.clip(jnp.sum(Jp_flat * X.T, axis=1), 1e-12, None)
    R = (1.0 - imp_rows) / imp_rows * diagA
    D = jnp.where(row_active_mask, 1.0 / R, 0.0)

    if model.solver_type == "pgs":
        lam = _solve_dual_pgs(
            model, Jp_flat, X, D, aref, qacc_smooth, row_active_mask, K, dtype
        )
        qacc = qacc_smooth + X @ lam
    else:
        qacc, lam, _jar = _solve_primal_newton(
            model, Mh, Jp_flat, D, aref, qacc_smooth, qvel, dtype
        )

    # Contact-frame constraint forces from the pyramid multipliers (the
    # contact sensor reports constraint force; adhesion flows through the
    # actuator pathway, matching MuJoCo).
    lam_k = lam.reshape(K, 4)
    fn = jnp.sum(lam_k, axis=1)
    ft1 = mu * (lam_k[:, 0] - lam_k[:, 1])
    ft2 = mu * (lam_k[:, 2] - lam_k[:, 3])
    f_con = jnp.stack([fn, ft1, ft2], axis=-1) * active[:, None]
    f_world = f_con @ frame

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
        adh_force=adh_force_per_contact,
        body=body,
    )
    return qacc, info


def _solve_primal_newton(model, Mh, Jp, D, aref, qacc_smooth, qvel, dtype):
    """MuJoCo-style primal Newton with pyramidal cones.

    Minimizes c(a) = ½ (a - a_s)ᵀ Mh (a - a_s) + Σ_r ½ D_r jar_r² [jar_r < 0]
    where jar = Jp a - aref. Non-negativity of the pyramid multipliers
    λ_r = -D_r jar_r [jar_r < 0] is automatic. Each iteration: assemble the
    active-set Hessian (one (nv, m) x (m, nv) matmul), factor, solve, then a
    short 1D Newton line search on the exact piecewise-quadratic restriction.
    """
    nv = model.nv

    def M_mul(x):
        return Mh @ x

    a_s = qacc_smooth

    def cost_grad_active(a):
        jar = Jp @ a - aref
        act = (jar < 0.0).astype(dtype) * (D > 0.0)
        return jar, act

    def newton_iter(a, _):
        jar, act = cost_grad_active(a)
        w = D * act
        grad = M_mul(a - a_s) + Jp.T @ (w * jar)
        # Hessian: Mh + Jpᵀ diag(w) Jp.
        H = Mh + (Jp.T * w[None, :]) @ Jp
        H = H + 1e-9 * jnp.eye(nv, dtype=dtype)
        cf = jax.scipy.linalg.cho_factor(H)
        delta = -jax.scipy.linalg.cho_solve(cf, grad)

        # Exact-ish line search: 1D Newton on φ(α) = c(a + α δ).
        Jd = Jp @ delta  # (m,)
        Md = M_mul(delta)
        dMd = delta @ Md
        aMd = (a - a_s) @ Md

        def ls_iter(alpha, _):
            jar_a = jar + alpha * Jd
            act_a = (jar_a < 0.0).astype(dtype) * (D > 0.0)
            dphi = aMd + alpha * dMd + jnp.sum(D * act_a * jar_a * Jd)
            ddphi = dMd + jnp.sum(D * act_a * Jd * Jd)
            return alpha - dphi / jnp.maximum(ddphi, 1e-12), None

        alpha, _ = jax.lax.scan(ls_iter, jnp.ones((), dtype), None, length=6)
        alpha = jnp.clip(alpha, 0.0, 2.0)
        return a + alpha * delta, None

    a, _ = jax.lax.scan(
        newton_iter, a_s, None, length=max(model.solver_iterations, 1)
    )
    jar, act = cost_grad_active(a)
    lam = jnp.maximum(-D * act * jar, 0.0)
    return a, lam, jar


def _solve_dual_pgs(model, Jp, X, D, aref, qacc_smooth, row_active, K, dtype):
    """Projected Gauss-Seidel on the pyramidal dual (λ >= 0). Verification
    fallback — many tiny sequential kernels."""
    A = Jp @ X  # (4K, 4K)
    R = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-12), 0.0)
    b0 = Jp @ qacc_smooth - aref
    diag = jnp.clip(jnp.diag(A) + R, 1e-12, None)

    def sweep(lam, _):
        def per_row(lam_c, r):
            res = A[r] @ lam_c + R[r] * lam_c[r] + b0[r]
            new = jnp.maximum(lam_c[r] - res / diag[r], 0.0) * row_active[r]
            return lam_c.at[r].set(new), None

        lam, _ = jax.lax.scan(per_row, lam, jnp.arange(K * 4))
        return lam, None

    lam, _ = jax.lax.scan(
        sweep,
        jnp.zeros((K * 4,), dtype),
        None,
        length=max(model.solver_iterations, 4),
    )
    return lam
