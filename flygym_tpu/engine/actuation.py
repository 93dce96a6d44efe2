"""Actuator force models.

Implements all eight MuJoCo actuator types used by the reference
(``compose/fly.py:65-77``): motor, position, velocity, intvelocity, damper,
cylinder, muscle, adhesion. Joint-transmission actuators produce generalized
forces here; adhesion actuators act inside the contact solver by applying
their force along the contact normals (see contact.py).

The muscle model follows MuJoCo's formulation: normalized force-length and
force-velocity curves (the piecewise-quadratic bump / ramp shapes of
``mju_muscleGain``), a quadratic passive-force ramp (``mju_muscleBias``),
first-order activation dynamics with activation-dependent time constants
(``mju_muscleDynamics``), and peak-force auto-scaling from the compile-time
acceleration-per-unit-force ``acc0`` when ``force < 0``.
"""

import jax.numpy as jnp

from flygym_tpu.engine.model import ActKind, PhysicsModel

__all__ = ["actuator_forces", "integrate_act"]

_EPS = 1e-9


def _muscle_gain_length(L, lmin, lmax):
    """Normalized active force-length curve (piecewise quadratic bump)."""
    a = 0.5 * (lmin + 1.0)
    b = 0.5 * (1.0 + lmax)
    x_rise = (L - lmin) / jnp.maximum(a - lmin, _EPS)
    x_peak_lo = (1.0 - L) / jnp.maximum(1.0 - a, _EPS)
    x_peak_hi = (L - 1.0) / jnp.maximum(b - 1.0, _EPS)
    x_fall = (lmax - L) / jnp.maximum(lmax - b, _EPS)
    return jnp.select(
        [L <= lmin, L <= a, L <= 1.0, L <= b, L <= lmax],
        [
            jnp.zeros_like(L),
            0.5 * x_rise**2,
            1.0 - 0.5 * x_peak_lo**2,
            1.0 - 0.5 * x_peak_hi**2,
            0.5 * x_fall**2,
        ],
        default=jnp.zeros_like(L),
    )


def _muscle_gain_velocity(V, fvmax):
    """Normalized force-velocity curve."""
    y = fvmax - 1.0
    return jnp.select(
        [V <= -1.0, V <= 0.0, V <= y],
        [
            jnp.zeros_like(V),
            (V + 1.0) ** 2,
            fvmax - (y - V) ** 2 / jnp.maximum(y, _EPS),
        ],
        default=jnp.full_like(V, fvmax),
    )


def _muscle_forces(model: PhysicsModel, length, vel):
    """Active gain (per unit activation) and passive bias for muscle rows."""
    prm = model.act_muscleprm
    range0, range1 = prm[:, 0], prm[:, 1]
    force, scale = prm[:, 2], prm[:, 3]
    lmin, lmax, vmax = prm[:, 4], prm[:, 5], prm[:, 6]
    fpmax, fvmax = prm[:, 7], prm[:, 8]
    lr0 = model.act_lengthrange[:, 0]
    lr1 = model.act_lengthrange[:, 1]

    L0 = (lr1 - lr0) / jnp.maximum(range1 - range0, _EPS)
    L = range0 + (length - lr0) / jnp.maximum(L0, _EPS)
    V = vel / jnp.maximum(L0 * vmax, _EPS)

    # Auto peak force from acceleration scaling when force < 0 (MuJoCo).
    peak = jnp.where(
        force < 0, scale / jnp.maximum(model.act_acc0, _EPS), force
    )

    gain = -peak * _muscle_gain_length(L, lmin, lmax) * _muscle_gain_velocity(
        V, fvmax
    )

    b = 0.5 * (1.0 + lmax)
    x_ramp = (L - 1.0) / jnp.maximum(b - 1.0, _EPS)
    x_lin = (L - b) / jnp.maximum(b - 1.0, _EPS)
    bias = jnp.select(
        [L <= 1.0, L <= b],
        [jnp.zeros_like(L), -peak * fpmax * 0.5 * x_ramp**2],
        default=-peak * fpmax * (0.5 + x_lin),
    )
    return gain, bias


def actuator_forces(
    model: PhysicsModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    act: jnp.ndarray,
):
    """Compute per-actuator scalar forces and the generalized force vector.

    Returns:
        qfrc_actuator: (nv,)
        actuator_force: (nu,) scalar force per actuator (adhesion rows filled
            later by the contact solver with the commanded force).
    """
    if model.nu == 0:
        return jnp.zeros((model.nv,), qpos.dtype), jnp.zeros((0,), qpos.dtype)

    lo, hi = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
    c = jnp.where(
        model.act_ctrllimited > 0, jnp.clip(ctrl, lo, hi), ctrl
    )

    hs = jnp.maximum(model.act_hinge, 0)
    q = qpos[model.hinge_qadr[hs]] if model.nhinge else jnp.zeros_like(c)
    v = qvel[model.hinge_vadr[hs]] if model.nhinge else jnp.zeros_like(c)

    gain, kv = model.act_gain, model.act_kv
    a_slot = act[jnp.maximum(model.act_actadr, 0)] if model.na else jnp.zeros_like(c)

    m_gain, m_bias = _muscle_forces(model, q, v)

    force = jnp.select(
        [
            model.act_kind == ActKind.MOTOR,
            model.act_kind == ActKind.POSITION,
            model.act_kind == ActKind.VELOCITY,
            model.act_kind == ActKind.INTVELOCITY,
            model.act_kind == ActKind.DAMPER,
            model.act_kind == ActKind.CYLINDER,
            model.act_kind == ActKind.MUSCLE,
        ],
        [
            gain * c,
            gain * (c - q) - kv * v,
            gain * (c - v),
            gain * (a_slot - q) - kv * v,
            -gain * c * v,
            gain * a_slot,
            m_gain * a_slot + m_bias,
        ],
        default=jnp.zeros_like(c),  # adhesion handled in the contact solver
    )
    flo, fhi = model.act_forcerange[:, 0], model.act_forcerange[:, 1]
    force = jnp.where(model.act_forcelimited > 0, jnp.clip(force, flo, fhi), force)

    qfrc = jnp.zeros((model.nv,), qpos.dtype)
    if model.nhinge:
        joint_force = jnp.where(model.act_hinge >= 0, force, 0.0)
        qfrc = qfrc.at[model.hinge_vadr[hs]].add(joint_force)
    return qfrc, force


def integrate_act(model: PhysicsModel, act: jnp.ndarray, ctrl: jnp.ndarray, dt):
    """Advance activation states.

    - intvelocity: act += dt * ctrl (the integrated velocity target)
    - cylinder: first-order filter with time constant dynprm[0]
    - muscle: MuJoCo activation dynamics with activation-dependent taus
    """
    if model.na == 0:
        return act
    adr = jnp.maximum(model.act_actadr, 0)
    has_slot = model.act_actadr >= 0
    lo, hi = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
    c = jnp.where(model.act_ctrllimited > 0, jnp.clip(ctrl, lo, hi), ctrl)
    a = act[adr]

    # intvelocity
    d_intvel = dt * c

    # cylinder: filter toward ctrl.
    tau_cyl = jnp.maximum(model.act_dynprm[:, 0], _EPS)
    d_cyl = dt * (c - a) / tau_cyl

    # muscle: clamp ctrl to [0, 1]; tau depends on activation level.
    cm = jnp.clip(c, 0.0, 1.0)
    tau_act = jnp.maximum(model.act_dynprm[:, 0], _EPS)
    tau_deact = jnp.maximum(model.act_dynprm[:, 1], _EPS)
    tau = jnp.where(
        cm > a,
        tau_act * (0.5 + 1.5 * a),
        tau_deact / (0.5 + 1.5 * a),
    )
    d_muscle = dt * (cm - a) / jnp.maximum(tau, _EPS)

    delta = jnp.select(
        [
            model.act_kind == ActKind.INTVELOCITY,
            model.act_kind == ActKind.CYLINDER,
            model.act_kind == ActKind.MUSCLE,
        ],
        [d_intvel, d_cyl, d_muscle],
        default=jnp.zeros_like(c),
    )
    delta = jnp.where(has_slot, delta, 0.0)
    new_act = act.at[adr].add(delta)
    # Muscle activations stay in [0, 1].
    is_muscle_slot = jnp.zeros((model.na,), bool).at[adr].set(
        (model.act_kind == ActKind.MUSCLE) & has_slot
    )
    return jnp.where(
        is_muscle_slot, jnp.clip(new_act, 0.0, 1.0), new_act
    )
