"""Actuator force models.

Implements the MuJoCo actuator semantics used by the reference
(``compose/fly.py:65-77``: motor, position, velocity, intvelocity, damper,
adhesion; cylinder/muscle are lowered to affine approximations by the
composition layer). Joint-transmission actuators produce generalized forces
here; adhesion actuators act inside the contact solver by extending the normal
force lower bound (see contact.py).
"""

import jax.numpy as jnp

from flygym_tpu.engine.model import ActKind, PhysicsModel

__all__ = ["actuator_forces", "integrate_act"]


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
            later by the contact solver with the realized normal force).
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

    force = jnp.select(
        [
            model.act_kind == ActKind.MOTOR,
            model.act_kind == ActKind.POSITION,
            model.act_kind == ActKind.VELOCITY,
            model.act_kind == ActKind.INTVELOCITY,
            model.act_kind == ActKind.DAMPER,
        ],
        [
            gain * c,
            gain * (c - q) - kv * v,
            gain * (c - v),
            gain * (a_slot - q) - kv * v,
            -gain * c * v,
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
    """Advance activation states (integrated-velocity actuators)."""
    if model.na == 0:
        return act
    is_intvel = model.act_kind == ActKind.INTVELOCITY
    adr = jnp.maximum(model.act_actadr, 0)
    lo, hi = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
    c = jnp.where(model.act_ctrllimited > 0, jnp.clip(ctrl, lo, hi), ctrl)
    delta = jnp.where(is_intvel & (model.act_actadr >= 0), dt * c, 0.0)
    return act.at[adr].add(delta)
