"""The full physics step: one pure, jittable function.

Pipeline (the analog of ``mj_step``, reference ``simulation.py:74-76``):
FK → motion subspaces → velocities → spatial inertias → CRBA mass matrix →
RNEA bias → passive + actuator forces → smooth acceleration → contact solve →
semi-implicit Euler integration with implicit joint damping (MuJoCo "Euler"
integrator semantics, ``mujoco_globals.yaml:13``).

State caches (xpos, sensors, ...) correspond to the *pre-integration*
configuration, exactly like ``MjData`` after ``mj_step`` — so readouts after
``step()`` match the reference's semantics.

Everything is shape-static: ``vmap`` for world batching, ``lax.scan`` for
whole episodes on device (the TPU answer to the reference's CUDA-graph capture
loop, ``time_gpu_simulation.py:137-153``).
"""

from functools import partial

import jax
import jax.numpy as jnp

from flygym_tpu.engine import actuation, contact, dynamics, sensors
from flygym_tpu.engine.kinematics import (
    dof_subspace,
    geom_poses,
    kinematics_full,
    velocity_pass,
)
from flygym_tpu.engine.maths import quat_integrate
from flygym_tpu.engine.model import ActKind, PhysicsModel, State, compute_site_xpos

__all__ = ["step", "make_step_fn", "rollout"]


def step(model: PhysicsModel, state: State, widx=None) -> State:
    """Advance one timestep. Pure function of (model, state).

    Args:
        widx: Optional (n_groups,) pinned winner indices for compressed
            pair groups (``model.pair_groups``). Default None selects
            winners in-step from fresh FK (argmin over each group's
            distances). Passing the indices the mega-kernel's chunk-stale
            sampler chose makes this step bit-comparable to the kernel —
            the hardware fidelity check (validate_twofly_kernel.py) uses
            this instead of jitting the ~1e5-op eager emitter, which the
            TPU compile helper cannot digest.
    """
    dt = model.timestep
    qpos, qvel, ctrl = state.qpos, state.qvel, state.ctrl
    dtype = qpos.dtype

    # ---- position stage ----
    xpos, xquat, hinge_xaxis = kinematics_full(model, qpos)
    ref = xpos[model.ref_body]
    S = dof_subspace(model, xpos, hinge_xaxis, ref)
    gpos, gquat = geom_poses(model, xpos, xquat)

    # ---- velocity stage ----
    cvel, cacc_bias = velocity_pass(model, qvel, xpos, S)

    # ---- inertia / bias ----
    I_body = dynamics.body_spatial_inertias(model, xpos, xquat, ref)
    M = dynamics.crba(model, I_body, S)
    qfrc_bias = dynamics.rnea_bias(model, I_body, S, cvel, cacc_bias)

    # ---- forces ----
    qfrc_passive = dynamics.passive_forces(model, qpos, qvel)
    qfrc_act, actuator_force = actuation.actuator_forces(
        model, qpos, qvel, ctrl, state.act
    )
    qfrc_smooth = qfrc_passive + qfrc_act - qfrc_bias
    if model.welds:
        qfrc_smooth = qfrc_smooth + _weld_forces(model, qpos, qvel, M)

    # Implicit joint damping: solve (M + h diag(B)) a = f  (MuJoCo Euler).
    Mh = M + dt * jnp.diag(model.dof_damping)

    # ---- contacts (adds adhesion forces, solves constraints) ----
    qacc, con_info = contact.solve_contacts(
        model,
        Mh,
        qfrc_smooth,
        qvel,
        state.qacc,
        xpos,
        S,
        gpos,
        gquat,
        ctrl,
        ref,
        widx=widx,
    )

    # ---- integrate ----
    qvel_new = qvel + dt * qacc
    qpos_new = _integrate_qpos(model, qpos, qvel_new, dt)
    act_new = actuation.integrate_act(model, state.act, ctrl, dt)

    # ---- cached outputs (pre-integration configuration) ----
    site_xpos = compute_site_xpos(model, xpos, xquat)
    sensordata = sensors.contact_sensor_data(model, con_info)
    if model.nu:
        # Adhesion actuator force readout = gain * clamped ctrl (MuJoCo
        # reports the commanded adhesion force through actuator_force).
        lo, hi = model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1]
        c_cl = jnp.where(model.act_ctrllimited > 0, jnp.clip(ctrl, lo, hi), ctrl)
        actuator_force = jnp.where(
            model.act_kind == ActKind.ADHESION,
            model.act_gain * c_cl,
            actuator_force,
        )

    return State(
        qpos=qpos_new,
        qvel=qvel_new,
        ctrl=ctrl,
        act=act_new,
        time=state.time + dt,
        qacc=qacc,
        xpos=xpos,
        xquat=xquat,
        site_xpos=site_xpos,
        actuator_force=actuator_force,
        contact_sensordata=sensordata,
    )


def _weld_forces(model: PhysicsModel, qpos, qvel, M):
    """Soft-weld restoring wrench on welded free roots (TetheredWorld soft).

    MuJoCo's equality weld is a 6-row soft constraint with (solref, solimp)
    Baumgarte dynamics (reference ``world.py:334-366``); here it is applied
    as a mass-consistent penalty: the reference acceleration
    a_ref = -imp (k err + b vel) on the root's 6 DoFs, mapped to a
    generalized force through the columns of M (exact when the weld error
    is resisted chiefly by the root's own inertia — the tethered regime).
    Explicitly integrated; stable at the reference's solref (2e-4, 1) with
    dt = 1e-4 (omega dt = 0.5, damping dt ~ 1 under semi-implicit Euler).
    """
    from flygym_tpu.engine.maths import quat_conj, quat_mul

    qfrc = jnp.zeros_like(qpos[: model.nv])
    for _body, qadr, vadr, refpos, refquat, solref, solimp in model.welds:
        p = qpos[qadr : qadr + 3]
        q = qpos[qadr + 3 : qadr + 7]
        e_lin = p - jnp.asarray(refpos, qpos.dtype)
        q_err = quat_mul(q, quat_conj(jnp.asarray(refquat, qpos.dtype)))
        # World-frame small-rotation vector, sign-fixed to the short arc.
        e_rot = 2.0 * jnp.sign(q_err[0]) * q_err[1:4]
        err = jnp.concatenate([e_lin, e_rot])
        vel = qvel[vadr : vadr + 6]

        imp = _impedance_scalar(solimp, jnp.linalg.norm(err))
        tc, dr = solref
        dmax = solimp[1]
        k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
        b = 2.0 / (dmax * tc)
        a_ref = -imp * (k * err + b * vel)
        qfrc = qfrc + M[:, vadr : vadr + 6] @ a_ref
    return qfrc


def _impedance_scalar(solimp, violation):
    """MuJoCo solimp impedance for a single scalar violation."""
    from flygym_tpu.engine.contact import _impedance

    row = jnp.asarray(solimp, violation.dtype)[None, :]
    return _impedance(row, -violation[None])[0]


def _integrate_qpos(model: PhysicsModel, qpos, qvel, dt):
    """Semi-implicit Euler position update (quaternion-exact for free roots)."""
    qpos_new = qpos
    if model.nhinge:
        adr = model.hinge_qadr
        qpos_new = qpos_new.at[adr].add(dt * qvel[model.hinge_vadr])
    for _body, qadr, vadr in model.free_joints:
        pos = qpos[qadr : qadr + 3] + dt * qvel[vadr : vadr + 3]
        quat = quat_integrate(
            qpos[qadr + 3 : qadr + 7], qvel[vadr + 3 : vadr + 6], dt
        )
        qpos_new = qpos_new.at[qadr : qadr + 3].set(pos)
        qpos_new = qpos_new.at[qadr + 3 : qadr + 7].set(quat)
    return qpos_new


def make_step_fn(model: PhysicsModel, donate: bool = True):
    """A jitted single-world step function closed over the model."""
    fn = partial(step, model)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


@partial(jax.jit, static_argnames=("n_steps", "record"))
def rollout(
    model: PhysicsModel,
    state: State,
    ctrl_seq: jnp.ndarray,
    n_steps: int,
    record: bool = True,
):
    """Scan a whole episode on device: the TPU equivalent of the reference's
    CUDA-graph replay loop (``time_gpu_simulation.py:137-153``).

    Args:
        ctrl_seq: (n_steps, nu) control inputs per step (ignored slots keep the
            previous ctrl if NaN).
        record: Stack the per-step qpos trajectory. False avoids
            materializing it (e.g. warmup/settling runs).

    Returns:
        (final_state, stacked qpos trajectory (n_steps, nq) or None).
    """

    import dataclasses

    def body(carry, ctrl_t):
        ctrl = jnp.where(jnp.isnan(ctrl_t), carry.ctrl, ctrl_t)
        new = step(model, dataclasses.replace(carry, ctrl=ctrl))
        return new, new.qpos if record else None

    final, traj = jax.lax.scan(body, state, ctrl_seq, length=n_steps)
    return final, traj


@partial(
    jax.jit, static_argnames=("n_steps", "batched_step", "record", "kstep_fn")
)
def rollout_batched(
    model: PhysicsModel,
    state: State,
    ctrl_seq: jnp.ndarray,
    n_steps: int,
    batched_step=None,
    record: bool = True,
    kstep_fn=None,
):
    """Batched episode scan: state has a leading world axis, ``ctrl_seq`` is
    (n_steps, n_worlds, nu). One XLA program for the whole episode across all
    worlds — the direct analog of the benchmark's captured CUDA graph replay
    (``time_gpu_simulation.py:148-153``), with the step table lookup fused in.

    Args:
        batched_step: Optional replacement for ``vmap(step)`` taking the
            batched state directly (e.g. the Pallas mega-kernel,
            ops/megastep.py).
        kstep_fn: Optional K-step fused mega-kernel
            (``make_megastep(model, k_steps=K)``); ``n_steps`` must be a
            multiple of its ``k_steps``. The scan then runs n_steps/K
            kernel launches, NaN ctrl forward-filling and terrain-plane
            sampling once per chunk.
    """
    import dataclasses
    import os

    if kstep_fn is not None:
        K = kstep_fn.k_steps
        n_outer = n_steps // K
        sample_planes = getattr(kstep_fn, "sample_planes", None)

        def outer_k(st, ctrl_chunk):
            # Forward-fill the NaN "hold previous ctrl" slots through the
            # chunk (tiny scan over K (B, nu) slices).
            def ff(c, ct):
                eff = jnp.where(jnp.isnan(ct), c, ct)
                return eff, eff

            _, eff = jax.lax.scan(ff, st.ctrl, ctrl_chunk)
            planes = sample_planes(st) if sample_planes is not None else None
            new, qpos_traj = kstep_fn(st, eff, planes)
            return new, qpos_traj if record else None

        chunks = ctrl_seq.reshape((n_outer, K) + ctrl_seq.shape[1:])
        final, traj = jax.lax.scan(outer_k, state, chunks)
        if not record:
            return final, None
        return final, traj.reshape((n_steps,) + traj.shape[2:])

    if batched_step is None:
        vstep = jax.vmap(step, in_axes=(None, 0))
        batched_step = lambda s: vstep(model, s)

    # Heightfield terrain: the mega-step kernel exposes sample_planes so the
    # (expensive) out-of-kernel ground-plane sampling can run once per K
    # steps instead of every step — candidates move ~1e-3 mm/step vs
    # ~0.25 mm terrain cells, so a K-step-stale sample stays far below
    # contact resolution (same argument as the kernel's 1-step-stale FK).
    sample_planes = getattr(batched_step, "sample_planes", None)
    resample = int(os.environ.get("FLYGYM_TPU_TERRAIN_RESAMPLE", "8"))
    if sample_planes is not None and resample > 1 and n_steps % resample == 0:
        n_outer = n_steps // resample

        def inner(carry, ctrl_t):
            st, planes = carry
            ctrl = jnp.where(jnp.isnan(ctrl_t), st.ctrl, ctrl_t)
            new = batched_step(dataclasses.replace(st, ctrl=ctrl), planes)
            return (new, planes), new.qpos if record else None

        def outer(st, ctrl_chunk):
            planes = sample_planes(st)
            (st, _), traj = jax.lax.scan(inner, (st, planes), ctrl_chunk)
            return st, traj

        chunks = ctrl_seq.reshape((n_outer, resample) + ctrl_seq.shape[1:])
        final, traj = jax.lax.scan(outer, state, chunks)
        if not record:
            return final, None
        return final, traj.reshape((n_steps,) + traj.shape[2:])

    def body(carry, ctrl_t):
        ctrl = jnp.where(jnp.isnan(ctrl_t), carry.ctrl, ctrl_t)
        new = batched_step(dataclasses.replace(carry, ctrl=ctrl))
        return new, new.qpos if record else None

    final, traj = jax.lax.scan(body, state, ctrl_seq, length=n_steps)
    return final, traj
