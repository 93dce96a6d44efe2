"""Kinematic pose conversion between joint axis orders, via differentiable IK.

Parity reference: flygym ``utils/pose_conversion.py`` (fit_qpos_to_xpos_xquat
:36-113, qpos_to_kinematic_pose :116-144, convert_pose_axis_order :147-194).

The reference runs scipy L-BFGS-B over finite-differenced MuJoCo forward
kinematics. Here the forward kinematics is the engine's own differentiable
FK, so the fit is a jitted Adam loop with exact gradients — typically an
order of magnitude fewer cost evaluations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.anatomy import AxisOrder, JointDOF, JointPreset, Skeleton

__all__ = [
    "fit_qpos_to_xpos_xquat",
    "qpos_to_kinematic_pose",
    "convert_pose_axis_order",
]


def fit_qpos_to_xpos_xquat(
    model,
    target_xpos: np.ndarray,
    target_xquat: np.ndarray,
    fitting_pos_weight: float = 1.0,
    fitting_rot_weight: float = 1.0,
    max_iters: int = 2000,
    learning_rate: float = 0.05,
) -> np.ndarray:
    """Fit qpos so the model's body poses match the targets.

    Cost per body: ``pos_w * |dpos|^4 + rot_w * (1 - (q1·q2)^2)`` — the same
    double-cover-invariant rotation cost as the reference
    (``pose_conversion.py:71-82``).

    Returns:
        Optimized qpos, shape (nq,).
    """
    from flygym_tpu.engine.kinematics import forward_kinematics

    target_xpos = jnp.asarray(target_xpos, jnp.float32)
    target_xquat = jnp.asarray(target_xquat, jnp.float32)
    tq = target_xquat / jnp.linalg.norm(target_xquat, axis=-1, keepdims=True)

    def cost(qpos):
        xpos, xquat = forward_kinematics(model, qpos)
        dpos = xpos - target_xpos
        # Quadratic position cost (the reference uses |dpos|^4, which is
        # fine for L-BFGS but starves first-order methods of gradient near
        # the optimum; the minimizer is the same).
        pos_cost = jnp.sum(dpos * dpos)
        fq = xquat / jnp.linalg.norm(xquat, axis=-1, keepdims=True)
        dot = jnp.clip(jnp.abs(jnp.sum(fq * tq, axis=-1)), 0.0, 1.0)
        rot_cost = jnp.sum(1.0 - dot**2)
        return fitting_pos_weight * pos_cost + fitting_rot_weight * rot_cost

    import optax

    schedule = optax.cosine_decay_schedule(learning_rate, max_iters, 1e-2)
    opt = optax.adam(schedule)

    @jax.jit
    def run(qpos0):
        state0 = opt.init(qpos0)

        def step_fn(carry, _):
            q, s = carry
            value, grad = jax.value_and_grad(cost)(q)
            updates, s = opt.update(grad, s)
            q = optax.apply_updates(q, updates)
            return (q, s), value

        (q, _), values = jax.lax.scan(
            step_fn, (qpos0, state0), None, length=max_iters
        )
        return q, values

    qpos0 = jnp.zeros((model.nq,), jnp.float32)
    solved, values = run(qpos0)
    return np.asarray(solved)


def qpos_to_kinematic_pose(compiled, qpos: np.ndarray, axis_order: AxisOrder):
    """Convert a qpos vector to a KinematicPose (left side only; the right
    side is populated by mirroring, ``pose_conversion.py:116-144``)."""
    from flygym_tpu.compose.pose import KinematicPose

    angles = {}
    for joint_name, qadr in compiled.hinge_qadr.items():
        dof = JointDOF.from_name(joint_name.split("/")[-1])
        if dof.child.name[0] != "r":
            angles[dof.name] = float(qpos[qadr])
    return KinematicPose(
        joint_angles_rad_dict=angles,
        axis_order=axis_order,
        mirror_left2right=True,
    )


def convert_pose_axis_order(
    pose,
    target_axis_order: AxisOrder,
    joint_preset: JointPreset = JointPreset.ALL_BIOLOGICAL,
    ref_fly_kwargs: dict = {},
    fitted_fly_kwargs: dict = {},
):
    """Convert a KinematicPose to a different axis order via differentiable IK.

    Builds two fly models (source and target axis orders), computes the
    source model's body poses at the pose, then fits the target model's joint
    angles to reproduce them (``pose_conversion.py:147-194``).
    """
    from flygym_tpu.compose.fly import Fly

    ref_fly = Fly(**ref_fly_kwargs)
    ref_skeleton = Skeleton(axis_order=pose.axis_order, joint_preset=joint_preset)
    ref_fly.add_joints(ref_skeleton, neutral_pose=pose)
    ref_model, ref_state = ref_fly.compile()

    fitted_fly = Fly(**fitted_fly_kwargs)
    fitted_skeleton = Skeleton(
        axis_order=target_axis_order, joint_preset=joint_preset
    )
    fitted_fly.add_joints(fitted_skeleton, neutral_pose=pose)
    fitted_model, _ = fitted_fly.compile()

    ref_names = list(ref_fly.compiled.body_name2id)
    fitted_names = list(fitted_fly.compiled.body_name2id)
    if ref_names != fitted_names:
        raise RuntimeError("Fly models have different body names.")

    solved_qpos = fit_qpos_to_xpos_xquat(
        fitted_model,
        target_xpos=np.asarray(ref_state.xpos),
        target_xquat=np.asarray(ref_state.xquat),
    )
    return qpos_to_kinematic_pose(
        fitted_fly.compiled, solved_qpos, target_axis_order
    )
