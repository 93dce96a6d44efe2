"""Tutorial 10 — Gradient-based optimization through the physics.

Differentiable mode makes the whole rollout — contacts included — a
function you can take `jax.grad` of. Here we optimize a per-DoF static
offset added to the neutral stance so the fly *leans forward* as far as
possible in 40 ms without falling (center-of-mass height penalty), using
plain Adam on analytic gradients. No RL, no sampling: the physics is the
loss function.

Run:  python examples/10_gradient_optimization.py
(first grad compile takes a few minutes; iterations are fast after that)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.anatomy import Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.engine.step import step
from flygym_tpu.utils.math import Rotation3D


def main(n_steps: int = 400, n_iters: int = 30):
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order="ypr", joint_preset="legs_only"),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.add_actuators(
        fly.skeleton.get_actuated_dofs_from_preset("legs_active_only"),
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.1), Rotation3D("quat", (1, 0, 0, 0)))
    world.spec.options["differentiable"] = True
    model, state0 = world.compile()

    c = world.compiled
    act_ids = jnp.asarray(
        [
            c.actuator_name2id[a.full_identifier]
            for a in fly.jointdof_to_specactuator_by_type[
                ActuatorType.POSITION
            ].values()
        ]
    )
    adh_ids = jnp.asarray(
        [
            c.actuator_name2id[fly.leg_to_adhesionactuator[leg].full_identifier]
            for leg in fly.get_legs_order()
        ]
    )
    root = c.body_name2id[f"f/{fly.root_segment.name}"]
    neutral_targets = state0.ctrl[act_ids]
    z0 = float(state0.xpos[root, 2])

    def loss(offset):
        ctrl = state0.ctrl.at[act_ids].add(offset).at[adh_ids].set(100.0)
        st = dataclasses.replace(state0, ctrl=ctrl)

        def body(s, _):
            return step(model, s), None

        st, _ = jax.lax.scan(body, st, None, length=n_steps)
        lean = st.xpos[root, 0]  # forward displacement of the thorax (mm)
        fall = jnp.maximum(z0 - st.xpos[root, 2] - 0.15, 0.0)  # height drop
        return -lean + 25.0 * fall**2, (lean, st.xpos[root, 2])

    grad_fn = jax.jit(jax.value_and_grad(loss, has_aux=True))

    offset = jnp.zeros_like(neutral_targets)
    m = jnp.zeros_like(offset)
    v = jnp.zeros_like(offset)
    lr, b1, b2 = 0.02, 0.9, 0.999
    for i in range(n_iters):
        (val, (lean, z)), g = grad_fn(offset)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        offset = offset - lr * mh / (jnp.sqrt(vh) + 1e-8)
        offset = jnp.clip(offset, -0.5, 0.5)  # stay near the stance
        if i % 5 == 0 or i == n_iters - 1:
            print(
                f"iter {i:3d}: loss {float(val):+.4f}  "
                f"lean {float(lean):+.3f} mm  thorax z {float(z):.3f} mm"
            )

    print(
        f"optimized stance leans {float(lean):+.3f} mm forward "
        f"(started at +0.000) without falling — pure gradient descent "
        f"through {n_steps} contact-physics steps."
    )


if __name__ == "__main__":
    main()
