"""Differentiable-physics mode: jax.grad through the full contact step.

``spec.options["differentiable"] = True`` routes the contact solve through
the pure-jnp tree-LDL (the custom_vmap/Pallas linear-algebra ops have no
autodiff rules), making the whole step — FK, dynamics, Newton contact
solve, integration — reverse-mode differentiable. This is a capability the
reference (MuJoCo C / Warp) does not have; it is validated here against
central finite differences.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Backward passes through the unrolled Newton solve take ~minutes of XLA-CPU
# compile; keep them out of the fast CI tier.
pytestmark = pytest.mark.slow

from flygym_tpu.compose.spec import BodySpec, GeomSpec, JointSpec, ModelSpec, PairSpec
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.engine.step import step


@pytest.fixture(scope="module")
def bouncing_capsule():
    """Free capsule over a ground plane with a motor actuator: small nv so
    the unrolled-Newton backward pass compiles in seconds."""
    spec = ModelSpec("diff_world")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    body = BodySpec(name="ball", parent=None)
    body.add_joint(JointSpec(name="ballfree", type="free"))
    body.add_geom(
        GeomSpec(name="ballgeom", type="capsule", size=(0.5, 0.3), mass=1e-3)
    )
    spec.add_body(body)
    spec.pairs.append(
        PairSpec(
            geom1="ballgeom",
            geom2="ground",
            friction=(1.0, 1.0, 0.02, 1e-4, 1e-4),
            solref=(2e-4, 1.0),
            solimp=(0.98, 0.99, 1e-5, 0.5, 3.0),
            margin=1e-3,
        )
    )
    # Start in contact so the constraint solve is on the gradient path.
    spec.neutral_joint_qpos["ballfree"] = [0, 0, 0.55, 1, 0, 0, 0]
    spec.options["differentiable"] = True
    compiled = spec.compile()
    return compiled.model, make_initial_state(compiled.model)


def _rollout_loss(model, state, qvel0, n_steps=15):
    st = dataclasses.replace(state, qvel=qvel0)

    def body(s, _):
        return step(model, s), None

    st, _ = jax.lax.scan(body, st, None, length=n_steps)
    return jnp.sum(st.qpos[:3] ** 2)


class TestDifferentiableStep:
    def test_grad_matches_finite_differences(self, bouncing_capsule):
        model, state = bouncing_capsule
        qvel0 = jnp.zeros(model.nv).at[0].set(50.0)  # slide along +x

        loss = lambda v: _rollout_loss(model, state, v)
        g = np.asarray(jax.jit(jax.grad(loss))(qvel0))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

        f = jax.jit(loss)
        for i in (0, 2):  # slide dof (friction path) + normal dof (contact)
            eps = 1e-2
            fd = (
                float(f(qvel0.at[i].add(eps))) - float(f(qvel0.at[i].add(-eps)))
            ) / (2 * eps)
            # fp32 + unrolled-solver FD noise: few-percent agreement.
            assert abs(g[i] - fd) < 0.05 * max(abs(fd), 1e-3), (i, g[i], fd)

    def test_grad_wrt_model_params(self, bouncing_capsule):
        """Gradients flow to physical model parameters too (system ID)."""
        model, state = bouncing_capsule
        qvel0 = jnp.zeros(model.nv).at[0].set(50.0)

        def loss_of_gravity(gz):
            m = dataclasses.replace(
                model, gravity=jnp.array([0.0, 0.0, gz], jnp.float32)
            )
            return _rollout_loss(m, state, qvel0)

        g = float(jax.jit(jax.grad(loss_of_gravity))(-9810.0))
        assert np.isfinite(g) and g != 0.0

    def test_default_mode_unchanged(self, bouncing_capsule):
        """differentiable=True must not change the primal numerics."""
        model, state = bouncing_capsule
        fast = dataclasses.replace(model, differentiable=False)
        qvel0 = jnp.zeros(model.nv).at[0].set(50.0)
        a = float(jax.jit(lambda: _rollout_loss(model, state, qvel0))())
        b = float(jax.jit(lambda: _rollout_loss(fast, state, qvel0))())
        np.testing.assert_allclose(a, b, rtol=1e-6)
