"""Pallas retina kernel vs the vmapped jnp raycast (the correctness oracle).

Runs the kernel through the Pallas interpreter so CI covers the pallas_call
plumbing (row packing, const tables, tile loop, lane padding) without TPU
hardware — the same strategy as the mega-step interpret tests. Uses a tiny
3-geom scene: the kernel unrolls every scene geom, so the full fly's ~70
geoms make interpret mode pathologically slow on CPU while adding no code
coverage (the per-geom code is identical).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.compose.spec import BodySpec, GeomSpec, JointSpec, ModelSpec
from flygym_tpu.engine.kinematics import forward_kinematics
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.vision import Retina


@pytest.fixture(scope="module")
def tiny_scene():
    """Ground plane + free capsule 'head' (the eye body) + fixed capsule +
    sphere: every kernel branch (capsule cylinder/endcaps, sphere, ground
    checker, sky) gets hit by some ommatidium."""
    spec = ModelSpec("tiny")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    head = BodySpec(name="head", parent=None)
    head.add_joint(JointSpec(name="headfree", type="free"))
    head.add_geom(
        GeomSpec(name="headgeom", type="capsule", size=(0.4, 0.3), mass=1e-3,
                 rgba=(0.9, 0.6, 0.2, 1.0))
    )
    spec.add_body(head)
    post = BodySpec(name="post", parent=None)
    post.add_geom(
        GeomSpec(name="postgeom", type="capsule", size=(0.8, 3.0), mass=1e-3,
                 pos=(6.0, 2.0, 3.0), rgba=(0.2, 0.4, 0.9, 1.0))
    )
    spec.add_body(post)
    ball = BodySpec(name="ball", parent=None)
    ball.add_geom(
        GeomSpec(name="ballgeom", type="sphere", size=(1.5,), mass=1e-3,
                 pos=(8.0, -4.0, 1.5), rgba=(1.0, 0.1, 0.1, 1.0))
    )
    spec.add_body(ball)
    spec.neutral_joint_qpos["headfree"] = [0, 0, 1.5, 1, 0, 0, 0]
    compiled = spec.compile()
    model = compiled.model
    state = make_initial_state(model)
    hid = compiled.body_name2id["head"]
    retina = Retina.build(model, left_eye_body=hid, right_eye_body=hid, n_rings=3)
    return model, state, retina


def _batched_states(model, state, n, seed=0):
    rng = np.random.default_rng(seed)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), state
    )
    qpos = np.asarray(batched.qpos).copy()
    qpos[:, :2] += rng.uniform(-1.5, 1.5, (n, 2))
    yaw = rng.uniform(-0.6, 0.6, n)
    qpos[:, 3], qpos[:, 6] = np.cos(yaw / 2), np.sin(yaw / 2)
    batched = dataclasses.replace(batched, qpos=jnp.asarray(qpos))
    xp, xq = jax.vmap(lambda q: forward_kinematics(model, q))(batched.qpos)
    return dataclasses.replace(batched, xpos=xp, xquat=xq)


class TestRetinaKernel:
    @pytest.mark.parametrize("layout", ["worlds", "rays"])
    def test_interpret_matches_jnp(self, tiny_scene, layout):
        """Both kernel layouts against the jnp oracle: worlds-major
        (worlds in lanes, big batches) and ray-major (rays in lanes,
        grid over worlds — the small-batch / single-fly step+render
        path, 2026-08-20)."""
        model, state, retina = tiny_scene
        bstate = _batched_states(model, state, 4)

        kernel = retina.make_render_batched(
            model, interpret=True, layout=layout
        )
        oracle = jax.jit(jax.vmap(lambda s: retina.render(model, s)))

        out_k = np.asarray(kernel(bstate))
        out_j = np.asarray(oracle(bstate))
        assert out_k.shape == (4, 2, retina.n_ommatidia, 2)
        assert np.isfinite(out_k).all()
        # Identical shading model; tolerance covers fp reassociation and
        # rays grazing a silhouette edge.
        agree = np.abs(out_k - out_j) < 1e-3
        assert agree.mean() > 0.995, agree.mean()
        # Scenes differ per world, so the renders must too.
        assert np.abs(out_k[0] - out_k[1]).max() > 1e-4

    def test_layouts_agree(self, tiny_scene):
        """worlds-major and ray-major are the same math on the same
        inputs — they must agree to fp-reassociation scale, not just
        through the oracle's looser silhouette-edge tolerance."""
        from flygym_tpu.ops.retina_pallas import make_retina_kernel

        model, state, retina = tiny_scene
        bstate = _batched_states(model, state, 4, seed=2)
        out_w = np.asarray(
            make_retina_kernel(
                model, retina, interpret=True, layout="worlds"
            )(bstate)
        )
        out_r = np.asarray(
            make_retina_kernel(
                model, retina, interpret=True, layout="rays"
            )(bstate)
        )
        agree = np.abs(out_w - out_r) < 1e-5
        assert agree.mean() > 0.999, agree.mean()

    def test_lane_padding_roundtrip(self, tiny_scene):
        """Batch sizes off the 128-lane grid pad and slice correctly."""
        model, state, retina = tiny_scene
        bstate = _batched_states(model, state, 3, seed=1)
        kernel = retina.make_render_batched(model, interpret=True)
        out = np.asarray(kernel(bstate))
        assert out.shape == (3, 2, retina.n_ommatidia, 2)
        assert np.isfinite(out).all()

    def test_hfield_gate(self, tiny_scene):
        """Heightfield worlds must stay on the jnp path (the kernel shades a
        flat ground plane only)."""
        model, state, retina = tiny_scene
        from flygym_tpu.ops.retina_pallas import retina_kernel_supported

        assert retina_kernel_supported(model)
        hfield_model = dataclasses.replace(model, has_hfield=True)
        assert not retina_kernel_supported(hfield_model)

        # make_render_batched must not touch the kernel for hfield models.
        import flygym_tpu.ops.retina_pallas as rp

        orig = rp.make_retina_kernel
        rp.make_retina_kernel = lambda *a, **k: pytest.fail(
            "kernel built for an hfield model"
        )
        try:
            render = retina.make_render_batched(hfield_model, interpret=True)
        finally:
            rp.make_retina_kernel = orig
        assert render is not None
