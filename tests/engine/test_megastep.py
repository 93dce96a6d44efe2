"""Mega-step emitter vs the jnp engine.

The Pallas mega-kernel's per-world computation (ops/megastep.py emit_step)
is pure elementwise jnp over lane vectors, so it can be executed directly on
(B,) batch vectors and compared against the vmapped reference step — the
same code that runs inside the kernel, minus the Pallas plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flygym_tpu
from flygym_tpu.anatomy import ActuatedDOFPreset, AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.engine.step import step
from flygym_tpu.ops import megastep as ms
from flygym_tpu.utils.math import Rotation3D

B = 4


def _world(actuator=ActuatorType.POSITION, **kw):
    fly = Fly(name="f")
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    if actuator == ActuatorType.POSITION:
        kw.setdefault("kp", 50.0)
        kw.setdefault("neutral_input", KinematicPosePreset.NEUTRAL)
    fly.add_actuators(dofs, actuator, **kw)
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    return world


def _batched_state(model, state0, n_steps=0, ctrl=None):
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    if ctrl is not None:
        import dataclasses

        bstate = dataclasses.replace(
            bstate, ctrl=jnp.broadcast_to(ctrl, (B,) + ctrl.shape)
        )
    if n_steps:
        f = jax.jit(jax.vmap(lambda s: step(model, s)))
        for _ in range(n_steps):
            bstate = f(bstate)
    return bstate


def _emit_batched(model, bstate):
    """Run the emitter on (B,) lane vectors and pack a State-like dict."""
    st = ms._Static(model)

    def cols(x):
        return [x[:, i] for i in range(x.shape[1])]

    r = ms.emit_step(
        st,
        cols(bstate.qpos),
        cols(bstate.qvel),
        cols(bstate.ctrl),
        cols(bstate.act),
        cols(bstate.qacc),
    )
    pack = lambda lst: jnp.stack(lst, axis=1) if lst else jnp.zeros((B, 0))
    out = dict(
        qpos=pack(r["qpos"]),
        qvel=pack(r["qvel"]),
        act=pack(r["act"]),
        qacc=pack(r["qacc"]),
        xpos=jnp.stack([jnp.stack(p, 1) for p in r["xpos"]], 1),
        xquat=jnp.stack([jnp.stack(p, 1) for p in r["xquat"]], 1),
        actuator_force=pack(r["actuator_force"]),
        sensordata=(
            jnp.stack([jnp.stack(s, 1) for s in r["sensordata"]], 1)
            if r["sensordata"]
            else jnp.zeros((B, 0, 16))
        ),
    )
    return out


@pytest.fixture(scope="module")
def settled():
    world = _world()
    model, state0 = world.compile()
    adh = [u for u in range(model.nu)]  # ctrl: adhesion on (clamped >= 1)
    ctrl = jnp.zeros((model.nu,), jnp.float32)
    bstate = _batched_state(model, state0, n_steps=300, ctrl=ctrl)
    return model, bstate


class TestEmitterMatchesEngine:
    def test_single_step_outputs_match(self, settled):
        model, bstate = settled
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        # Eager execution: the emitter unrolls to ~1e5 tiny ops — jitting
        # it on CPU takes tens of minutes, eager a few seconds.
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["xpos"]), np.asarray(ref.xpos), atol=1e-5
        )
        np.testing.assert_allclose(
            # Sequential lane accumulation vs XLA matmul trees: fp32
            # summation-order differences on near-cancelling ~1e4 terms.
            np.asarray(got["qacc"]), np.asarray(ref.qacc), rtol=6e-3, atol=0.2
        )
        np.testing.assert_allclose(
            np.asarray(got["qvel"]), np.asarray(ref.qvel), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["qpos"]), np.asarray(ref.qpos), atol=1e-6 + 2e-4 * float(model.timestep)
        )
        np.testing.assert_allclose(
            np.asarray(got["actuator_force"]),
            np.asarray(ref.actuator_force),
            rtol=1e-4,
            atol=1e-4,
        )
        # Sensor rows: found flag + normal force.
        np.testing.assert_allclose(
            np.asarray(got["sensordata"])[..., :4],
            np.asarray(ref.contact_sensordata)[..., :4],
            atol=2e-3,
        )

    def test_trajectory_tracks_engine(self, settled):
        """50 chained emitter steps stay on the engine's trajectory."""
        model, bstate = settled
        from flygym_tpu.engine.model import State

        f_ref = jax.jit(jax.vmap(lambda s: step(model, s)))

        def emit_state_step(s):
            got = _emit_batched(model, s)
            return State(
                qpos=got["qpos"],
                qvel=got["qvel"],
                ctrl=s.ctrl,
                act=got["act"],
                time=s.time + model.timestep,
                qacc=got["qacc"],
                xpos=got["xpos"],
                xquat=got["xquat"],
                site_xpos=s.site_xpos,
                actuator_force=got["actuator_force"],
                contact_sensordata=got["sensordata"],
            )

        f_emit = emit_state_step  # eager (see note above)
        s_ref, s_emit = bstate, bstate
        for _ in range(20):
            s_ref = f_ref(s_ref)
            s_emit = f_emit(s_emit)
        np.testing.assert_allclose(
            np.asarray(s_emit.qpos), np.asarray(s_ref.qpos), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(s_emit.qvel), np.asarray(s_ref.qvel), atol=5e-2
        )


class TestEmitterMuscle:
    def test_muscle_forces_match(self):
        world = _world(
            ActuatorType.MUSCLE,
            lengthrange=(-1.0, 1.0),
            forcelimited=False,
            forcerange=(-50, 50),
            ctrlrange=(0.0, 1.0),
        )
        model, state0 = world.compile()
        ctrl = jnp.full((model.nu,), 0.7, jnp.float32)
        bstate = _batched_state(model, state0, n_steps=80, ctrl=ctrl)
        ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
        # Eager execution: the emitter unrolls to ~1e5 tiny ops — jitting
        # it on CPU takes tens of minutes, eager a few seconds.
        got = _emit_batched(model, bstate)
        np.testing.assert_allclose(
            np.asarray(got["actuator_force"]),
            np.asarray(ref.actuator_force),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["act"]), np.asarray(ref.act), atol=1e-6
        )
