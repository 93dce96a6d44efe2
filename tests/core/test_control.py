"""Tests for the CPG and hybrid controllers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flygym_tpu.compose import ActuatorType
from flygym_tpu.control import (
    CPGController,
    CPGNetwork,
    CPGState,
    HybridController,
    HybridState,
    extract_preprogrammed_steps,
    tripod_phase_biases,
)
from flygym_tpu.demo import MotionSnippet, make_model


@pytest.fixture(scope="module")
def steps_data():
    fly, _w, _c = make_model()
    dof_order = fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    return extract_preprogrammed_steps(MotionSnippet(), dof_order)


class TestTripod:
    def test_phase_biases(self):
        phi = tripod_phase_biases()
        assert phi.shape == (6, 6)
        assert phi[0, 0] == 0.0
        # lf (0) and rm (4) are in the same tripod; lf and lm (1) are not.
        assert phi[0, 4] == 0.0
        assert phi[0, 1] == pytest.approx(np.pi)


class TestPreprogrammedSteps:
    def test_shapes(self, steps_data):
        assert steps_data["tables"].shape[0] == 6
        assert steps_data["tables"].shape[2] == 7
        assert steps_data["stance"].shape == steps_data["tables"].shape[:2]
        assert steps_data["dof_map"].shape == (42, 2)

    def test_stride_frequency_plausible(self, steps_data):
        assert 2.0 < steps_data["freq_hz"] < 30.0

    def test_stance_mix(self, steps_data):
        frac = steps_data["stance"].mean()
        assert 0.2 < frac < 0.9  # both stance and swing phases present


class TestCPGNetwork:
    def test_phase_locking_to_tripod(self):
        net = CPGNetwork(intrinsic_freq_hz=10.0)
        state = CPGState.init(0)
        dt = 1e-3
        for _ in range(3000):
            state = net.step(state, dt)
        phase = np.asarray(state.phase)
        # Within-tripod phase differences ~0; across ~pi.
        d_same = np.angle(np.exp(1j * (phase[0] - phase[4])))
        d_anti = np.angle(np.exp(1j * (phase[0] - phase[1])))
        assert abs(d_same) < 0.3
        assert abs(abs(d_anti) - np.pi) < 0.3

    def test_amplitude_converges(self):
        net = CPGNetwork(target_amplitude=1.0)
        state = CPGState.init(0)
        for _ in range(5000):
            state = net.step(state, 1e-3)
        assert np.allclose(np.asarray(state.amplitude), 1.0, atol=0.05)


class TestCPGController:
    def test_output_shapes(self, steps_data):
        ctrl = CPGController(steps_data)
        state = ctrl.init_state()
        state, targets, adhesion = jax.jit(ctrl)(state)
        assert targets.shape == (42,)
        assert adhesion.shape == (6,)
        assert np.all((np.asarray(adhesion) == 1.0) | (np.asarray(adhesion) == 100.0))

    def test_targets_oscillate(self, steps_data):
        ctrl = CPGController(steps_data)
        state = ctrl.init_state()
        history = []
        step = jax.jit(ctrl)
        for _ in range(4000):
            state, targets, _ = step(state)
            history.append(np.asarray(targets))
        history = np.stack(history)
        # After amplitude ramp-up, joints should sweep a meaningful range.
        assert history[2000:].std(axis=0).max() > 0.1

    def test_scans_on_device(self, steps_data):
        ctrl = CPGController(steps_data)

        @jax.jit
        def run(state):
            def body(s, _):
                s, targets, adhesion = ctrl(s)
                return s, (targets, adhesion)

            return jax.lax.scan(body, state, None, length=100)

        _, (targets, adhesion) = run(ctrl.init_state())
        assert targets.shape == (100, 42)
        assert adhesion.shape == (100, 6)


class TestHybridController:
    def test_retraction_triggers_on_low_tip(self, steps_data):
        hybrid = HybridController(cpg=CPGController(steps_data))
        state = hybrid.init_state()
        tip_heights = jnp.array([0.5, 0.5, 0.5, 0.5, 0.5, -0.5])  # rh stuck
        forces = jnp.zeros((6, 3))
        heading = jnp.array([1.0, 0.0, 0.0])
        for _ in range(200):
            state, targets, adhesion = hybrid(state, tip_heights, forces, heading)
        corr = np.asarray(state.retraction)
        assert corr[5] > 0.5
        assert np.all(corr[:5] < 0.1)
        # The stuck leg's adhesion is released.
        assert np.asarray(adhesion)[5] == 1.0

    def test_stumbling_triggers_on_opposing_force(self, steps_data):
        hybrid = HybridController(cpg=CPGController(steps_data))
        state = hybrid.init_state()
        tips = jnp.full((6,), 0.5)
        forces = jnp.zeros((6, 3)).at[2, 0].set(-5.0)  # lh pushed backward
        heading = jnp.array([1.0, 0.0, 0.0])
        for _ in range(200):
            state, *_ = hybrid(state, tips, forces, heading)
        assert np.asarray(state.stumbling)[2] > 0.5

    def test_corrections_decay(self, steps_data):
        hybrid = HybridController(cpg=CPGController(steps_data))
        state = HybridState(
            cpg=CPGState.init(0),
            retraction=jnp.full((6,), 1.0),
            stumbling=jnp.zeros(6),
        )
        tips = jnp.full((6,), 0.5)
        forces = jnp.zeros((6, 3))
        heading = jnp.array([1.0, 0.0, 0.0])
        for _ in range(500):
            state, *_ = hybrid(state, tips, forces, heading)
        assert np.all(np.asarray(state.retraction) < 0.05)
