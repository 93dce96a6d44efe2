"""Smoke tier: every shipped example runs end-to-end with tiny step counts.

The reference keeps its tutorials executable in CI by running the core test
matrix over the same flows (flygym ``.github/workflows/tests.yml:9-33``);
here each ``examples/NN_*.py`` is imported and its ``main()`` driven with
reduced sizes on the CPU backend so the examples cannot rot silently.

Run just this tier:  python -m pytest -m examples -q
"""

import importlib.util
import sys
from pathlib import Path

import pytest

pytestmark = [pytest.mark.examples, pytest.mark.slow]

EXAMPLES_DIR = Path(__file__).resolve().parents[2] / "examples"


def _load(name):
    path = EXAMPLES_DIR / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"example_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_01_build_a_fly():
    _load("01_build_a_fly").main()


def test_02_replay_recorded_walking():
    _load("02_replay_recorded_walking").main(
        n_steps=100, settle_steps=100, render=False
    )


def test_03_batched_simulation():
    _load("03_batched_simulation").main(n_worlds=8, n_steps=50)


def test_04_cpg_walking():
    _load("04_cpg_walking").main(n_steps=200)


def test_05_vision_olfaction():
    _load("05_vision_olfaction").main()


def test_06_rl_environment():
    _load("06_rl_environment").main(n_envs=4)


def test_07_visual_taxis():
    _load("07_visual_taxis").main(n_control_steps=3, physics_per_control=5)


def test_08_hybrid_rugged_terrain():
    _load("08_hybrid_rugged_terrain").main(n_steps=100)


def test_09_multimodal_navigation():
    _load("09_multimodal_navigation").main(n_envs=2)


def test_10_gradient_optimization():
    _load("10_gradient_optimization").main(n_steps=40, n_iters=2)


def test_11_two_flies_interacting():
    _load("11_two_flies_interacting").main()


def test_12_multichip_scaling():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    _load("12_multichip_scaling").main()


def test_13_rl_training_es():
    import numpy as np

    curve = _load("13_rl_training_es").main(
        n_envs=8, n_updates=2, episode_len=5
    )
    assert np.isfinite(curve).all() and len(curve) == 2
