"""RL proof-of-life: ES training on VectorFlyEnv must actually LEARN.

BASELINE.json config 5 claims the batched env path is "for RL training";
the smoke tier only checks the loop runs. This tier asserts reward
improvement on the exact small configuration of
``examples/13_rl_training_es.py --small`` (antithetic OpenAI-ES over a
sinusoidal gait generator, forward-speed reward), which reliably moves
mean population reward ~5x in 10 updates (measured on the CPU backend).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = [pytest.mark.slow]

EXAMPLES_DIR = Path(__file__).resolve().parents[2] / "examples"


def _load(name):
    path = EXAMPLES_DIR / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"example_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_es_training_improves_reward():
    mod = _load("13_rl_training_es")
    curve, _theta = mod.train(
        n_envs=64, n_updates=10, episode_len=25, seed=0
    )
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    first = curve[:2].mean()
    last = curve[-2:].mean()
    # Measured: +0.013 -> +0.065 (5x). Require a conservative 2x margin
    # so fp/backend noise cannot flake the tier.
    assert last > 2.0 * first, (
        f"ES did not learn: first-updates mean {first:+.5f}, "
        f"last-updates mean {last:+.5f}, curve {np.round(curve, 5)}"
    )
