"""Dispatch-bound path benchmark: per-call stepping, no scan.

Measures the interactive paths the headline benchmark (bench.py — scanned
episodes) deliberately amortizes away, so regressions in per-step dispatch
overhead are visible:

  1. single-fly eager loop: `sim.step()` per step on the default backend —
     the analog of the reference's CPU `mj_step` loop (~20,000 steps/s,
     ~2x realtime, BASELINE.md).
  2. batched eager loop: `BatchSimulation.step()` per step (the per-call
     kernel/vmap dispatch path, analog of the reference's CPU-driven GPU
     loop, ``warp/simulation.py:260-263``).

Run:  python scripts/dev/bench_dispatch.py [n_steps] [batch_worlds]
      python scripts/dev/bench_dispatch.py --cpu     # host-CPU numbers
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

if "--cpu" in sys.argv:
    # The env var alone does not beat an installed TPU plugin; both are
    # needed before backend init (same recipe as tests/conftest.py).
    sys.argv.remove("--cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax

import flygym_tpu
from flygym_tpu.batch import BatchSimulation
from flygym_tpu.demo import make_model


def timed_loop(step_fn, sync, n_steps):
    step_fn()  # compile
    sync()
    start = time.perf_counter()
    for _ in range(n_steps):
        step_fn()
    sync()
    return time.perf_counter() - start


def main(n_steps: int = 2000, batch_worlds: int = 1024):
    backend = jax.default_backend()
    _, world, _ = make_model(spawn_position=(0, 0, 1.2))

    sim = flygym_tpu.Simulation(world)
    sim.set_leg_adhesion_states(next(iter(world.fly_lookup)), np.ones(6))
    wall = timed_loop(
        sim.step, lambda: np.asarray(sim.state.qpos[0]), n_steps
    )
    sps = n_steps / wall
    print(
        f"[{backend}] single-fly eager loop: {sps:,.0f} steps/s "
        f"({sps * sim.timestep:.2f}x realtime; reference CPU ~2x)"
    )

    # Single-fly scan path: the intended API for headless runs; this is
    # the number to compare against the reference's ~2x-realtime CPU claim.
    sim.rollout(None, n_steps)  # compile
    start = time.perf_counter()
    sim.rollout(None, n_steps)
    np.asarray(sim.state.qpos[0])
    swall = time.perf_counter() - start
    ssps = n_steps / swall
    print(
        f"[{backend}] single-fly scan path: {ssps:,.0f} steps/s "
        f"({ssps * sim.timestep:.2f}x realtime)"
    )

    bsim = BatchSimulation(world, batch_worlds)
    bwall = timed_loop(
        lambda: bsim.step(),
        lambda: np.asarray(bsim.state.qpos[0, 0]),
        max(n_steps // 10, 50),
    )
    bsteps = max(n_steps // 10, 50)
    bsps = bsteps * batch_worlds / bwall
    print(
        f"[{backend}] batched eager loop ({batch_worlds} worlds): "
        f"{bsps:,.0f} world-steps/s per-call "
        f"(scan path removes this dispatch entirely — see bench.py)"
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
    )
