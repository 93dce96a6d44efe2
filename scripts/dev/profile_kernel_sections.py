"""Ablation profile of the Pallas mega-step kernel's sections on TPU.

Times rollout throughput for kernel variants with sections removed or
scaled, so section costs come out as deltas of the SAME fused program
(unlike profile_stages.py, which times the jnp stages with per-stage
dispatch). Run one variant at a time — TPU jobs are serial and each
variant compiles its own program (~2-3 min over the axon tunnel, cached).

Usage: python scripts/dev/profile_kernel_sections.py [worlds=4096] [steps=400]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

from flygym_tpu.demo.benchmark import make_model


def build(solver_iters=None, no_contact=False):
    # NOTE: the compiled default is solver_iterations=2 (compose/spec.py),
    # so iteration counts are always set explicitly here.
    fly, world, cam = make_model()
    if solver_iters is not None:
        world.spec.options["solver_iterations"] = solver_iters
    if no_contact:
        world.spec.pairs = []
    return world


def time_rollout(world, n_worlds, n_steps):
    from flygym_tpu.batch import BatchSimulation

    sim = BatchSimulation(world, n_worlds)
    # Warm the exact (program, shape) cache entry, then time (ROADMAP's
    # measurement trap: a different n_steps compiles a different episode).
    traj = sim.rollout(None, n_steps)
    np.asarray(jax.tree_util.tree_leaves(traj)[0])
    t0 = time.perf_counter()
    traj = sim.rollout(None, n_steps)
    np.asarray(jax.tree_util.tree_leaves(traj)[0])
    dt = time.perf_counter() - t0
    return n_worlds * n_steps / dt


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    variants = [
        ("iters=3", dict(solver_iters=3)),
        ("iters=1", dict(solver_iters=1)),
        ("no contact", dict(no_contact=True, solver_iters=3)),
    ]
    results = {}
    for name, kw in variants:
        world = build(**kw)
        wps = time_rollout(world, n_worlds, n_steps)
        results[name] = wps
        print(f"{name:20s} {wps:12,.0f} w/s", flush=True)

    t_full = 1.0 / results["iters=3"]
    t_iter = (t_full - 1.0 / results["iters=1"]) / 2.0
    t_contact = t_full - 1.0 / results["no contact"]
    print(f"\nper-world-step: iters=3 {t_full*1e9:.1f} ns")
    print(f"  contact section total : {t_contact/t_full*100:5.1f}%")
    print(f"  per Newton iteration  : {t_iter/t_full*100:5.1f}%")


if __name__ == "__main__":
    main()
