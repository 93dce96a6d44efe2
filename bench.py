"""Headline benchmark runner.

Replicates the reference's benchmark protocol (kinematic replay of recorded
fly walking with position actuators + leg adhesion, flat ground, dt = 1e-4 s,
1000 steps, rendering off — flygym ``scripts/dev/run_gpu_benchmark.py:10-27``)
on the TPU engine, sweeping world counts and reporting the best aggregate
throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's best published GPU number, ~600,000 world-steps/s
(~60x realtime) on L40S/H100 (BASELINE.md).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_STEPS_PER_S = 600_000.0
SIM_STEPS = 1000
TIMESTEP = 1e-4


def main():
    import jax

    try:
        # Persistent compilation cache: TPU compiles over the axon tunnel
        # run minutes per (program, shape); cache them across processes.
        jax.config.update(
            "jax_compilation_cache_dir", str(Path.home() / ".cache/jax_comp")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from flygym_tpu.compose import ActuatorType
    from flygym_tpu.demo.benchmark import ReplayTargetData, make_model, run_simulation

    print(f"devices: {jax.devices()}", file=sys.stderr)

    ref_fly, *_ = make_model()
    dof_order = ref_fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    replay = ReplayTargetData(TIMESTEP, dof_order)

    # Best measured point with the sublane-packed Pallas mega-step kernel
    # (9.48M w/s at 8192 worlds, 5.9M at 4096 — see ROADMAP.md). Each extra
    # world count costs a few minutes of compile over the axon tunnel, so
    # sweeps are opt-in (pass world counts as argv).
    world_counts = [int(x) for x in sys.argv[1:]] or [8192]
    best = 0.0
    for n_worlds in world_counts:
        targets = replay.make_target_angles_all_worlds(n_worlds, SIM_STEPS)
        try:
            walltime = run_simulation(
                targets, enable_rendering=False, timestep=TIMESTEP,
                simplify_geom=False,
            )
        except Exception as e:
            print(f"n_worlds={n_worlds} failed: {e}", file=sys.stderr)
            continue
        steps_per_s = SIM_STEPS * n_worlds / walltime
        print(
            f"n_worlds={n_worlds}: {walltime:.2f}s -> {steps_per_s:,.0f} "
            f"world-steps/s ({steps_per_s * TIMESTEP:.1f}x realtime)",
            file=sys.stderr,
        )
        best = max(best, steps_per_s)

    print(
        json.dumps(
            {
                "metric": "aggregate fly world-steps/s (kinematic replay, dt=1e-4)",
                "value": round(best),
                "unit": "world-steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
