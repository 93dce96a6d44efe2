"""Profile step-time composition on the TPU: batch scaling, solver cost."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.compose import ActuatorType
from flygym_tpu.demo.benchmark import make_model
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.engine.model import make_initial_state


def build_model(solver_iters=None, ncon=None, no_contact=False):
    fly, world, cam = make_model()
    if solver_iters is not None:
        world.spec.options["solver_iterations"] = solver_iters
    if ncon is not None:
        world.spec.options["ncon_max"] = ncon
    if no_contact:
        world.spec.pairs = []
    model, state = world.compile()
    return model, state


def time_rollout(model, state, n_worlds, n_steps=100, reps=3):
    bstate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_worlds,) + x.shape), state
    )

    @jax.jit
    def episode(model, st):
        vstep = jax.vmap(engine_step, in_axes=(None, 0))

        def body(carry, _):
            return vstep(model, carry), None

        final, _ = jax.lax.scan(body, st, None, length=n_steps)
        return final

    out = episode(model, bstate)
    _ = np.asarray(out.qpos[0])  # host fetch = real device sync on axon
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = episode(model, bstate)
        _ = np.asarray(out.qpos[0])
        best = min(best, time.perf_counter() - t0)
    sps = n_steps * n_worlds / best
    print(
        f"  n_worlds={n_worlds:5d} steps={n_steps}: {best:.3f}s "
        f"-> {sps:,.0f} world-steps/s ({sps*1e-4:.1f}x rt) "
        f"[{best/n_steps*1e3:.2f} ms/step]"
    )
    return sps


if __name__ == "__main__":
    import sys

    print("devices:", jax.devices(), flush=True)
    configs = sys.argv[1] if len(sys.argv) > 1 else "full"

    if configs in ("full", "all"):
        print("== full model ==", flush=True)
        model, state = build_model()
        for n in (1024, 4096):
            time_rollout(model, state, n)
    if configs in ("nocontact", "all"):
        print("== no contact (smooth dynamics only) ==", flush=True)
        model_nc, state_nc = build_model(no_contact=True)
        time_rollout(model_nc, state_nc, 1024)
    if configs in ("small", "all"):
        print("== ncon=16, iters=2 ==", flush=True)
        model_s, state_s = build_model(solver_iters=2, ncon=16)
        time_rollout(model_s, state_s, 1024)
