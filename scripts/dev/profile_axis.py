"""Compare world-batch axis placement: leading (sublane waste) vs trailing
(worlds fill TPU lanes)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from flygym_tpu.demo.benchmark import make_model
from flygym_tpu.engine.step import step as engine_step


def build(no_contact):
    fly, world, cam = make_model()
    if no_contact:
        world.spec.pairs = []
    return world.compile()


def bench(episode, bstate, model, n_worlds, n_steps, label):
    out = episode(model, bstate)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = episode(model, bstate)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    sps = n_steps * n_worlds / best
    print(f"  {label}: {best:.3f}s -> {sps:,.0f} world-steps/s "
          f"[{best/n_steps*1e3:.2f} ms/step]")


def main(no_contact=True, n_worlds=1024, n_steps=100):
    model, state = build(no_contact)
    print(f"no_contact={no_contact} n_worlds={n_worlds}")

    # Axis 0 (current).
    b0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_worlds,) + x.shape), state)

    @jax.jit
    def ep0(model, st):
        v = jax.vmap(engine_step, in_axes=(None, 0))

        def body(c, _):
            return v(model, c), None

        f, _ = jax.lax.scan(body, st, None, length=n_steps)
        return f

    bench(ep0, b0, model, n_worlds, n_steps, "batch axis 0 (leading)")

    # Axis -1 (worlds in lanes).
    bl = jax.tree.map(
        lambda x: jnp.broadcast_to(x[..., None], x.shape + (n_worlds,)), state
    )

    @jax.jit
    def ep1(model, st):
        v = jax.vmap(engine_step, in_axes=(None, -1), out_axes=-1)

        def body(c, _):
            return v(model, c), None

        f, _ = jax.lax.scan(body, st, None, length=n_steps)
        return f

    bench(ep1, bl, model, n_worlds, n_steps, "batch axis -1 (lanes)")


if __name__ == "__main__":
    main(no_contact=True)
    main(no_contact=False)
