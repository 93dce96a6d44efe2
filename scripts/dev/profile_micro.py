"""Micro-benchmarks of the step's building blocks on TPU.

Each op is iterated in a scan with a data dependency between iterations so
XLA cannot hoist it out of the loop.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(make_chain, n=50, label=""):
    @jax.jit
    def scanned():
        def body(c, _):
            return make_chain(c), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return out

    try:
        _ = np.asarray(scanned())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(scanned())
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best/n*1e3:.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    B, NV, M = 1024, 72, 128
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, NV, NV), jnp.float32) * 0.1
    SPD = A @ jnp.swapaxes(A, -1, -2) + 10.0 * jnp.eye(NV)
    rhs1 = jax.random.normal(key, (B, NV))
    rhsM = jax.random.normal(key, (B, NV, M))
    chol0 = jnp.linalg.cholesky(SPD)
    print(f"B={B}, NV={NV}, M={M}", flush=True)

    timeit(
        lambda c: jnp.sum(jnp.linalg.cholesky(SPD + c * 1e-12)) * 1e-9,
        label="batched cholesky 72x72",
    )
    timeit(
        lambda c: jnp.sum(
            jax.scipy.linalg.cho_solve((chol0, True), rhs1 + c * 1e-12)
        )
        * 1e-9,
        label="cho_solve rhs (72,)",
    )
    timeit(
        lambda c: jnp.sum(
            jax.scipy.linalg.cho_solve((chol0, True), rhsM + c * 1e-12)
        )
        * 1e-9,
        label="cho_solve rhs (72,128)",
    )
    timeit(
        lambda c: jnp.sum((SPD + c * 1e-12) @ SPD) * 1e-9,
        label="matmul (B,72,72)@(B,72,72)",
    )
    timeit(
        lambda c: jnp.sum(jnp.einsum("bij,bj->bi", SPD, rhs1 + c * 1e-12)) * 1e-9,
        label="matvec (B,72,72)@(B,72)",
    )
    timeit(
        lambda c: jnp.sum(jnp.linalg.inv(SPD + c * 1e-12)) * 1e-9,
        label="batched inv 72x72",
    )

    xq = jax.random.normal(key, (B, 70, 4))
    idx = jnp.arange(30)

    def fk_level(c):
        from flygym_tpu.engine.maths import quat_mul

        q = xq + c * 1e-12
        parent = q[:, idx]
        child = quat_mul(parent, parent)
        return jnp.sum(q.at[:, idx + 30].set(child)) * 1e-9

    timeit(fk_level, label="one FK-level quat op (gather+mul+scatter)")

    # Triangular solve directly.
    timeit(
        lambda c: jnp.sum(
            jax.lax.linalg.triangular_solve(
                chol0, rhs1[..., None] + c * 1e-12, left_side=True, lower=True
            )
        )
        * 1e-9,
        label="triangular_solve (72,1)",
    )
    timeit(
        lambda c: jnp.sum(
            jax.lax.linalg.triangular_solve(
                chol0, rhsM + c * 1e-12, left_side=True, lower=True
            )
        )
        * 1e-9,
        label="triangular_solve (72,128)",
    )


if __name__ == "__main__":
    main()
