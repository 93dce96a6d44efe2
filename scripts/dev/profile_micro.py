"""Micro-benchmarks of the step's building blocks on TPU."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=100, label=""):
    @jax.jit
    def scanned(*a):
        def body(c, _):
            out = fn(*a)
            # fold output into carry so the scan isn't DCE'd
            s = sum(jnp.sum(x) for x in jax.tree.leaves(out))
            return c + s, None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return tot

    out = scanned(*args)
    _ = np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = scanned(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best/n*1e3:.3f} ms/iter")
    return best / n


def main():
    B, NV, M = 1024, 72, 128
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, NV, NV), jnp.float32)
    SPD = A @ jnp.swapaxes(A, -1, -2) + 10.0 * jnp.eye(NV)
    rhs1 = jax.random.normal(key, (B, NV))
    rhsM = jax.random.normal(key, (B, NV, M))

    print(f"B={B}, NV={NV}, M={M}")
    timeit(lambda x: jnp.linalg.cholesky(x), SPD, label="batched cholesky 72x72")
    chol = jnp.linalg.cholesky(SPD)
    timeit(
        lambda c, r: jax.scipy.linalg.cho_solve((c, True), r),
        chol,
        rhs1,
        label="cho_solve rhs (72,)",
    )
    timeit(
        lambda c, r: jax.scipy.linalg.cho_solve((c, True), r),
        chol,
        rhsM,
        label="cho_solve rhs (72,128)",
    )
    timeit(lambda a, b: a @ b, SPD, SPD, label="matmul (B,72,72)@(B,72,72)")
    timeit(
        lambda a, r: jnp.einsum("bij,bj->bi", a, r),
        SPD,
        rhs1,
        label="matvec (B,72,72)@(B,72)",
    )
    timeit(lambda x: jnp.linalg.inv(x), SPD, label="batched inv 72x72")

    # Small quat-chain op typical of FK levels: gather + quat ops + scatter.
    xq = jax.random.normal(key, (B, 70, 4))
    idx = jnp.arange(30)

    def fk_level(q):
        from flygym_tpu.engine.maths import quat_mul

        parent = q[:, idx]
        child = quat_mul(parent, parent)
        return q.at[:, idx + 30].set(child)

    timeit(fk_level, xq, label="one FK-level quat op (gather+mul+scatter)")


if __name__ == "__main__":
    main()
