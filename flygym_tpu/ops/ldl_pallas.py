"""Pallas TPU kernels for the tree-sparse LDLᵀ factorization and solves.

The jnp implementation (engine/linalg.py) lowers to ~tree-depth × a-few
XLA ops per factorization — already far better than XLA's dense batched
Cholesky, but still ~200 dispatch-bound kernels per physics step. These
Pallas kernels run the *entire* elimination for a block of worlds inside one
kernel invocation:

- Layout: worlds in the TPU lane dimension. A block processes LANE_BLOCK
  worlds at once; the (nv × nv) matrix lives in VMEM as (nv*nv, LANE_BLOCK)
  rows of width-128 vectors (~2.7 MB for nv=72 — fits comfortably).
- All indexing is **static**: the per-DoF ancestor chains and elimination
  levels are compile-time tables, so the whole factorization unrolls into
  straight-line vector code (~6k VPU ops for the fly, ≈ microseconds per
  block) with zero gathers.

Integration: :func:`tree_ldl_factor_op` / :func:`tree_ldl_solve_op` are
``jax.custom_batching.custom_vmap`` wrappers — unbatched calls (and non-TPU
backends) fall back to the jnp implementation, while ``vmap``ed calls (the
batched simulation path) dispatch to the Pallas kernels. The per-world step
code in engine/contact.py stays unchanged.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tree_ldl_factor_op", "tree_ldl_solve_op", "pallas_available"]

LANE_BLOCK = 128


def pallas_available() -> bool:
    """Pallas TPU kernels are used only on the TPU backend."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _static_tables(model):
    """Python-level (chain, level) tables for static unrolling (all fields
    are static model metadata — safe to read while tracing)."""
    return model.dof_chains, model.dof_height_levels, model.dof_depth_levels


# ---------------------------------------------------------------------------
# Kernels (operate on (rows, LANE_BLOCK) refs; all row indices static)
# ---------------------------------------------------------------------------


def _factor_kernel(nv, maxc, chains, height_levels, H_ref, L_ref, d_ref, A):
    # Copy H into scratch (mutated during elimination).
    A[:, :] = H_ref[:, :]
    for level in height_levels:
        for i in level:
            chain = chains[i]
            di = A[i * nv + i, :]
            d_ref[i, :] = di
            inv_d = 1.0 / di
            rows = [A[i * nv + a, :] for a in chain]
            lis = [r * inv_d for r in rows]
            for c, li in enumerate(lis):
                L_ref[i * maxc + c, :] = li
            for ca, a in enumerate(chain):
                for cb, b in enumerate(chain):
                    A[a * nv + b, :] = A[a * nv + b, :] - lis[ca] * rows[cb]


def _solve_kernel(
    nv, maxc, chains, height_levels, depth_levels, L_ref, d_ref, b_ref, x_ref, y
):
    # Pass 1 (leaves → root): y_i finalizes, then pushes to ancestors.
    y[:, :] = b_ref[:, :]
    for level in height_levels:
        for i in level:
            yi = y[i, :]
            for c, a in enumerate(chains[i]):
                y[a, :] = y[a, :] - L_ref[i * maxc + c, :] * yi
    # Diagonal.
    for i in range(nv):
        y[i, :] = y[i, :] / d_ref[i, :]
    # Pass 2 (root → leaves): gather from final ancestors.
    for level in depth_levels:
        for i in level:
            acc = y[i, :]
            for c, a in enumerate(chains[i]):
                acc = acc - L_ref[i * maxc + c, :] * y[a, :]
            y[i, :] = acc
    x_ref[:, :] = y[:, :]


# ---------------------------------------------------------------------------
# Batched Pallas entry points (worlds in lanes)
# ---------------------------------------------------------------------------


def _pad_to_blocks(x, axis):
    b = x.shape[axis]
    pad = (-b) % LANE_BLOCK
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, b


@functools.partial(jax.jit, static_argnums=(0,))
def _factor_batched_pallas(static, H):
    """H: (B, nv, nv) → (L (B, nv, C), d (B, nv)) via Pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nv, maxc, chains, height_levels, depth_levels = static
    Ht = jnp.transpose(H, (1, 2, 0)).reshape(nv * nv, -1)
    Ht, B = _pad_to_blocks(Ht, 1)
    nb = Ht.shape[1] // LANE_BLOCK

    kernel = functools.partial(_factor_kernel, nv, maxc, chains, height_levels)
    # Size the per-kernel VMEM limit from the actual tiles: the (nv*nv)
    # input window (double-buffered) + scratch + (nv*maxc + nv) outputs
    # (double-buffered). The old fixed 64 MiB OOM'd at nv=210 (204-DoF
    # preset: 70.77 MiB measured); per-kernel sizing keeps small models'
    # pipelines unthrottled (ROADMAP: a global oversized scoped region
    # itself costs throughput).
    tile_bytes = LANE_BLOCK * 4
    need = (3 * nv * nv + 2 * (nv * maxc + nv)) * tile_bytes + 8 * 2**20
    vmem_limit = min(max(64 * 2**20, need), 120 * 2**20)
    L_t, d_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nv * maxc, Ht.shape[1]), H.dtype),
            jax.ShapeDtypeStruct((nv, Ht.shape[1]), H.dtype),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (nv * nv, LANE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (nv * maxc, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nv, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((nv * nv, LANE_BLOCK), H.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
    )(Ht)
    L = jnp.transpose(L_t[:, :B].reshape(nv, maxc, B), (2, 0, 1))
    d = jnp.transpose(d_t[:, :B], (1, 0))
    return L, d


@functools.partial(jax.jit, static_argnums=(0,))
def _solve_batched_pallas(static, L, d, b):
    """L: (B, nv, C), d: (B, nv), b: (B, nv) → x (B, nv) via Pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nv, maxc, chains, height_levels, depth_levels = static
    B0 = b.shape[0]
    L_t = jnp.transpose(L, (1, 2, 0)).reshape(nv * maxc, B0)
    d_t = jnp.transpose(d, (1, 0))
    b_t = jnp.transpose(b, (1, 0))
    L_t, _ = _pad_to_blocks(L_t, 1)
    d_t, _ = _pad_to_blocks(d_t, 1)
    # Pad the diagonal with ones to avoid 0-division in padded lanes.
    if d_t.shape[1] != B0:
        d_t = d_t.at[:, B0:].set(1.0)
    b_t, _ = _pad_to_blocks(b_t, 1)
    nb = b_t.shape[1] // LANE_BLOCK

    kernel = functools.partial(
        _solve_kernel, nv, maxc, chains, height_levels, depth_levels
    )
    # (nv*maxc + 2nv) inputs + nv output, double-buffered, + nv scratch.
    tile_bytes = LANE_BLOCK * 4
    need = (2 * (nv * maxc + 3 * nv) + nv) * tile_bytes + 8 * 2**20
    vmem_limit = min(max(64 * 2**20, need), 120 * 2**20)
    x_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nv, b_t.shape[1]), b.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (nv * maxc, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nv, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nv, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (nv, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((nv, LANE_BLOCK), b.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
    )(L_t, d_t, b_t)
    return jnp.transpose(x_t[:, :B0], (1, 0))


# ---------------------------------------------------------------------------
# custom_vmap wrappers: per-world code calls these; the batched rule uses
# Pallas on TPU and the jnp path elsewhere.
# ---------------------------------------------------------------------------


def make_tree_ldl_ops(model):
    """Build (factor, solve) ops bound to a model's static structure."""
    from flygym_tpu.engine.linalg import tree_ldl_factor, tree_ldl_solve

    chains, h_levels, d_levels = _static_tables(model)
    nv = model.nv
    maxc = max((len(c) for c in chains), default=1) or 1
    static = (nv, maxc, chains, h_levels, d_levels)

    @jax.custom_batching.custom_vmap
    def factor_op(H):
        return tree_ldl_factor(model, H)

    @factor_op.def_vmap
    def _factor_vmap(axis_size, in_batched, H):
        (h_batched,) = in_batched
        if not h_batched:
            raise NotImplementedError("model must be unbatched")
        if pallas_available():
            L, d = _factor_batched_pallas(static, H)
        else:
            L, d = jax.vmap(lambda h: tree_ldl_factor(model, h))(H)
        return (L, d), (True, True)

    @jax.custom_batching.custom_vmap
    def solve_op(L, d, b):
        return tree_ldl_solve(model, (L, d), b)

    @solve_op.def_vmap
    def _solve_vmap(axis_size, in_batched, L, d, b):
        if pallas_available():
            x = _solve_batched_pallas(static, L, d, b)
        else:
            x = jax.vmap(lambda l, dd, bb: tree_ldl_solve(model, (l, dd), bb))(
                L, d, b
            )
        return x, True

    return factor_op, solve_op


# Simple aliases for direct (already-batched) use in tests.
def tree_ldl_factor_op(model, H_batched):
    chains, h_levels, d_levels = _static_tables(model)
    maxc = max((len(c) for c in chains), default=1) or 1
    static = (model.nv, maxc, chains, h_levels, d_levels)
    return _factor_batched_pallas(static, H_batched)


def tree_ldl_solve_op(model, L, d, b):
    chains, h_levels, d_levels = _static_tables(model)
    maxc = max((len(c) for c in chains), default=1) or 1
    static = (model.nv, maxc, chains, h_levels, d_levels)
    return _solve_batched_pallas(static, L, d, b)
