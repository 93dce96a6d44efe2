"""Tree-sparse LDLᵀ factorization and solves.

The mass matrix M(q) and the contact Hessian M + JᵀWJ are nonzero only on
DoF pairs that lie on the same root-to-leaf path of the kinematic tree
(contact Jacobian rows touch exactly one root-path, so JᵀWJ preserves the
pattern). Eliminating DoFs leaves-first therefore produces **zero fill-in**
(the classic tree-elimination result MuJoCo's ``mj_factorM`` exploits), and —
crucially for TPU — all DoFs at the same height eliminate *simultaneously*:
the six legs factor in parallel.

This replaces XLA's batched dense Cholesky (a ~nv-step sequential blocked
loop; measured ~9 ms for (1024, 72, 72) on v5e — by far the most expensive op
in the physics step) with ~tree-depth (≈17) levels of small batched
gather/outer-product/scatter ops.

Static structure (tables precomputed at model compile):
- ``anc``: (nv, C) ancestor DoF lists (excluding self), -1 padded, C = max
  chain length.
- height levels: DoFs grouped by height above the deepest descendant
  (elimination order), root last.
- depth levels: DoFs grouped by depth from the root (forward-solve order).
"""

import jax.numpy as jnp

__all__ = ["tree_ldl_factor", "tree_ldl_solve"]


def tree_ldl_factor(model, A: jnp.ndarray):
    """Factor A = L D Lᵀ exploiting kinematic-tree sparsity.

    Args:
        A: (nv, nv) SPD matrix with tree sparsity (mass matrix / contact
            Hessian). Batched via vmap.

    Returns:
        (L, d): unit-lower rows stored compactly as (nv, C) over each DoF's
        ancestor list, and the (nv,) diagonal.
    """
    nv = model.nv
    anc = model.dof_anc  # (nv, C) i32, -1 padded
    C = anc.shape[1]
    dtype = A.dtype

    # Pad with a scratch row/col so -1 indices scatter harmlessly.
    Ap = jnp.zeros((nv + 1, nv + 1), dtype)
    Ap = Ap.at[:nv, :nv].set(A)
    anc_s = jnp.where(anc >= 0, anc, nv)
    valid = (anc >= 0).astype(dtype)

    L = jnp.zeros((nv, C), dtype)
    d = jnp.ones((nv,), dtype)

    for level in model.dof_height_levels:  # leaves → root
        idx = jnp.asarray(level, jnp.int32)
        a_idx = anc_s[idx]  # (k, C)
        v_idx = valid[idx]
        di = Ap[idx, idx]  # (k,)
        rows = Ap[idx[:, None], a_idx] * v_idx  # (k, C)
        Li = rows / di[:, None]
        # Rank-1 downdates of the ancestor blocks, all DoFs of the level at
        # once (scatter-add handles the shared root entries).
        outer = Li[:, :, None] * rows[:, None, :]  # (k, C, C)
        mask2 = v_idx[:, :, None] * v_idx[:, None, :]
        Ap = Ap.at[a_idx[:, :, None], a_idx[:, None, :]].add(-outer * mask2)
        L = L.at[idx].set(Li)
        d = d.at[idx].set(di)
    return L, d


def tree_ldl_solve(model, factor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the tree LDLᵀ factor. b: (nv,) (vmap for batches)."""
    L, d = factor
    nv = model.nv
    anc = model.dof_anc
    anc_s = jnp.where(anc >= 0, anc, nv)
    valid = (anc >= 0).astype(b.dtype)

    # With elimination order leaves→root, the permuted L has nonzeros
    # L̃[a, i] = L[i, pos(a)] for a ∈ ancestors(i): "lower" means
    # later-eliminated, i.e. ancestors.

    # Pass 1: L̃ y = b, leaves → root. y_i finalizes at its height level
    # (all descendant contributions already scattered in), then pushes its
    # contribution up to its ancestors.
    y = jnp.zeros((nv + 1,), b.dtype).at[:nv].set(b)
    for level in model.dof_height_levels:
        idx = jnp.asarray(level, jnp.int32)
        yi = y[idx]
        contrib = L[idx] * yi[:, None] * valid[idx]  # (k, C)
        y = y.at[anc_s[idx]].add(-contrib)

    z = y.at[:nv].set(y[:nv] / d)

    # Pass 2: L̃ᵀ x = z, root → leaves: x_i = z_i − Σ_a L[i, pos(a)] x_a,
    # gathering from already-final ancestors.
    for level in model.dof_depth_levels:
        idx = jnp.asarray(level, jnp.int32)
        gathered = z[anc_s[idx]] * valid[idx]
        z = z.at[idx].add(-jnp.sum(L[idx] * gathered, axis=1))
    return z[:nv]
