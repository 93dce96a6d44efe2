"""Heightfield ground-plane sampling for contact candidates.

Heightfield worlds (``HeightfieldTerrainWorld`` and friends) need, per
contact candidate, the local ground plane (height + unit normal) under the
candidate's capsule endpoint. The mega-step kernel takes these as extra
input rows sampled OUTSIDE the kernel from the previous chunk's cached FK
(see ``ops/megastep.megastep_supported``); this module owns that sampler.

Three interchangeable methods (``FLYGYM_TPU_TERRAIN_SAMPLER``):

- ``onehot``: bilinear fetch as one-hot matmuls against the FULL height
  grid. Robust, but O(B·ncand·nrow·ncol) MXU work — ~184 GFLOP per sample
  at 4096 worlds on the 320x320 blocks terrain, which measured as ~45% of
  total step time even amortized over 8-step chunks (the round-2 terrain
  gap, VERDICT round 2 #5).
- ``take``: flat ``jnp.take`` of the four bilinear corners. Minimal FLOPs
  but lowers to a generic gather on (B·ncand) indices, which TPUs execute
  poorly (measured ~ms per call at 4096 worlds — why onehot existed).
- ``window``: two-stage. Per fly (candidates grouped by kinematic root), a
  (Wy, Wx) grid window around the candidates is sliced per world — W is a
  STATIC bound on the fly's candidate spread from the kinematic chain
  (clamped per grid axis), so the window provably covers every candidate —
  then the one-hot matmuls
  run against the window only: O(B·ncand·W²) with W ≈ 100 vs nrow ≈ 320,
  a ~10-20x FLOP cut with bit-near-identical results (exercised against
  ``onehot`` in tests/engine/test_terrain_sampler.py).

``auto`` picks ``window`` when the static bound actually shrinks the
problem and ``onehot`` otherwise (tiny grids).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["make_plane_sampler", "candidate_group_windows"]

_F32 = jnp.float32


def candidate_group_windows(model):
    """Group candidates by kinematic root and bound each group's xy spread.

    Returns a list of ``(cand_idx (n_g,) np.int32, (Wy, Wx))`` with Wy/Wx
    the static window size in grid cells (per grid axis, clamped to the
    grid dims independently) covering the group's candidate
    endpoints at ANY joint configuration: twice the chain-length reach
    bound from the group's root body (rotations change direction, never
    magnitude, so sum of link offset norms + geom offset + capsule
    halflength + radius bounds the endpoint distance from the root).
    """
    body_parent = np.asarray(model.body_parent)
    body_pos = np.asarray(model.body_pos)
    geom_pos = np.asarray(model.geom_pos)
    geom_size = np.asarray(model.geom_size)
    geom_body = np.asarray(model.geom_body)
    can_geom = np.asarray(model.can_geom)
    can_body = np.asarray(model.can_body)
    cell = np.asarray(model.hfield_cell)
    nr, nc = np.asarray(model.hfield_data).shape

    def root_of(b: int) -> int:
        while body_parent[b] != 0 and b != 0:
            b = int(body_parent[b])
        return b

    def reach_of(g: int) -> float:
        r = (
            float(np.linalg.norm(geom_pos[g]))
            + float(geom_size[g, 1])
            + float(geom_size[g, 0])
        )
        b = int(geom_body[g])
        while body_parent[b] != 0 and b != 0:
            r += float(np.linalg.norm(body_pos[b]))
            b = int(body_parent[b])
        return r

    groups: dict[int, list[int]] = {}
    for ci in range(len(can_geom)):
        groups.setdefault(root_of(int(can_body[ci])), []).append(ci)

    out = []
    for _root, cands in sorted(groups.items()):
        reach = max(reach_of(int(can_geom[ci])) for ci in cands)
        spread_cells = 2.0 * reach / float(cell.min())
        w = int(np.ceil(spread_cells)) + 4
        w = int(-(-w // 8) * 8)  # round up to a sublane multiple
        # Clamp each axis independently: on non-square grids the reach
        # bound may exceed one dim but not the other, and a square clamp
        # to min(nr, nc) would silently shrink the coverage along the
        # long axis (candidates clamped to the window edge -> wrong
        # heights). (wy, wx) index (row, col) = (y, x) grid axes.
        out.append((np.asarray(cands, np.int32), (min(w, nr), min(w, nc))))
    return out


def make_plane_sampler(model, method: str | None = None):
    """Build ``sample(xpos, xquat) -> (B, ncand, 4)`` [h, nx, ny, nz] rows.

    ``xpos``/``xquat`` are batched world body poses (B, nbody, 3/4) — the
    cached pre-integration FK on ``State``. Returns ``None`` for flat
    worlds. Sampling matches ``engine.contact.ground_height_normal``:
    bilinear height, normal from the cell gradient.
    """
    if not model.has_hfield:
        return None
    method = method or os.environ.get("FLYGYM_TPU_TERRAIN_SAMPLER", "auto")

    from flygym_tpu.engine.maths import quat_mul, quat_rotate

    data = model.hfield_data
    nr, nc = data.shape
    gb = model.geom_body[model.can_geom]
    can_gpos = model.geom_pos[model.can_geom]
    can_gquat = model.geom_quat[model.can_geom]
    halflen = model.geom_size[model.can_geom, 1]

    groups = candidate_group_windows(model)
    if method == "auto":
        # The window pays for itself when it cuts the contraction dim by
        # ~2x or more (slice + einsum overheads are real but small).
        worthwhile = all(
            wy * 2 <= nr and wx * 2 <= nc for _, (wy, wx) in groups
        )
        method = "window" if worthwhile else "onehot"

    def endpoints_xy(xpos, xquat):
        gpos = xpos[:, gb] + quat_rotate(xquat[:, gb], can_gpos)
        gquat = quat_mul(xquat[:, gb], can_gquat)
        zax = quat_rotate(gquat, jnp.array([0.0, 0.0, 1.0], _F32))
        ep = gpos + (model.can_end * halflen)[None, :, None] * zax
        return ep[..., :2]  # (B, ncand, 2)

    def frac_coords(xy):
        fx = (xy[..., 0] - model.hfield_xy0[0]) / model.hfield_cell[0]
        fy = (xy[..., 1] - model.hfield_xy0[1]) / model.hfield_cell[1]
        fx = jnp.clip(fx, 0.0, nc - 1.001)
        fy = jnp.clip(fy, 0.0, nr - 1.001)
        return fx, fy

    def finish(h00, h01, h10, h11, tx, ty):
        h = (
            h00 * (1 - tx) * (1 - ty)
            + h01 * tx * (1 - ty)
            + h10 * (1 - tx) * ty
            + h11 * tx * ty
        )
        dh_dx = ((h01 - h00) * (1 - ty) + (h11 - h10) * ty) / model.hfield_cell[0]
        dh_dy = ((h10 - h00) * (1 - tx) + (h11 - h01) * tx) / model.hfield_cell[1]
        n = jnp.stack([-dh_dx, -dh_dy, jnp.ones_like(h)], -1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return jnp.concatenate([h[..., None], n], axis=-1)  # (..., 4)

    if method in ("onehot", "onehot_bf16"):
        # bf16 variant: the one-hot selectors are EXACT in bf16 (0/1); only
        # the height grid rounds (<= 2^-9 relative, sub-um at mm heights),
        # for ~2x MXU rate and half the HBM traffic on the big operands.
        sel_t = jnp.bfloat16 if method == "onehot_bf16" else _F32
        data_t = data.astype(sel_t)

        def sample(xpos, xquat):
            fx, fy = frac_coords(endpoints_xy(xpos, xquat))
            shp = fx.shape
            fx = fx.reshape(-1)
            fy = fy.reshape(-1)
            ix = jnp.floor(fx)
            iy = jnp.floor(fy)
            tx = fx - ix
            ty = fy - iy
            rows = jnp.arange(nr, dtype=_F32)
            cols = jnp.arange(nc, dtype=_F32)
            Y0 = (iy[:, None] == rows[None, :]).astype(sel_t)
            Y1 = (iy[:, None] + 1.0 == rows[None, :]).astype(sel_t)
            X0 = (ix[:, None] == cols[None, :]).astype(_F32)
            X1 = (ix[:, None] + 1.0 == cols[None, :]).astype(_F32)
            R0 = jnp.matmul(Y0, data_t, preferred_element_type=_F32)
            R1 = jnp.matmul(Y1, data_t, preferred_element_type=_F32)
            h00 = jnp.sum(R0 * X0, -1)
            h01 = jnp.sum(R0 * X1, -1)
            h10 = jnp.sum(R1 * X0, -1)
            h11 = jnp.sum(R1 * X1, -1)
            return finish(h00, h01, h10, h11, tx, ty).reshape(shp + (4,))

    elif method == "take":
        flat = data.reshape(-1)

        def sample(xpos, xquat):
            fx, fy = frac_coords(endpoints_xy(xpos, xquat))
            ix = jnp.floor(fx).astype(jnp.int32)
            iy = jnp.floor(fy).astype(jnp.int32)
            tx = fx - ix
            ty = fy - iy
            base = iy * nc + ix
            h00 = jnp.take(flat, base)
            h01 = jnp.take(flat, base + 1)
            h10 = jnp.take(flat, base + nc)
            h11 = jnp.take(flat, base + nc + 1)
            return finish(h00, h01, h10, h11, tx, ty)

    elif method in ("window", "window_gather"):
        gather_fetch = method == "window_gather"

        def sample(xpos, xquat):
            fx_all, fy_all = frac_coords(endpoints_xy(xpos, xquat))
            ncand = fx_all.shape[1]
            parts = []
            order = []
            for cand_idx, (Wy, Wx) in groups:
                order.append(cand_idx)
                fx = fx_all[:, cand_idx]  # (B, n_g)
                fy = fy_all[:, cand_idx]
                sx = jnp.clip(
                    jnp.floor(fx.min(axis=1)) - 1.0, 0.0, float(nc - Wx)
                )
                sy = jnp.clip(
                    jnp.floor(fy.min(axis=1)) - 1.0, 0.0, float(nr - Wy)
                )
                if gather_fetch:
                    win = jax.vmap(
                        lambda y, x: jax.lax.dynamic_slice(
                            data, (y, x), (Wy, Wx)
                        )
                    )(sy.astype(jnp.int32), sx.astype(jnp.int32))
                else:
                    # One-hot window fetch: (r == sy + w) / (c == sx + w)
                    # shifted-diagonal selectors ride the MXU instead of a
                    # per-world gather (vmapped dynamic_slice measured 2x
                    # SLOWER than even the full-grid one-hot).
                    rows_oh = (
                        sy[:, None, None]
                        + jnp.arange(Wy, dtype=_F32)[None, :, None]
                        == jnp.arange(nr, dtype=_F32)[None, None, :]
                    ).astype(_F32)  # (B, Wy, nr)
                    cols_oh = (
                        jnp.arange(nc, dtype=_F32)[None, :, None]
                        == sx[:, None, None]
                        + jnp.arange(Wx, dtype=_F32)[None, None, :]
                    ).astype(_F32)  # (B, nc, Wx)
                    rowwin = jnp.einsum(
                        "bwr,rc->bwc", rows_oh, data,
                        preferred_element_type=_F32,
                    )
                    win = jnp.einsum(
                        "bwc,bcv->bwv", rowwin, cols_oh,
                        preferred_element_type=_F32,
                    )  # (B, Wy, Wx), exact (one-hot selection)
                lx = jnp.clip(fx - sx[:, None], 0.0, Wx - 1.001)
                ly = jnp.clip(fy - sy[:, None], 0.0, Wy - 1.001)
                ix = jnp.floor(lx)
                iy = jnp.floor(ly)
                tx = lx - ix
                ty = ly - iy
                Y0 = (iy[..., None] == jnp.arange(Wy, dtype=_F32)).astype(
                    _F32
                )  # (B, n_g, Wy)
                Y1 = (iy[..., None] + 1.0 == jnp.arange(Wy, dtype=_F32)).astype(
                    _F32
                )
                X0 = (ix[..., None] == jnp.arange(Wx, dtype=_F32)).astype(_F32)
                X1 = (ix[..., None] + 1.0 == jnp.arange(Wx, dtype=_F32)).astype(
                    _F32
                )
                R0 = jnp.einsum(
                    "bcw,bwv->bcv", Y0, win, preferred_element_type=_F32
                )
                R1 = jnp.einsum(
                    "bcw,bwv->bcv", Y1, win, preferred_element_type=_F32
                )
                h00 = jnp.sum(R0 * X0, -1)
                h01 = jnp.sum(R0 * X1, -1)
                h10 = jnp.sum(R1 * X0, -1)
                h11 = jnp.sum(R1 * X1, -1)
                parts.append(finish(h00, h01, h10, h11, tx, ty))
            # Scatter group results back into candidate order (static
            # permutation, free at trace time).
            perm = np.concatenate([np.asarray(o) for o in order])
            inv = np.empty(ncand, np.int64)
            inv[perm] = np.arange(ncand)
            return jnp.concatenate(parts, axis=1)[:, inv]

    else:
        raise ValueError(f"unknown terrain sampler method: {method!r}")

    sample.method = method
    sample.groups = groups
    return sample
