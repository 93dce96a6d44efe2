"""Mesh-fidelity rendering: per-segment SDF sphere-trace refinement.

The reference renders the fly's 62 anatomical STL meshes through MuJoCo GL
(``rendering.py:16-268``) / the Warp BVH raytracer
(``warp/rendering.py:279-341``). Triangle BVHs are a poor fit for XLA
(data-dependent tree traversal), so the TPU-native equivalent bakes each
body segment's mesh into a small body-frame signed-distance grid offline
(``scripts/dev/derive_sdf_assets.py`` → ``assets/model/sdf_meshes.npz``)
and refines the raycaster's capsule broad-phase hits with a
fixed-iteration sphere trace — pure gathers and elementwise math, fused
into the same XLA render program.

Pipeline per ray: the capsule pass proposes up to two candidate geoms
(capsules are the meshes' collision proxies, so the true surface is
always near a capsule hit); each candidate's SDF is marched for a fixed
number of steps in its body frame; the nearest mesh hit wins, with exact
SDF-gradient normals.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.engine.maths import quat_conj, quat_mul, quat_rotate

__all__ = ["build_sdf_pack", "sdf_refine"]

_BIG = 1e30
N_MARCH = 40
HIT_EPS_VOX = 0.6  # hit when sdf < this many voxels
RANGE_VOX = 6.0  # search window around the capsule hit, in voxels


@lru_cache(maxsize=1)
def _load_library():
    from flygym_tpu import assets_dir

    path = assets_dir / "model" / "sdf_meshes.npz"
    if not path.exists():
        return None
    return np.load(path)


def build_sdf_pack(model, geom_name2id):
    """Device arrays for SDF sampling, aligned with the model's geoms.

    Args:
        model: compiled PhysicsModel.
        geom_name2id: compile-time name map (``CompiledModel.geom_name2id``);
            segment meshes are matched by the geom's local name (the part
            after the fly-namespace ``/``).

    Returns:
        dict of jnp arrays (flat sdf buffer + per-geom meta), or None when
        the SDF asset bundle is absent.
    """
    lib = _load_library()
    if lib is None:
        return None
    ngeom = int(model.ngeom)
    id2name = {v: k for k, v in geom_name2id.items()}
    flat, base, dims, origin, spacing = [], [], [], [], []
    offset = 0
    for g in range(ngeom):
        name = id2name.get(g, "")
        seg = name.rsplit("/", 1)[-1]
        key = f"{seg}:sdf"
        if key in lib.files:
            sdf = lib[key].astype(np.float32)
            flat.append(sdf.ravel())
            base.append(offset)
            dims.append(sdf.shape)
            origin.append(lib[f"{seg}:origin"])
            spacing.append(float(lib[f"{seg}:spacing"]))
            offset += sdf.size
        else:
            base.append(-1)
            dims.append((1, 1, 1))
            origin.append(np.zeros(3, np.float32))
            spacing.append(1.0)
    if not flat:
        return None
    return dict(
        flat=jnp.asarray(np.concatenate(flat)),
        base=jnp.asarray(np.array(base, np.int32)),
        dims=jnp.asarray(np.array(dims, np.int32)),
        origin=jnp.asarray(np.array(origin, np.float32)),
        spacing=jnp.asarray(np.array(spacing, np.float32)),
    )


def _sample(pack, base, dims, origin, spacing, p):
    """Trilinear SDF sample at body-frame points p (..., 3).

    Outside the grid box the clamped border sample is augmented with the
    distance to the box, so marches started far away still converge.
    """
    q = (p - origin) / spacing[..., None]
    qc = jnp.clip(
        q, 0.0, dims.astype(q.dtype) - 1.001
    )
    i = jnp.floor(qc)
    f = qc - i
    i = i.astype(jnp.int32)
    ny = dims[..., 1]
    nz = dims[..., 2]

    def corner(dx, dy, dz):
        idx = (
            base
            + ((i[..., 0] + dx) * ny + (i[..., 1] + dy)) * nz
            + (i[..., 2] + dz)
        )
        return jnp.take(pack["flat"], jnp.maximum(idx, 0))

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    cx00 = c000 + fx * (c100 - c000)
    cx10 = c010 + fx * (c110 - c010)
    cx01 = c001 + fx * (c101 - c001)
    cx11 = c011 + fx * (c111 - c011)
    cxy0 = cx00 + fy * (cx10 - cx00)
    cxy1 = cx01 + fy * (cx11 - cx01)
    s = cxy0 + fz * (cxy1 - cxy0)
    # Box-exterior augmentation.
    out = (q - qc) * spacing[..., None]
    return s + jnp.linalg.norm(out, axis=-1)


def _march_one(pack, model, gpos, gquat, origins, dirs, t_cap, geom):
    """Sphere-trace one candidate geom per ray. Returns (t, normal, hit)."""
    g = jnp.maximum(geom, 0)
    has = (geom >= 0) & (pack["base"][g] >= 0) & (t_cap < _BIG)
    base = pack["base"][g]
    dims = pack["dims"][g]
    origin = pack["origin"][g]
    spacing = pack["spacing"][g]

    # Body world frame from the geom world pose and the constant
    # body→geom offset (SDF grids live in the BODY frame).
    gq_const = model.geom_quat[g]
    gp_const = model.geom_pos[g]
    bq = quat_mul(gquat[g], quat_conj(gq_const))
    bp = gpos[g] - quat_rotate(bq, gp_const)
    bq_inv = quat_conj(bq)
    o_l = quat_rotate(bq_inv, origins - bp)
    d_l = quat_rotate(bq_inv, dirs)

    radius = model.geom_size[g, 0]
    window = RANGE_VOX * spacing + radius
    t0 = jnp.maximum(t_cap - window, 0.0)
    t1 = t_cap + window
    eps = HIT_EPS_VOX * spacing
    min_step = 0.35 * spacing

    # Rolled loop (lax.fori_loop), NOT a Python unroll: 40 march steps x
    # 8 gathers per trilinear sample per candidate makes the unrolled XLA
    # graph large enough that the CPU backend's compile takes minutes
    # (the hang the batched-render test exposed); the rolled form keeps
    # the program constant-size at identical numerics.
    def _march_step(_, carry):
        t, hit, t_hit = carry
        p = o_l + t[..., None] * d_l
        s = _sample(pack, base, dims, origin, spacing, p)
        new_hit = has & ~hit & (s < eps) & (t <= t1)
        t_hit = jnp.where(new_hit, t, t_hit)
        hit = hit | new_hit
        t = t + jnp.where(hit, 0.0, jnp.maximum(s, min_step))
        return t, hit, t_hit

    t, hit, t_hit = jax.lax.fori_loop(
        0,
        N_MARCH,
        _march_step,
        (
            t0,
            jnp.zeros(t0.shape, bool),
            jnp.full(t0.shape, _BIG, t0.dtype),
        ),
    )
    # SDF-gradient normal at the hit (central differences, body frame).
    ph = o_l + t_hit[..., None] * d_l
    h = spacing[..., None] * 0.75

    def d_axis(ax):
        e = jnp.zeros((3,), ph.dtype).at[ax].set(1.0)
        return _sample(
            pack, base, dims, origin, spacing, ph + e * h
        ) - _sample(pack, base, dims, origin, spacing, ph - e * h)

    n_l = jnp.stack([d_axis(0), d_axis(1), d_axis(2)], axis=-1)
    n_l = n_l / jnp.maximum(
        jnp.linalg.norm(n_l, axis=-1, keepdims=True), 1e-12
    )
    n_w = quat_rotate(bq, n_l)
    return jnp.where(hit, t_hit, _BIG), n_w, hit


def sdf_refine(
    pack, model, gpos, gquat, origins, dirs, cand_t, cand_idx
):
    """Refine capsule candidate hits against the true mesh SDFs.

    Args:
        cand_t / cand_idx: lists of per-ray candidate hit distances and
            geom indices (nearest first, from the capsule broad-phase).

    Returns:
        (t, geom_idx, normal, hit): nearest mesh hit per ray. Rays whose
        candidates all miss their meshes (or carry no SDF) report
        hit=False — the caller keeps its capsule/ground result for them.
    """
    best_t = jnp.full(cand_t[0].shape, _BIG, cand_t[0].dtype)
    best_idx = jnp.full(cand_idx[0].shape, -2, jnp.int32)
    best_n = jnp.zeros(origins.shape, origins.dtype)
    any_hit = jnp.zeros(best_t.shape, bool)
    for t_c, idx_c in zip(cand_t, cand_idx):
        t_m, n_m, hit_m = _march_one(
            pack, model, gpos, gquat, origins, dirs, t_c, idx_c
        )
        better = hit_m & (t_m < best_t)
        best_t = jnp.where(better, t_m, best_t)
        best_idx = jnp.where(better, idx_c, best_idx)
        best_n = jnp.where(better[..., None], n_m, best_n)
        any_hit = any_hit | hit_m
    return best_t, best_idx, best_n, any_hit
