"""Pallas TPU kernel for the compound-eye retina render.

The XLA retina path (vision.py → render/raycast.py) materializes
(worlds, rays, geoms) intermediates under ``vmap``; at 4096 worlds one
721-ommatidium render costs ~266 ms on v5e — HBM-bound, ~25× off the VPU
roofline. This kernel keeps the whole nearest-hit + shading computation in
VMEM, in one of two layouts sharing ONE parametrized body:

- **worlds-major** (large batches): worlds in lanes; a grid step processes
  128 worlds; rays run in 8-sublane tiles under a ``fori_loop``; the ~74
  scene geoms are unrolled with their per-(world, eye) quantities hoisted
  out of the ray loop.
- **ray-major** (small batches): rays in lanes — ALL 721 ommatidia of one
  eye fit in a single (8, 128) tile — and the grid runs over worlds, with
  per-world quantities as Mosaic scalars. A worlds-major render at B=1
  wastes 127/128 lanes and still sweeps ~91 ray tiles; ray-major does the
  same eye in ONE tile pass (~90× less vector work), which is what the
  north-star single-fly step+render loop needs (2026-08-20).

``render_batched`` picks the layout by comparing actual tile-pass counts
at trace time (B is static under jit).

Replaces (perf path only): the reference's MuJoCo-Warp raytracer behind
``Retina.render`` (flygym ``warp/rendering.py:279-341``); the jnp path
remains for CPU and as the correctness oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_retina_kernel",
    "retina_pallas_available",
    "retina_kernel_supported",
]

LANE = 128
_BIG = 1e30


def retina_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def retina_kernel_supported(model) -> bool:
    """The kernel assumes a flat ground plane at ``model.ground_pos``;
    heightfield worlds stay on the jnp raycast path (which renders the
    terrain)."""
    return not model.has_hfield


def _pad_rows(n, m=8):
    return ((n + m - 1) // m) * m


def make_retina_kernel(model, retina, *, interpret: bool = False,
                       layout: str = "auto"):
    """Build a batched retina render: state-batch → (B, 2, n_omm, 2).

    Args:
        model: PhysicsModel (static geom table used for radii/colors/types).
        retina: the Retina instance (ray directions + channel weights).
        interpret: Run via the Pallas interpreter (any backend — used by CI
            to cover the kernel without TPU hardware).
        layout: "worlds" (worlds in lanes), "rays" (rays in lanes, grid
            over worlds), or "auto" (pick per batch size by tile-pass
            count; rays wins for small B, worlds for B ≳ 100).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if layout not in ("auto", "worlds", "rays"):
        raise ValueError(f"unknown retina kernel layout: {layout!r}")

    n_omm = retina.n_ommatidia
    R8 = _pad_rows(n_omm)  # rays padded to sublane multiples (worlds-major)
    n_tiles = R8 // 8
    # Ray-major: rays live in (8, LANE) tiles of 1024 slots.
    n_rtiles = -(-n_omm // (8 * LANE))
    RT_R = 8 * n_rtiles

    # Static per-geom data.
    geom_types = list(model.geom_types)
    radius = np.asarray(model.geom_size)[:, 0]
    rgba = np.asarray(model.geom_rgba)[:, :3]
    vis_geoms = [
        g for g, t in enumerate(geom_types) if t in ("capsule", "sphere")
    ]
    G = len(vis_geoms)
    ngeom = model.ngeom
    ground_z = float(np.asarray(model.ground_pos)[2])

    # Ray tables (local frame) and channel weights.
    def pad_to(x, rows):
        out = np.zeros((rows,) + x.shape[1:], np.float32)
        out[: x.shape[0]] = x
        return out

    dirs_np = [
        np.asarray(retina.directions_left, np.float32),
        np.asarray(retina.directions_right, np.float32),
    ]  # 2 × (n_omm, 3)
    weights_np = np.asarray(retina.channel_weights, np.float32)  # (n_omm,2,3)

    # Analytic cone anti-aliasing (soft silhouettes): static gate + slope.
    use_cone = float(getattr(retina, "cone_half_rad", 0.0)) > 0.0
    tanh_cone = float(np.tan(getattr(retina, "cone_half_rad", 0.0)))

    eye_bodies = (retina.left_eye_body, retina.right_eye_body)

    # Kernel input rows: per (world):
    #   eyes: 2 × (pos 3 + quat 4) = 14
    #   geoms: G × (p0 3, p1 3) = 6G   (world-frame capsule segments)
    n_in = 14 + 6 * G
    n_in8 = _pad_rows(n_in)

    def _build_kernel(ray_major):
        """One parametrized body for both layouts.

        ``RT`` is the per-(eye, component) section height in const_ref /
        out_ref rows; tile i covers rows [8i, 8i+8) of each section in
        BOTH layouts. Worlds-major reads per-world (LANE,) rows and
        broadcasts them over the (8, LANE) ray tile; ray-major reads
        per-world Mosaic scalars (in_ref[i, 0]) that broadcast for free.
        """
        RT = RT_R if ray_major else R8
        tiles = n_rtiles if ray_major else n_tiles

        def kernel(in_ref, const_ref, out_ref):
            if ray_major:
                gv = lambda i: in_ref[i, 0]  # scalar
                bc = lambda x: x
            else:
                gv = lambda i: in_ref[i, :]  # (LANE,)
                bc = lambda x: x[None, :]

            for eye in range(2):
                e0 = eye * 7
                opos = (gv(e0), gv(e0 + 1), gv(e0 + 2))
                q = (gv(e0 + 3), gv(e0 + 4), gv(e0 + 5), gv(e0 + 6))

                # ---- hoisted per-geom quantities for this eye ----
                hoist = []
                for gi in range(G):
                    base = 14 + 6 * gi
                    p0 = (gv(base), gv(base + 1), gv(base + 2))
                    p1 = (gv(base + 3), gv(base + 4), gv(base + 5))
                    r = float(radius[vis_geoms[gi]])
                    ba = tuple(p1[k] - p0[k] for k in range(3))
                    baba = ba[0] * ba[0] + ba[1] * ba[1] + ba[2] * ba[2]
                    oa = tuple(opos[k] - p0[k] for k in range(3))
                    ob = tuple(opos[k] - p1[k] for k in range(3))
                    baoa = ba[0] * oa[0] + ba[1] * oa[1] + ba[2] * oa[2]
                    oaoa = oa[0] * oa[0] + oa[1] * oa[1] + oa[2] * oa[2]
                    obob = ob[0] * ob[0] + ob[1] * ob[1] + ob[2] * ob[2]
                    c_cyl = baba * oaoa - baoa * baoa - r * r * baba
                    c_s0 = oaoa - r * r
                    c_s1 = obob - r * r
                    if use_cone:
                        # Origin-outside gate for the coverage pass (rays
                        # starting inside a geom see through it, like the
                        # hard raycast's t > 0 entry-hit rule).
                        s0g = jnp.clip(
                            baoa / jnp.maximum(baba, 1e-12), 0.0, 1.0
                        )
                        d0sq = oaoa - 2.0 * s0g * baoa + s0g * s0g * baba
                        outside = (d0sq > r * r).astype(jnp.float32)
                    else:
                        outside = None
                    hoist.append(
                        (p0, p1, r, ba, baba, oa, ob, baoa, c_cyl, c_s0,
                         c_s1, outside)
                    )

                def tile_body(i, _):
                    # Ray tile (8, LANE) per component, rotated to world.
                    d0 = eye * 3 * RT
                    dx = const_ref[pl.dslice(d0 + 0 * RT + i * 8, 8), :]
                    dy = const_ref[pl.dslice(d0 + 1 * RT + i * 8, 8), :]
                    dz = const_ref[pl.dslice(d0 + 2 * RT + i * 8, 8), :]
                    # quat rotate (broadcast per-world quat over the tile)
                    w_, x_, y_, z_ = (bc(c) for c in q)
                    tx = 2.0 * (y_ * dz - z_ * dy)
                    ty = 2.0 * (z_ * dx - x_ * dz)
                    tz = 2.0 * (x_ * dy - y_ * dx)
                    rdx = dx + w_ * tx + (y_ * tz - z_ * ty)
                    rdy = dy + w_ * ty + (z_ * tx - x_ * tz)
                    rdz = dz + w_ * tz + (x_ * ty - y_ * tx)

                    t_min = jnp.full((8, LANE), _BIG, jnp.float32)
                    idx = jnp.full((8, LANE), -2.0, jnp.float32)
                    # Winner segment data, carried via `where` as the sweep
                    # runs (saves a second all-geoms reconstruction loop).
                    zt = jnp.zeros((8, LANE), jnp.float32)
                    w_p0 = [zt, zt, zt]
                    w_ba = [zt, zt, zt]
                    w_ibaba = jnp.ones((8, LANE), jnp.float32)
                    cr = jnp.zeros((8, LANE), jnp.float32)
                    cg = jnp.zeros((8, LANE), jnp.float32)
                    cb = jnp.zeros((8, LANE), jnp.float32)

                    # Ground plane.
                    oz = bc(opos[2])
                    tp = (ground_z - oz) / jnp.where(
                        jnp.abs(rdz) < 1e-12, 1e-12, rdz
                    )
                    hitp = (tp > 0.0) & (jnp.abs(rdz) > 1e-12)
                    t_min = jnp.where(hitp, tp, t_min)
                    idx = jnp.where(hitp, -1.0, idx)
                    if use_cone:
                        # Background (ground/sky) color independent of
                        # geoms, and the coverage carries (matches
                        # vision._shade_cone).
                        t_bg = jnp.where(hitp, tp, _BIG)
                        hxb = bc(opos[0]) + tp * rdx
                        hyb = bc(opos[1]) + tp * rdy
                        chk_b = jnp.mod(jnp.floor(hxb) + jnp.floor(hyb), 2.0)
                        bgc = jnp.where(chk_b > 0.5, 0.4, 0.3)
                        bg_shade = jnp.where(
                            hitp, 0.5 + 0.5 * jnp.abs(rdz), 1.0
                        )
                        bg_r = jnp.where(hitp, bgc, 0.65) * bg_shade
                        bg_g = jnp.where(hitp, bgc, 0.75) * bg_shade
                        bg_b = jnp.where(hitp, bgc, 0.9) * bg_shade
                        cov = jnp.zeros((8, LANE), jnp.float32)
                        cov_r = jnp.zeros((8, LANE), jnp.float32)
                        cov_g = jnp.zeros((8, LANE), jnp.float32)
                        cov_b = jnp.zeros((8, LANE), jnp.float32)

                    for gi, (p0, p1, r, ba, baba, oa, ob, baoa, c_cyl,
                             c_s0, c_s1, outside) in enumerate(hoist):
                        bard = (
                            bc(ba[0]) * rdx
                            + bc(ba[1]) * rdy
                            + bc(ba[2]) * rdz
                        )
                        rdoa = (
                            bc(oa[0]) * rdx
                            + bc(oa[1]) * rdy
                            + bc(oa[2]) * rdz
                        )
                        a_ = bc(baba) - bard * bard
                        b_ = bc(baba) * rdoa - bc(baoa) * bard
                        h_ = b_ * b_ - a_ * bc(c_cyl)
                        safe_a = jnp.where(jnp.abs(a_) < 1e-12, 1e-12, a_)
                        t_cyl = (
                            -b_ - jnp.sqrt(jnp.maximum(h_, 0.0))
                        ) / safe_a
                        y_c = bc(baoa) + t_cyl * bard
                        cyl_ok = (
                            (h_ >= 0.0)
                            & (y_c > 0.0)
                            & (y_c < bc(baba))
                            & (t_cyl > 0.0)
                        )
                        # Endpoint spheres.
                        b_s0 = (
                            bc(oa[0]) * rdx
                            + bc(oa[1]) * rdy
                            + bc(oa[2]) * rdz
                        )
                        h_s0 = b_s0 * b_s0 - bc(c_s0)
                        t_s0 = -b_s0 - jnp.sqrt(jnp.maximum(h_s0, 0.0))
                        t_s0 = jnp.where(
                            (h_s0 >= 0.0) & (t_s0 > 0.0), t_s0, _BIG
                        )
                        b_s1 = (
                            bc(ob[0]) * rdx
                            + bc(ob[1]) * rdy
                            + bc(ob[2]) * rdz
                        )
                        h_s1 = b_s1 * b_s1 - bc(c_s1)
                        t_s1 = -b_s1 - jnp.sqrt(jnp.maximum(h_s1, 0.0))
                        t_s1 = jnp.where(
                            (h_s1 >= 0.0) & (t_s1 > 0.0), t_s1, _BIG
                        )
                        t_g = jnp.where(cyl_ok, t_cyl, jnp.minimum(t_s0, t_s1))
                        better = t_g < t_min
                        t_min = jnp.where(better, t_g, t_min)
                        idx = jnp.where(better, float(gi), idx)
                        ibaba = 1.0 / jnp.maximum(baba, 1e-12)
                        for k in range(3):
                            w_p0[k] = jnp.where(better, bc(p0[k]), w_p0[k])
                            w_ba[k] = jnp.where(better, bc(ba[k]), w_ba[k])
                        w_ibaba = jnp.where(better, bc(ibaba), w_ibaba)
                        col = rgba[vis_geoms[gi]]
                        cr = jnp.where(better, float(col[0]), cr)
                        cg = jnp.where(better, float(col[1]), cg)
                        cb = jnp.where(better, float(col[2]), cb)
                        if use_cone:
                            # Ray-axis closest approach → angular coverage.
                            # rdoa = d·(o - p0) is b_s0 computed above.
                            denom_c = jnp.maximum(a_, 1e-12)
                            s_c = jnp.clip(
                                (bc(baoa) - bard * b_s0) / denom_c, 0.0, 1.0
                            )
                            tc = jnp.maximum(bard * s_c - b_s0, 1e-6)
                            dxc = bc(oa[0]) + tc * rdx - s_c * bc(ba[0])
                            dyc = bc(oa[1]) + tc * rdy - s_c * bc(ba[1])
                            dzc = bc(oa[2]) + tc * rdz - s_c * bc(ba[2])
                            dperp = jnp.sqrt(
                                dxc * dxc + dyc * dyc + dzc * dzc
                            )
                            width = jnp.maximum(tc * tanh_cone, 1e-9)
                            c_g2 = jnp.clip(
                                0.5 - 0.5 * (dperp - r) / width, 0.0, 1.0
                            )
                            c_g2 = c_g2 * bc(outside)
                            c_g2 = jnp.where(tc < t_bg, c_g2, 0.0)
                            bett = c_g2 > cov
                            cov = jnp.where(bett, c_g2, cov)
                            cov_r = jnp.where(bett, float(col[0]), cov_r)
                            cov_g = jnp.where(bett, float(col[1]), cov_g)
                            cov_b = jnp.where(bett, float(col[2]), cov_b)

                    # ---- winner reconstruction: normal from the carried
                    # winner segment (ONE pass, no re-sweeping geoms) ----
                    hx = bc(opos[0]) + t_min * rdx
                    hy = bc(opos[1]) + t_min * rdy
                    hz = bc(opos[2]) + t_min * rdz
                    s_ = (
                        (hx - w_p0[0]) * w_ba[0]
                        + (hy - w_p0[1]) * w_ba[1]
                        + (hz - w_p0[2]) * w_ba[2]
                    ) * w_ibaba
                    s_ = jnp.clip(s_, 0.0, 1.0)
                    dx_ = hx - (w_p0[0] + s_ * w_ba[0])
                    dy_ = hy - (w_p0[1] + s_ * w_ba[1])
                    dz_ = hz - (w_p0[2] + s_ * w_ba[2])
                    nrm = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
                    inv_n = 1.0 / jnp.maximum(nrm, 1e-12)
                    is_geom = idx >= 0.0
                    nx = jnp.where(is_geom, dx_ * inv_n, 0.0)
                    ny = jnp.where(is_geom, dy_ * inv_n, 0.0)
                    nz = jnp.where(is_geom, dz_ * inv_n, 1.0)
                    if use_cone:
                        # Coverage blend (matches vision._shade_cone): the
                        # nearest-geom shaded color where the ray hits, the
                        # silhouette shade (0.5 x color) for near-misses,
                        # mixed with the plane/sky background by coverage.
                        lam = jnp.abs(-(nx * rdx + ny * rdy + nz * rdz))
                        gshade = 0.5 + 0.5 * lam
                        g_r = jnp.where(is_geom, cr * gshade, 0.5 * cov_r)
                        g_g = jnp.where(is_geom, cg * gshade, 0.5 * cov_g)
                        g_b = jnp.where(is_geom, cb * gshade, 0.5 * cov_b)
                        cr = jnp.clip(
                            cov * g_r + (1.0 - cov) * bg_r, 0.0, 1.0
                        )
                        cg = jnp.clip(
                            cov * g_g + (1.0 - cov) * bg_g, 0.0, 1.0
                        )
                        cb = jnp.clip(
                            cov * g_b + (1.0 - cov) * bg_b, 0.0, 1.0
                        )
                    else:
                        # Ground checker / sky (matches vision._shade).
                        is_ground = idx == -1.0
                        is_sky = idx == -2.0
                        checker = jnp.mod(jnp.floor(hx) + jnp.floor(hy), 2.0)
                        gcol = jnp.where(checker > 0.5, 0.4, 0.3)
                        cr = jnp.where(
                            is_ground, gcol, jnp.where(is_sky, 0.65, cr)
                        )
                        cg = jnp.where(
                            is_ground, gcol, jnp.where(is_sky, 0.75, cg)
                        )
                        cb = jnp.where(
                            is_ground, gcol, jnp.where(is_sky, 0.9, cb)
                        )
                        lam = jnp.abs(-(nx * rdx + ny * rdy + nz * rdz))
                        shade = jnp.where(is_sky, 1.0, 0.5 + 0.5 * lam)
                        cr = jnp.clip(cr * shade, 0.0, 1.0)
                        cg = jnp.clip(cg * shade, 0.0, 1.0)
                        cb = jnp.clip(cb * shade, 0.0, 1.0)

                    # Channel weights: intensity_k = dot(rgb, w_k).
                    w0 = 2 * 3 * RT  # weights section offset in const_ref
                    for k in range(2):
                        wr = const_ref[
                            pl.dslice(w0 + (3 * k + 0) * RT + i * 8, 8), :
                        ]
                        wg = const_ref[
                            pl.dslice(w0 + (3 * k + 1) * RT + i * 8, 8), :
                        ]
                        wb = const_ref[
                            pl.dslice(w0 + (3 * k + 2) * RT + i * 8, 8), :
                        ]
                        inten = cr * wr + cg * wg + cb * wb
                        out_ref[
                            pl.dslice((eye * 2 + k) * RT + i * 8, 8), :
                        ] = inten
                    return 0

                jax.lax.fori_loop(0, tiles, tile_body, 0)

        return kernel

    # ---- constant tables, one arrangement per layout ----
    def _consts_worlds():
        # (rows,) per-section column vectors broadcast over lanes.
        consts = []
        for eye in range(2):
            d = pad_to(dirs_np[eye], R8)
            for k in range(3):
                consts.append(d[:, k])
        w = pad_to(weights_np, R8)
        for k in range(2):
            for c in range(3):
                consts.append(w[:, k, c])
        return np.stack(consts).reshape(-1)  # (const_rows,)

    def _consts_rays():
        # Ray r lives at tile slot (r // LANE % 8 ... ) — row-major
        # (8, LANE) flattening of each n_rtiles*1024 section.
        def tile(v):  # (n_omm,) -> (RT_R, LANE)
            flat = np.zeros(RT_R * LANE, np.float32)
            flat[: v.shape[0]] = v
            return flat.reshape(RT_R, LANE)

        secs = []
        for eye in range(2):
            for k in range(3):
                secs.append(tile(dirs_np[eye][:, k]))
        for k in range(2):
            for c in range(3):
                secs.append(tile(weights_np[:, k, c]))
        return np.concatenate(secs, axis=0)  # (2*3*RT_R + 6*RT_R, LANE)

    const_worlds = _consts_worlds()
    const_rays = _consts_rays()
    const_rows_w = const_worlds.shape[0]
    const_rows_r = const_rays.shape[0]
    kernel_w = _build_kernel(ray_major=False)
    kernel_r = _build_kernel(ray_major=True)

    @jax.jit
    def render_batched(state):
        """(B,)-batched State → (B, 2, n_omm, 2) retina intensities."""
        from flygym_tpu.engine.maths import quat_mul, quat_rotate

        B = state.qpos.shape[0]
        dtype = jnp.float32
        xpos, xquat = state.xpos, state.xquat

        rows = []
        for eb in eye_bodies:
            rows.append(xpos[:, eb].T.astype(dtype))  # (3, B)
            rows.append(xquat[:, eb].T.astype(dtype))  # (4, B)
        gb = model.geom_body[np.asarray(vis_geoms)]
        gsel = np.asarray(vis_geoms)
        gpos = xpos[:, gb] + quat_rotate(xquat[:, gb], model.geom_pos[gsel])
        gquat = quat_mul(xquat[:, gb], model.geom_quat[gsel])
        zax = quat_rotate(gquat, jnp.array([0.0, 0.0, 1.0], dtype))
        half = model.geom_size[gsel, 1]
        p0 = gpos - half[None, :, None] * zax  # (B, G, 3)
        p1 = gpos + half[None, :, None] * zax
        seg = jnp.concatenate([p0, p1], axis=-1)  # (B, G, 6)
        rows.append(seg.reshape(B, 6 * G).T.astype(dtype))
        packed = jnp.concatenate(rows, axis=0)  # (n_in, B)

        # Layout choice by tile-pass count (B is static under jit):
        # worlds-major sweeps ceil(B/128)*n_tiles ray tiles; ray-major
        # sweeps B*n_rtiles. Per-world scalar hoists give worlds-major
        # the edge at equal counts, so strict inequality.
        n_lane_blk = -(-B // LANE)
        use_rays = layout == "rays" or (
            layout == "auto" and B * n_rtiles < n_lane_blk * n_tiles
        )

        if use_rays:
            # (B, n_in8, LANE): each world's scalars broadcast over lanes
            # (the kernel reads lane 0); grid over worlds.
            vals = packed.T  # (B, n_in)
            if n_in8 != n_in:
                vals = jnp.pad(vals, ((0, 0), (0, n_in8 - n_in)))
            inb = jnp.broadcast_to(
                vals[:, :, None], (B, n_in8, LANE)
            ).reshape(B * n_in8, LANE)
            const = jnp.asarray(const_rays, dtype)
            out = pl.pallas_call(
                kernel_r,
                out_shape=jax.ShapeDtypeStruct(
                    (B * 2 * 2 * RT_R, LANE), dtype
                ),
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (n_in8, LANE),
                        lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (const_rows_r, LANE),
                        lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2 * 2 * RT_R, LANE),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=64 * 2**20,
                ),
                interpret=interpret,
            )(inb, const)
            # (B, eye, ch, RT_R*LANE) -> slice rays -> (B, eye, n, ch)
            out = out.reshape(B, 2, 2, RT_R * LANE)[:, :, :, :n_omm]
            return jnp.transpose(out, (0, 1, 3, 2))

        pad_l = (-B) % LANE
        if pad_l:
            packed = jnp.pad(packed, ((0, 0), (0, pad_l)))
        nblk = packed.shape[1] // LANE
        const = jnp.asarray(const_worlds, dtype)
        const = jnp.broadcast_to(
            const[:, None], (const.shape[0], packed.shape[1])
        )
        out = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct(
                (2 * 2 * R8, packed.shape[1]), dtype
            ),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(
                    (n_in, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (const_rows_w, LANE),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2 * 2 * R8, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 2**20,
            ),
            interpret=interpret,
        )(packed, const)
        out = out[:, :B]  # (2*2*R8, B)
        out = out.reshape(2, 2, R8, B)[:, :, :n_omm]  # (eye, ch, n, B)
        return jnp.transpose(out, (3, 0, 2, 1))  # (B, eye, n, ch)

    return render_batched
