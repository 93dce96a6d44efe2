"""Pallas TPU kernel for the compound-eye retina render.

The XLA retina path (vision.py → render/raycast.py) materializes
(worlds, rays, geoms) intermediates under ``vmap``; at 4096 worlds one
721-ommatidium render costs ~266 ms on v5e — HBM-bound, ~25× off the VPU
roofline. This kernel keeps the whole nearest-hit + shading computation in
VMEM with **worlds in lanes**: a grid step processes 128 worlds; rays run
in 8-sublane tiles under a ``fori_loop``; the ~74 scene geoms are unrolled
with their per-(world, eye) quantities hoisted out of the ray loop.

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


def make_retina_kernel(model, retina, *, interpret: bool = False):
    """Build a batched retina render: state-batch → (B, 2, n_omm, 2).

    Args:
        model: PhysicsModel (static geom table used for radii/colors/types).
        retina: the Retina instance (ray directions + channel weights).
        interpret: Run via the Pallas interpreter (any backend — used by CI
            to cover the kernel without TPU hardware).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_omm = retina.n_ommatidia
    R8 = _pad_rows(n_omm)  # rays padded to sublane multiples
    n_tiles = R8 // 8

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

    # Ray tables (local frame) and channel weights, padded to R8 rows.
    def pad(x):
        out = np.zeros((R8,) + x.shape[1:], np.float32)
        out[: x.shape[0]] = x
        return out

    dirs_local = [
        pad(np.asarray(retina.directions_left, np.float32)),
        pad(np.asarray(retina.directions_right, np.float32)),
    ]  # 2 × (R8, 3)
    weights = pad(np.asarray(retina.channel_weights, np.float32))  # (R8, 2, 3)

    # Analytic cone anti-aliasing (soft silhouettes): static gate + slope.
    use_cone = float(getattr(retina, "cone_half_rad", 0.0)) > 0.0
    tanh_cone = float(np.tan(getattr(retina, "cone_half_rad", 0.0)))

    eye_bodies = (retina.left_eye_body, retina.right_eye_body)

    # Kernel input rows: per (world):
    #   eyes: 2 × (pos 3 + quat 4) = 14
    #   geoms: G × (p0 3, p1 3) = 6G   (world-frame capsule segments)
    n_in = 14 + 6 * G
    n_out = 2 * n_omm * 2  # eyes × ommatidia × channels

    # Broadcast constant tables as extra refs (rows, LANE): per component.
    # dirs: 2 eyes × 3 comps × R8 rows; weights: 2ch × 3 comps × R8.
    const_rows = 2 * 3 * R8 + 2 * 3 * R8

    def kernel(in_ref, const_ref, out_ref):
        def gv(i):
            return in_ref[i, :]

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
                    s0g = jnp.clip(baoa / jnp.maximum(baba, 1e-12), 0.0, 1.0)
                    d0sq = oaoa - 2.0 * s0g * baoa + s0g * s0g * baba
                    outside = (d0sq > r * r).astype(jnp.float32)
                else:
                    outside = None
                hoist.append(
                    (p0, p1, r, ba, baba, oa, ob, baoa, c_cyl, c_s0, c_s1,
                     outside)
                )

            def tile_body(i, _):
                # Local ray tile (8, LANE) per component, rotated to world.
                d0 = eye * 3 * R8
                dx = const_ref[pl.dslice(d0 + 0 * R8 + i * 8, 8), :]
                dy = const_ref[pl.dslice(d0 + 1 * R8 + i * 8, 8), :]
                dz = const_ref[pl.dslice(d0 + 2 * R8 + i * 8, 8), :]
                # quat rotate (broadcast (1,L) quat over (8,L) tiles)
                w_, x_, y_, z_ = (c[None, :] for c in q)
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
                oz = opos[2][None, :]
                tp = (ground_z - oz) / jnp.where(
                    jnp.abs(rdz) < 1e-12, 1e-12, rdz
                )
                hitp = (tp > 0.0) & (jnp.abs(rdz) > 1e-12)
                t_min = jnp.where(hitp, tp, t_min)
                idx = jnp.where(hitp, -1.0, idx)
                if use_cone:
                    # Background (ground/sky) color independent of geoms,
                    # and the coverage carries (matches vision._shade_cone).
                    t_bg = jnp.where(hitp, tp, _BIG)
                    hxb = opos[0][None, :] + tp * rdx
                    hyb = opos[1][None, :] + tp * rdy
                    chk_b = jnp.mod(jnp.floor(hxb) + jnp.floor(hyb), 2.0)
                    bgc = jnp.where(chk_b > 0.5, 0.4, 0.3)
                    bg_shade = jnp.where(hitp, 0.5 + 0.5 * jnp.abs(rdz), 1.0)
                    bg_r = jnp.where(hitp, bgc, 0.65) * bg_shade
                    bg_g = jnp.where(hitp, bgc, 0.75) * bg_shade
                    bg_b = jnp.where(hitp, bgc, 0.9) * bg_shade
                    cov = jnp.zeros((8, LANE), jnp.float32)
                    cov_r = jnp.zeros((8, LANE), jnp.float32)
                    cov_g = jnp.zeros((8, LANE), jnp.float32)
                    cov_b = jnp.zeros((8, LANE), jnp.float32)

                for gi, (p0, p1, r, ba, baba, oa, ob, baoa, c_cyl, c_s0, c_s1,
                         outside) in enumerate(hoist):
                    bard = (
                        ba[0][None, :] * rdx
                        + ba[1][None, :] * rdy
                        + ba[2][None, :] * rdz
                    )
                    rdoa = (
                        oa[0][None, :] * rdx
                        + oa[1][None, :] * rdy
                        + oa[2][None, :] * rdz
                    )
                    a_ = baba[None, :] - bard * bard
                    b_ = baba[None, :] * rdoa - baoa[None, :] * bard
                    h_ = b_ * b_ - a_ * c_cyl[None, :]
                    safe_a = jnp.where(jnp.abs(a_) < 1e-12, 1e-12, a_)
                    t_cyl = (-b_ - jnp.sqrt(jnp.maximum(h_, 0.0))) / safe_a
                    y_c = baoa[None, :] + t_cyl * bard
                    cyl_ok = (
                        (h_ >= 0.0)
                        & (y_c > 0.0)
                        & (y_c < baba[None, :])
                        & (t_cyl > 0.0)
                    )
                    # Endpoint spheres.
                    b_s0 = (
                        oa[0][None, :] * rdx
                        + oa[1][None, :] * rdy
                        + oa[2][None, :] * rdz
                    )
                    h_s0 = b_s0 * b_s0 - c_s0[None, :]
                    t_s0 = -b_s0 - jnp.sqrt(jnp.maximum(h_s0, 0.0))
                    t_s0 = jnp.where((h_s0 >= 0.0) & (t_s0 > 0.0), t_s0, _BIG)
                    b_s1 = (
                        ob[0][None, :] * rdx
                        + ob[1][None, :] * rdy
                        + ob[2][None, :] * rdz
                    )
                    h_s1 = b_s1 * b_s1 - c_s1[None, :]
                    t_s1 = -b_s1 - jnp.sqrt(jnp.maximum(h_s1, 0.0))
                    t_s1 = jnp.where((h_s1 >= 0.0) & (t_s1 > 0.0), t_s1, _BIG)
                    t_g = jnp.where(cyl_ok, t_cyl, jnp.minimum(t_s0, t_s1))
                    better = t_g < t_min
                    t_min = jnp.where(better, t_g, t_min)
                    idx = jnp.where(better, float(gi), idx)
                    ibaba = 1.0 / jnp.maximum(baba, 1e-12)
                    for k in range(3):
                        w_p0[k] = jnp.where(better, p0[k][None, :], w_p0[k])
                        w_ba[k] = jnp.where(better, ba[k][None, :], w_ba[k])
                    w_ibaba = jnp.where(better, ibaba[None, :], w_ibaba)
                    col = rgba[vis_geoms[gi]]
                    cr = jnp.where(better, float(col[0]), cr)
                    cg = jnp.where(better, float(col[1]), cg)
                    cb = jnp.where(better, float(col[2]), cb)
                    if use_cone:
                        # Ray-axis closest approach → angular coverage.
                        # rdoa = d·(o - p0) is b_s0 computed above.
                        denom_c = jnp.maximum(a_, 1e-12)
                        s_c = jnp.clip(
                            (baoa[None, :] - bard * b_s0) / denom_c, 0.0, 1.0
                        )
                        tc = jnp.maximum(bard * s_c - b_s0, 1e-6)
                        dxc = oa[0][None, :] + tc * rdx - s_c * ba[0][None, :]
                        dyc = oa[1][None, :] + tc * rdy - s_c * ba[1][None, :]
                        dzc = oa[2][None, :] + tc * rdz - s_c * ba[2][None, :]
                        dperp = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc)
                        width = jnp.maximum(tc * tanh_cone, 1e-9)
                        c_g2 = jnp.clip(
                            0.5 - 0.5 * (dperp - r) / width, 0.0, 1.0
                        )
                        c_g2 = c_g2 * outside[None, :]
                        c_g2 = jnp.where(tc < t_bg, c_g2, 0.0)
                        bett = c_g2 > cov
                        cov = jnp.where(bett, c_g2, cov)
                        cov_r = jnp.where(bett, float(col[0]), cov_r)
                        cov_g = jnp.where(bett, float(col[1]), cov_g)
                        cov_b = jnp.where(bett, float(col[2]), cov_b)

                # ---- winner reconstruction: normal from the carried
                # winner segment (ONE pass instead of re-sweeping geoms) ----
                hx = opos[0][None, :] + t_min * rdx
                hy = opos[1][None, :] + t_min * rdy
                hz = opos[2][None, :] + t_min * rdz
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
                    cr = jnp.clip(cov * g_r + (1.0 - cov) * bg_r, 0.0, 1.0)
                    cg = jnp.clip(cov * g_g + (1.0 - cov) * bg_g, 0.0, 1.0)
                    cb = jnp.clip(cov * g_b + (1.0 - cov) * bg_b, 0.0, 1.0)
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
                w0 = 2 * 3 * R8  # weights section offset in const_ref
                for k in range(2):
                    wr = const_ref[pl.dslice(w0 + (3 * k + 0) * R8 + i * 8, 8), :]
                    wg = const_ref[pl.dslice(w0 + (3 * k + 1) * R8 + i * 8, 8), :]
                    wb = const_ref[pl.dslice(w0 + (3 * k + 2) * R8 + i * 8, 8), :]
                    inten = cr * wr + cg * wg + cb * wb
                    out_ref[
                        pl.dslice((eye * 2 + k) * R8 + i * 8, 8), :
                    ] = inten
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

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
        packed = jnp.concatenate(rows, axis=0)
        pad_l = (-B) % LANE
        if pad_l:
            packed = jnp.pad(packed, ((0, 0), (0, pad_l)))
        nblk = packed.shape[1] // LANE

        # Constant tables broadcast over lanes.
        consts = []
        for eye in range(2):
            for k in range(3):
                consts.append(dirs_local[eye][:, k])
        for k in range(2):
            for c in range(3):
                consts.append(weights[:, k, c])
        const = jnp.asarray(np.stack(consts).reshape(-1), dtype)  # (rows,)
        const = jnp.broadcast_to(const[:, None], (const.shape[0], packed.shape[1]))

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2 * 2 * R8, packed.shape[1]), dtype),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((n_in, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (const_rows, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
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
