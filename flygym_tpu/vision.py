"""Compound-eye vision: hexagonal ommatidia retina rendered by direct raycast.

The reference v2 repo does not ship vision (moved to flygym-gymnasium,
SURVEY.md §0); this implements the NeuroMechFly retina concept from the docs
(``docs/index.md:30``: "retina simulation" with hexagonal ommatidia per eye)
the TPU-native way mandated by the north star: instead of rendering a fisheye
camera image and pooling pixels per ommatidium (the flygym 1.x approach), each
ommatidium casts one ray along its optical axis directly against the scene
primitives — one (n_ommatidia, ngeom) intersection problem per eye that fuses
into the jitted step.

Conventions follow flygym 1.x semantics: 721 ommatidia per eye (15 hex rings),
two spectral channel types (pale / yellow) assigned per ommatidium, output
intensities in [0, 1], shape (2 eyes, 721, 2 channels).

Acceptance-angle optics: real ommatidia integrate light over a Gaussian
acceptance cone (half-width ~ the interommatidial angle), which flygym 1.x
models by pooling fisheye-camera pixels per ommatidium. The raycast analog
here is a neighbor-weighted Gaussian blur on the hex lattice itself: each
ommatidium's response mixes its neighbors' point samples with weights
exp(-θ²/2σ²) over the angular distance θ between optical axes — one
(n_omm, n_omm) matmul on the render output (MXU-friendly, identical for
the jnp and Pallas paths). This removes the per-step full-ommatidium
flicker of point sampling on thin/edge targets (a thin bar crossing an
optical axis now fades across the neighborhood instead of toggling one
ommatidium's whole response). Disable with ``acceptance_fwhm_deg=0``.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.engine.maths import quat_rotate
from flygym_tpu.engine.model import PhysicsModel, State
from flygym_tpu.render.raycast import raycast_scene

__all__ = ["Retina", "hex_lattice_directions", "NUM_OMMATIDIA_PER_EYE"]

NUM_OMMATIDIA_PER_EYE = 721  # 15 hexagonal rings: 1 + 6 * (1 + 2 + ... + 15)


def hex_lattice_directions(
    n_rings: int = 15, cap_half_angle_deg: float = 135.0
) -> np.ndarray:
    """Unit view directions of a hexagonal ommatidia lattice.

    The lattice tiles a spherical cap around the +x (optical) axis of the eye
    frame: ring k sits at polar angle k/n_rings * cap_half_angle, with 6k
    ommatidia equally spaced in azimuth. The fly eye covers a very wide field
    (~270 deg binocular total); the default cap half-angle of 135 deg gives
    each eye a hemisphere-plus field like the real compound eye.

    Returns:
        (1 + 3 n (n+1), 3) unit directions in the eye frame.
    """
    dirs = [np.array([1.0, 0.0, 0.0])]
    cap = np.deg2rad(cap_half_angle_deg)
    for ring in range(1, n_rings + 1):
        polar = cap * ring / n_rings
        n_in_ring = 6 * ring
        for i in range(n_in_ring):
            azim = 2 * np.pi * i / n_in_ring + (np.pi / n_in_ring) * (ring % 2)
            d = np.array(
                [
                    np.cos(polar),
                    np.sin(polar) * np.cos(azim),
                    np.sin(polar) * np.sin(azim),
                ]
            )
            dirs.append(d)
    return np.stack(dirs)


@dataclass(frozen=True)
class Retina:
    """Precomputed retina geometry + channel assignment for both eyes.

    Args:
        model: Compiled physics model.
        left_eye_body / right_eye_body: body indices of the eye segments.

    The eye optical axes point laterally-forward: yaw = ±(90 - 30) deg from
    the head's forward (+x) axis, i.e. each eye looks 60 deg outward, giving
    the fly near-panoramic coverage with a frontal binocular overlap.
    """

    left_eye_body: int
    right_eye_body: int
    directions_left: np.ndarray  # (n_omm, 3) in eye body frame
    directions_right: np.ndarray
    channel_weights: np.ndarray  # (n_omm, 2, 3) rgb weights per channel type
    n_ommatidia: int
    # (2, n_omm, n_omm) per-channel acceptance-cone mixing matrices
    # (row-normalized Gaussian over inter-axis angle, restricted to
    # same-spectral-type ommatidia so the pale/yellow mosaic sparsity is
    # preserved), or None for sharp point sampling.
    blur_weights: np.ndarray | None = None
    # Acceptance-cone half-angle (radians) for analytic silhouette
    # anti-aliasing: each ray blends the nearest geom with the background
    # in proportion to how much of the cone the geom covers (computed from
    # the ray-axis miss distance already produced by the intersection
    # math — no extra rays). 0 disables (hard silhouettes).
    cone_half_rad: float = 0.0

    @classmethod
    def build(
        cls,
        model: PhysicsModel,
        left_eye_body: int,
        right_eye_body: int,
        *,
        n_rings: int = 15,
        eye_yaw_deg: float = 60.0,
        pale_fraction: float = 0.3,
        seed: int = 0,
        acceptance_fwhm_deg: float | None = None,
    ) -> "Retina":
        """Build the retina tables.

        Args:
            acceptance_fwhm_deg: Gaussian acceptance-cone full width at half
                maximum, in degrees of inter-axis angle. ``None`` (default)
                uses the lattice's own polar ring spacing (135/n_rings deg —
                the Nyquist-matched choice; ~9 deg at 15 rings, bracketing
                the real fly's ~5 deg Δρ given this lattice's resolution).
                Pass 0 to disable (sharp single-ray sampling).
        """
        base = hex_lattice_directions(n_rings)
        if acceptance_fwhm_deg is None:
            acceptance_fwhm_deg = 135.0 / n_rings

        def yaw_rot(deg):
            a = np.deg2rad(deg)
            return np.array(
                [
                    [np.cos(a), -np.sin(a), 0.0],
                    [np.sin(a), np.cos(a), 0.0],
                    [0.0, 0.0, 1.0],
                ]
            )

        dirs_l = base @ yaw_rot(eye_yaw_deg).T
        dirs_r = base @ yaw_rot(-eye_yaw_deg).T

        # Spectral channel types: 'pale' (blue-ish sensitivity) and 'yellow'
        # (green-ish), randomly assigned ~30/70 like the real retina mosaic.
        n = len(base)
        rng = np.random.default_rng(seed)
        is_pale = rng.random(n) < pale_fraction
        pale_w = np.array([0.05, 0.25, 0.70])  # blue-weighted
        yellow_w = np.array([0.30, 0.65, 0.05])  # green-weighted
        weights = np.zeros((n, 2, 3))
        weights[:, 0] = np.where(is_pale[:, None], pale_w, 0.0)
        weights[:, 1] = np.where(~is_pale[:, None], yellow_w, 0.0)

        blur = None
        if acceptance_fwhm_deg > 0:
            # Gaussian over the angle between optical axes, truncated at
            # 1.5 FWHM (weights < ~0.2% there). Pooling is restricted to
            # SAME-spectral-type ommatidia (each photoreceptor class
            # integrates over its own mosaic), with rows normalized to 1
            # so a uniform scene is unchanged, and masked to the row's own
            # type so the pale/yellow channel sparsity is preserved. The
            # lattice is shared by both eyes (directions differ only by a
            # rigid yaw), so one (2, n, n) table serves both.
            cosang = np.clip(base @ base.T, -1.0, 1.0)
            ang = np.degrees(np.arccos(cosang))
            sigma = acceptance_fwhm_deg / 2.3548  # FWHM -> sigma
            w = np.exp(-0.5 * (ang / sigma) ** 2)
            w[ang > 1.5 * acceptance_fwhm_deg] = 0.0
            blur = np.zeros((2, n, n), np.float32)
            for k, ind in enumerate((is_pale, ~is_pale)):
                wk = w * ind[None, :]
                wk = wk / np.maximum(wk.sum(axis=1, keepdims=True), 1e-12)
                blur[k] = wk * ind[:, None]

        return cls(
            left_eye_body=left_eye_body,
            right_eye_body=right_eye_body,
            directions_left=dirs_l.astype(np.float32),
            directions_right=dirs_r.astype(np.float32),
            channel_weights=weights.astype(np.float32),
            n_ommatidia=n,
            blur_weights=blur,
            cone_half_rad=float(np.deg2rad(acceptance_fwhm_deg / 2.0)),
        )

    def apply_acceptance(self, intensities: jnp.ndarray) -> jnp.ndarray:
        """Mix point-sample intensities over the acceptance cone.

        ``intensities``: (..., n_omm, 2 channels). One MXU matmul per
        channel over the ommatidium axis (same-type pooling); identity
        when ``blur_weights`` is None.
        """
        if self.blur_weights is None:
            return intensities
        W = jnp.asarray(self.blur_weights)  # (2, n, n)
        return jnp.einsum(
            "kon,...nk->...ok", W, intensities,
            preferred_element_type=intensities.dtype,
        )

    @classmethod
    def for_fly(cls, world, fly_name: str, **kwargs) -> "Retina":
        """Build from a compiled world using the fly's eye segments."""
        ids = world.compiled.body_name2id
        return cls.build(
            world.compiled.model,
            left_eye_body=ids[f"{fly_name}/l_eye"],
            right_eye_body=ids[f"{fly_name}/r_eye"],
            **kwargs,
        )

    def make_render_batched(self, model: PhysicsModel, *,
                            interpret: bool = False, layout: str = "auto"):
        """Batched render function: (B,)-batched State → (B, 2, n_omm, 2).

        On the TPU backend (or with ``interpret=True`` anywhere) this is the
        Pallas retina kernel (``ops/retina_pallas.py``) — worlds in lanes,
        whole nearest-hit + shading computation in VMEM; the vmapped jnp
        raycast otherwise (and for heightfield worlds, which the kernel's
        flat-ground shading does not cover). Both produce identical
        semantics; the jnp path is the correctness oracle
        (``tests/engine/test_retina_kernel.py``).
        """
        use_kernel = interpret or jax.default_backend() == "tpu"
        if use_kernel:
            from flygym_tpu.ops.retina_pallas import (
                make_retina_kernel,
                retina_kernel_supported,
            )

            if retina_kernel_supported(model):
                kern = make_retina_kernel(
                    model, self, interpret=interpret, layout=layout
                )
                if self.blur_weights is None:
                    return kern
                # Acceptance-cone mixing stays OUTSIDE the kernel: one
                # (n_omm, n_omm) matmul on the kernel output that XLA
                # fuses onto the MXU — the point-sample kernel itself is
                # unchanged.
                return jax.jit(lambda s: self.apply_acceptance(kern(s)))
        return jax.jit(jax.vmap(lambda s: self.render(model, s)))

    def render(self, model: PhysicsModel, state: State) -> jnp.ndarray:
        """Render both eyes: (2, n_ommatidia, 2) intensities in [0, 1].

        Pure jnp — vmappable over worlds and fusable into a scanned episode.
        With ``cone_half_rad > 0`` each ray's nearest geom is blended with
        the background by its analytic cone coverage (soft silhouettes —
        also differentiable w.r.t. pose, unlike the hard-edge select).
        """
        from flygym_tpu.engine.kinematics import geom_poses

        gpos, gquat = geom_poses(model, state.xpos, state.xquat)
        capsule_mask = jnp.asarray(
            np.array(
                [1.0 if t in ("capsule", "sphere") else 0.0 for t in model.geom_types],
                np.float32,
            )
        )

        outputs = []
        for body, dirs_local in (
            (self.left_eye_body, self.directions_left),
            (self.right_eye_body, self.directions_right),
        ):
            eye_pos = state.xpos[body]
            eye_quat = state.xquat[body]
            dirs = quat_rotate(eye_quat[None, :], jnp.asarray(dirs_local))
            origins = jnp.broadcast_to(eye_pos, dirs.shape)
            t, geom_idx, normal = raycast_scene(
                model, gpos, gquat, origins, dirs, capsule_mask
            )
            if self.cone_half_rad > 0:
                rgb = self._shade_cone(
                    model, t, geom_idx, normal, origins, dirs,
                    gpos, gquat, capsule_mask,
                )
            else:
                rgb = self._shade(model, t, geom_idx, normal, origins, dirs)
            # Per-ommatidium spectral response: dot(rgb, channel weights).
            w = jnp.asarray(self.channel_weights)  # (n, 2, 3)
            outputs.append(jnp.einsum("nc,nkc->nk", rgb, w))
        return self.apply_acceptance(jnp.stack(outputs))

    def _cone_coverage(self, model, gpos, gquat, origins, dirs, capsule_mask,
                       t_bg):
        """Max analytic cone coverage over capsule geoms per ray.

        For each geom: the ray-axis closest approach (s on the segment,
        t along the ray, perpendicular distance d) gives the angular miss
        margin (d - r) / (t * tan(half)); coverage ramps linearly from 1
        (axis well inside the silhouette) through 0.5 (exactly on it) to 0
        (a full cone-width outside). Geoms beyond the background hit are
        masked (occluded by the ground). Returns (cov (R,), rgb (R, 3)) of
        the max-coverage geom.
        """
        from flygym_tpu.render.raycast import _capsule_segments

        p0, p1, radius = _capsule_segments(model, gpos, gquat)
        R = origins.shape[0]
        dt = origins.dtype
        tanh_ = float(np.tan(self.cone_half_rad))
        cov = jnp.zeros((R,), dt)
        cov_rgb = jnp.zeros((R, 3), dt)
        ngeom = p0.shape[0]
        CHUNK = 8
        geom_rgb_all = model.geom_rgba[:, :3]
        for c0 in range(0, ngeom, CHUNK):
            c1 = min(c0 + CHUNK, ngeom)
            a0 = p0[None, c0:c1, :]
            ba = p1[None, c0:c1, :] - a0
            oa = origins[:, None, :] - a0
            d = dirs[:, None, :]
            e_q = jnp.sum(ba * ba, axis=-1)
            b_q = jnp.sum(d * ba, axis=-1)
            c_q = jnp.sum(d * oa, axis=-1)
            f_q = jnp.sum(ba * oa, axis=-1)
            denom = jnp.maximum(e_q - b_q * b_q, 1e-12)  # |d| = 1
            s = jnp.clip((f_q - b_q * c_q) / denom, 0.0, 1.0)
            tc = jnp.maximum(b_q * s - c_q, 1e-6)
            closest_ray = origins[:, None, :] + tc[..., None] * d
            closest_seg = a0 + s[..., None] * ba
            dperp = jnp.linalg.norm(closest_ray - closest_seg, axis=-1)
            width = jnp.maximum(tc * tanh_, 1e-9)
            mu = (dperp - radius[None, c0:c1]) / width
            c_g = jnp.clip(0.5 - 0.5 * mu, 0.0, 1.0)
            c_g = jnp.where(capsule_mask[None, c0:c1] > 0, c_g, 0.0)
            c_g = jnp.where(tc < t_bg[:, None], c_g, 0.0)
            # Rays starting INSIDE a geom (the eye sits within the head
            # capsule) see through it — like the hard raycast, which only
            # accepts entry hits at t > 0.
            s0 = jnp.clip(f_q / jnp.maximum(e_q, 1e-12), 0.0, 1.0)
            d0sq = jnp.sum((oa - s0[..., None] * ba) ** 2, axis=-1)
            c_g = jnp.where(
                d0sq > radius[None, c0:c1] ** 2, c_g, 0.0
            )
            c_best = jnp.max(c_g, axis=1)
            c_arg = jnp.argmin(-c_g, axis=1) + c0
            better = c_best > cov
            cov = jnp.where(better, c_best, cov)
            cov_rgb = jnp.where(
                better[:, None], geom_rgb_all[c_arg], cov_rgb
            )
        return cov, cov_rgb

    def _shade_cone(self, model, t, geom_idx, normal, origins, dirs,
                    gpos, gquat, capsule_mask):
        """Coverage-blended radiance: nearest-geom color mixed with the
        ground/sky background by the geom's analytic cone coverage."""
        from flygym_tpu.render.raycast import _ray_heightfield, _ray_plane

        if model.has_hfield:
            t_bg, n_bg = _ray_heightfield(model, origins, dirs)
        else:
            t_bg, _ = _ray_plane(origins, dirs, 0.0)
            n_bg = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], t.dtype), dirs.shape
            )
        bg_hit = t_bg < 1e30
        bg_p = origins + jnp.where(bg_hit, t_bg, 0.0)[:, None] * dirs
        checker = (jnp.floor(bg_p[:, 0]) + jnp.floor(bg_p[:, 1])) % 2.0
        ground_rgb = jnp.where(
            checker[:, None] > 0.5,
            jnp.full((3,), 0.4, t.dtype),
            jnp.full((3,), 0.3, t.dtype),
        )
        sky_rgb = jnp.asarray([0.65, 0.75, 0.9], t.dtype)
        lam_bg = jnp.abs(jnp.sum(n_bg * (-dirs), axis=-1))
        bg_shade = jnp.where(bg_hit, 0.5 + 0.5 * lam_bg, 1.0)
        bg = (
            jnp.where(bg_hit[:, None], ground_rgb, sky_rgb)
            * bg_shade[:, None]
        )

        cov, cov_rgb = self._cone_coverage(
            model, gpos, gquat, origins, dirs, capsule_mask, t_bg
        )
        # Geom part: the nearest-HIT shading where the ray actually hits
        # (lambert at the hit point); the silhouette shade (lambert -> 0,
        # factor 0.5) for pure near-misses.
        is_geom = geom_idx >= 0
        geom_rgb = model.geom_rgba[jnp.maximum(geom_idx, 0), :3]
        lambert = jnp.abs(jnp.sum(normal * (-dirs), axis=-1))
        hit_shaded = geom_rgb * (0.5 + 0.5 * lambert)[:, None]
        geom_part = jnp.where(is_geom[:, None], hit_shaded, 0.5 * cov_rgb)
        c = cov[:, None]
        return jnp.clip(c * geom_part + (1.0 - c) * bg, 0.0, 1.0)

    @staticmethod
    def _shade(model, t, geom_idx, normal, origins, dirs):
        """Simple radiance: geom albedo / checkered ground / bright sky."""
        hit_p = origins + t[:, None] * dirs
        geom_rgb = model.geom_rgba[jnp.maximum(geom_idx, 0), :3]
        checker = (jnp.floor(hit_p[:, 0]) + jnp.floor(hit_p[:, 1])) % 2.0
        ground_rgb = jnp.where(
            checker[:, None] > 0.5,
            jnp.full((3,), 0.4, t.dtype),
            jnp.full((3,), 0.3, t.dtype),
        )
        sky_rgb = jnp.asarray([0.65, 0.75, 0.9], t.dtype)
        base = jnp.where(
            (geom_idx >= 0)[:, None],
            geom_rgb,
            jnp.where((geom_idx == -1)[:, None], ground_rgb, sky_rgb),
        )
        lambert = jnp.abs(jnp.sum(normal * (-dirs), axis=-1))
        shade = jnp.where(geom_idx == -2, 1.0, 0.5 + 0.5 * lambert)
        return jnp.clip(base * shade[:, None], 0.0, 1.0)
