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
    ) -> "Retina":
        base = hex_lattice_directions(n_rings)

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

        return cls(
            left_eye_body=left_eye_body,
            right_eye_body=right_eye_body,
            directions_left=dirs_l.astype(np.float32),
            directions_right=dirs_r.astype(np.float32),
            channel_weights=weights.astype(np.float32),
            n_ommatidia=n,
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

    def make_render_batched(self, model: PhysicsModel, *, interpret: bool = False):
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
                return make_retina_kernel(model, self, interpret=interpret)
        return jax.jit(jax.vmap(lambda s: self.render(model, s)))

    def render(self, model: PhysicsModel, state: State) -> jnp.ndarray:
        """Render both eyes: (2, n_ommatidia, 2) intensities in [0, 1].

        Pure jnp — vmappable over worlds and fusable into a scanned episode.
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
            rgb = self._shade(model, t, geom_idx, normal, origins, dirs)
            # Per-ommatidium spectral response: dot(rgb, channel weights).
            w = jnp.asarray(self.channel_weights)  # (n, 2, 3)
            outputs.append(jnp.einsum("nc,nkc->nk", rgb, w))
        return jnp.stack(outputs)

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
