"""Olfaction: odor intensity fields sampled at antennae and maxillary palps.

The reference v2 repo does not ship olfaction (moved to flygym-gymnasium,
SURVEY.md §0); this implements the NeuroMechFly concept (odor intensity
sampled at the antennae / maxillary palps, ``docs/index.md:31``) as a pure-JAX
field evaluation that fuses into the jitted step.

Semantics follow flygym 1.x: odor sources have a position and a per-dimension
peak intensity; the default diffusion model is inverse-square
(``intensity = peak / r^2``), and intensities are read at four sensor
locations (left/right antenna, left/right maxillary palp), giving an
(n_dimensions, 4) observation.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from flygym_tpu.engine.maths import quat_rotate
from flygym_tpu.engine.model import PhysicsModel, State

__all__ = ["OdorField"]


@dataclass(frozen=True)
class OdorField:
    """A set of static odor sources and fly-mounted odor sensors.

    Args:
        source_pos: (n_sources, 3) positions in mm.
        peak_intensity: (n_sources, n_dim) per-dimension peak intensities.
        sensor_bodies: (4,) body indices: l/r antenna, l/r palp.
        sensor_offsets: (4, 3) sensor offsets in their body frames.
        diffusion: "inverse_square" or "gaussian".
        gaussian_scale: length scale (mm) for the gaussian model.
    """

    source_pos: np.ndarray
    peak_intensity: np.ndarray
    sensor_bodies: np.ndarray
    sensor_offsets: np.ndarray
    diffusion: str = "inverse_square"
    gaussian_scale: float = 10.0

    @classmethod
    def for_fly(
        cls,
        world,
        fly_name: str,
        source_pos,
        peak_intensity,
        *,
        diffusion: str = "inverse_square",
        gaussian_scale: float = 10.0,
    ) -> "OdorField":
        """Build with the canonical 4 sensors: antennae (funiculus segments)
        and maxillary palps (offsets on the rostrum)."""
        ids = world.compiled.body_name2id
        ns = fly_name
        sensor_bodies = np.array(
            [
                ids[f"{ns}/l_funiculus"],
                ids[f"{ns}/r_funiculus"],
                ids[f"{ns}/c_rostrum"],
                ids[f"{ns}/c_rostrum"],
            ],
            np.int32,
        )
        sensor_offsets = np.array(
            [
                [0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0],
                [0.05, 0.1, -0.1],  # left maxillary palp, rostrum frame
                [0.05, -0.1, -0.1],  # right maxillary palp
            ],
            np.float32,
        )
        source_pos = np.atleast_2d(np.asarray(source_pos, np.float32))
        peak_intensity = np.atleast_2d(np.asarray(peak_intensity, np.float32))
        if peak_intensity.shape[0] != source_pos.shape[0]:
            raise ValueError(
                "peak_intensity must have one row per odor source "
                f"({source_pos.shape[0]}), got {peak_intensity.shape[0]}"
            )
        return cls(
            source_pos=source_pos,
            peak_intensity=peak_intensity,
            sensor_bodies=sensor_bodies,
            sensor_offsets=sensor_offsets,
            diffusion=diffusion,
            gaussian_scale=gaussian_scale,
        )

    @property
    def n_dimensions(self) -> int:
        return self.peak_intensity.shape[1]

    def sensor_positions(self, state: State) -> jnp.ndarray:
        """(4, 3) world positions of the odor sensors."""
        bodies = jnp.asarray(self.sensor_bodies)
        offsets = jnp.asarray(self.sensor_offsets)
        return state.xpos[bodies] + quat_rotate(state.xquat[bodies], offsets)

    def sample(self, model: PhysicsModel, state: State) -> jnp.ndarray:
        """Odor intensities at the sensors: (n_dimensions, 4). Pure jnp."""
        pos = self.sensor_positions(state)  # (4, 3)
        src = jnp.asarray(self.source_pos)  # (s, 3)
        peak = jnp.asarray(self.peak_intensity)  # (s, d)
        d2 = jnp.sum((pos[None, :, :] - src[:, None, :]) ** 2, axis=-1)  # (s, 4)
        if self.diffusion == "inverse_square":
            atten = 1.0 / jnp.maximum(d2, 1e-4)
        elif self.diffusion == "gaussian":
            atten = jnp.exp(-d2 / (2.0 * self.gaussian_scale**2))
        else:
            raise ValueError(f"Unknown diffusion model: {self.diffusion}")
        # (s, d) x (s, 4) -> (d, 4)
        return jnp.einsum("sd,sf->df", peak, atten)
