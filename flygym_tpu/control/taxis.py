"""Visual taxis: retina-driven object following (north-star config 4).

Implements the NeuroMechFly visual-taxis closed loop: the ommatidia retina
renders the scene per control step, a simple visual feature (per-eye
brightness of a dark object against the bright background) is turned into an
asymmetric descending drive, and the CPG network converts the drive asymmetry
into a turn (ipsilateral legs slow down / shorten strides) — all pure JAX, so
the entire perception-action loop scans on device.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from flygym_tpu.control.cpg import CPGController, CPGState

__all__ = ["VisualTaxisController", "object_azimuth_drive"]

# Leg order lf, lm, lh, rf, rm, rh → left mask.
_LEFT_LEGS = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])


def object_azimuth_drive(
    vision: jnp.ndarray, gain: float = 8.0, base_drive: float = 1.0
):
    """Per-leg drive vector steering toward the darker visual hemifield.

    Args:
        vision: (2, n_ommatidia, 2) retina intensities (eye 0 = left).
        gain: Steering gain.
        base_drive: Forward drive when the stimulus is centered.

    Returns:
        drive: (6,) per-leg drive; turning toward the object slows the
        ipsilateral legs (differential-drive steering).
    """
    # A dark object lowers the mean intensity of the eye facing it.
    left_dark = 1.0 - jnp.mean(vision[0])
    right_dark = 1.0 - jnp.mean(vision[1])
    # Positive when the object is on the left → slow the left legs.
    turn = gain * (left_dark - right_dark)
    left_drive = jnp.clip(base_drive - turn, 0.2, 1.8)
    right_drive = jnp.clip(base_drive + turn, 0.2, 1.8)
    return _LEFT_LEGS * left_drive + (1.0 - _LEFT_LEGS) * right_drive


@dataclass
class VisualTaxisController:
    """CPG walking modulated by retina input.

    Args:
        cpg: the rhythmic pattern generator.
        retina: a :class:`~flygym_tpu.vision.Retina` for the tracked fly.
        gain: steering gain (drive asymmetry per unit brightness difference).
    """

    cpg: CPGController
    retina: object
    gain: float = 8.0

    def init_state(self, seed: int = 0) -> CPGState:
        return self.cpg.init_state(seed)

    def __call__(self, cpg_state: CPGState, model, sim_state):
        """One control step: render retina → drive → CPG targets.

        Returns (new_cpg_state, joint_targets (42,), adhesion (6,),
        vision (2, n_ommatidia, 2)).
        """
        vision = self.retina.render(model, sim_state)
        drive = object_azimuth_drive(vision, self.gain)
        new_state, targets, adhesion = self.cpg(cpg_state, drive=drive)
        return new_state, targets, adhesion, vision
