"""Hybrid controller: CPG + rule-based corrections from mechanosensory feedback.

Implements the NeuroMechFly "hybrid controller on rugged terrain" concept
(BASELINE.json config 3): the CPG produces the rhythmic pattern, while two
sensory reflex rules modulate it per leg, exactly in the spirit of the
NeuroMechFly 2.0 hybrid controller:

- **Retraction rule**: if a leg's tip is markedly lower than the third-lowest
  tip (i.e. the leg is stuck in a hole or dragging), lift it by biasing its
  proximal pitch joints upward.
- **Stumbling rule**: if a leg's ground contact force has a large component
  opposing the heading while the leg should be swinging, retract it backward
  and up to step over the obstacle.

Corrections are leaky accumulators (rate up when the condition holds, decay
otherwise), applied as joint-angle offsets along per-leg correction vectors.
All pure jnp — fuses into scanned episodes.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.control.cpg import CPGController, CPGState

__all__ = ["HybridController", "HybridState"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HybridState:
    cpg: CPGState
    retraction: jnp.ndarray  # (6,) accumulated retraction correction
    stumbling: jnp.ndarray  # (6,)

    @classmethod
    def init(cls, seed: int = 0) -> "HybridState":
        return cls(
            cpg=CPGState.init(seed),
            retraction=jnp.zeros(6),
            stumbling=jnp.zeros(6),
        )


@dataclass
class HybridController:
    """Wraps a CPGController with sensory correction rules.

    Args:
        cpg: the rhythmic pattern generator.
        correction_vectors: (6, 7) per-leg joint-space direction lifting the
            leg (defaults bias coxa/femur pitch up and tibia flexion).
        retraction_rate / stumbling_rate: accumulation rates (1/s).
        decay_rate: correction decay when the trigger clears (1/s).
        retraction_margin: how far (mm) below the third-lowest tip triggers.
        stumble_force_threshold: opposing force (in μN-scale units) trigger.
    """

    cpg: CPGController
    correction_vectors: np.ndarray = None
    retraction_rate: float = 800.0
    stumbling_rate: float = 900.0
    decay_rate: float = 160.0
    retraction_margin: float = 0.05
    stumble_force_threshold: float = 1.0
    max_correction: float = 1.0

    def __post_init__(self):
        if self.correction_vectors is None:
            # (coxa yaw/pitch/roll, trochanterfemur pitch/roll, tibia pitch,
            #  tarsus pitch) — lift: femur up, tibia flex.
            vec = np.zeros((6, 7), np.float32)
            vec[:, 3] = -0.8  # trochanterfemur pitch up
            vec[:, 5] = 0.5  # tibia flexion
            self.correction_vectors = vec

    def init_state(self, seed: int = 0) -> HybridState:
        return HybridState.init(seed)

    def __call__(
        self,
        state: HybridState,
        tip_heights: jnp.ndarray,  # (6,) leg tip z (e.g. tarsus5 site z)
        contact_forces: jnp.ndarray,  # (6, 3) per-leg contact force, world
        heading: jnp.ndarray,  # (3,) unit forward vector of the fly
        drive: float = 1.0,
    ):
        """Advance one physics timestep.

        Returns (new_state, joint_targets (42,), adhesion_ctrl (6,)).
        """
        dt = self.cpg.timestep
        cpg_state, targets, adhesion = self.cpg(state.cpg, drive)

        # Retraction: tip far below the third-lowest tip.
        third_lowest = jnp.sort(tip_heights)[2]
        stuck = tip_heights < third_lowest - self.retraction_margin
        retraction = jnp.where(
            stuck,
            state.retraction + self.retraction_rate * dt,
            state.retraction * jnp.exp(-self.decay_rate * dt),
        )
        retraction = jnp.clip(retraction, 0.0, self.max_correction)

        # Stumbling: contact force opposing the heading (pushing backward).
        opposing = -jnp.einsum("lc,c->l", contact_forces, heading)
        stumbled = opposing > self.stumble_force_threshold
        stumbling = jnp.where(
            stumbled,
            state.stumbling + self.stumbling_rate * dt,
            state.stumbling * jnp.exp(-self.decay_rate * dt),
        )
        stumbling = jnp.clip(stumbling, 0.0, self.max_correction)

        # Apply the larger of the two corrections per leg.
        correction = jnp.maximum(retraction, stumbling)  # (6,)
        vec = jnp.asarray(self.correction_vectors)  # (6, 7)
        offsets = correction[:, None] * vec
        dof_map = self.cpg.dof_map
        targets = targets + offsets[dof_map[:, 0], dof_map[:, 1]]

        # Lifting legs release adhesion.
        adhesion = jnp.where(correction > 0.2, 1.0, adhesion)

        new_state = HybridState(
            cpg=cpg_state, retraction=retraction, stumbling=stumbling
        )
        return new_state, targets, adhesion
