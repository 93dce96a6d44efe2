"""Central pattern generator (CPG) locomotor control.

The reference v2 repo does not ship controllers (moved to flygym-gymnasium,
SURVEY.md §0); this implements the NeuroMechFly CPG concept ("CPG-driven
tripod-gait walking with tarsal leg adhesion", BASELINE.json config 2) as
pure-JAX dynamics that scan on device with the physics.

Architecture (NeuroMechFly 2022-style):
- Six coupled phase oscillators, one per leg, with amplitude dynamics:
      dθi/dt = 2π νi + Σj rj wij sin(θj − θi − φij)
      d²ri/dt² = α (α/4 (Ri − ri) − dri/dt)
- Tripod gait coupling: {lf, lh, rm} in phase, antiphase to {lm, rf, rh}.
- Preprogrammed steps: per-leg joint-angle trajectories over one stride,
  extracted from the recorded Spotlight walking clip and indexed by oscillator
  phase; amplitude scales the excursion about the mid-stance posture.
- Leg adhesion follows the stance/swing flag of the step table (adhesion on in
  stance, off in swing — the reference's on/off-per-stance/swing semantics).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tripod_phase_biases",
    "extract_preprogrammed_steps",
    "CPGNetwork",
    "CPGState",
    "CPGController",
]

# Canonical leg order (anatomy.LEGS): lf, lm, lh, rf, rm, rh.
# Group 0 = {lf, lh, rm}, group 1 = {lm, rf, rh}.
_TRIPOD_GROUP = np.array([0, 1, 0, 1, 0, 1])


def tripod_phase_biases() -> np.ndarray:
    """(6, 6) phase bias matrix: 0 within a tripod group, π across groups."""
    same = _TRIPOD_GROUP[:, None] == _TRIPOD_GROUP[None, :]
    return np.where(same, 0.0, np.pi)


def extract_preprogrammed_steps(
    snippet,
    dof_order,
    *,
    n_bins: int = 64,
    stride_freq_hz: float | None = None,
):
    """Build per-leg phase-indexed step tables from the recorded clip.

    The stride frequency is estimated from the autocorrelation of the
    front-leg pitch signal; each leg's joint trajectories are folded over the
    stride and averaged per phase bin. Stance/swing is labeled from the leg
    tip height (claw keypoint z in the ego frame): swing = tip above its
    median height.

    Args:
        snippet: a MotionSnippet.
        dof_order: the simulator's actuated DoF order (42 leg DoFs).

    Returns:
        dict with:
          tables: (6 legs, n_bins, 7 dofs/leg) angles (radians)
          stance: (6, n_bins) float stance flags
          freq_hz: estimated stride frequency
          dof_map: (42, 2) int (leg_index, dof_index) for each entry of
            dof_order
          neutral: (6, 7) per-leg mid-stance posture (circular mean)
    """
    angles = snippet.joint_angles  # (T, 6, 7)
    fps = snippet.data_fps
    T = angles.shape[0]

    if stride_freq_hz is None:
        # Autocorrelation of the mean-removed front-leg femur pitch.
        sig = angles[:, 0, :].mean(axis=1)
        sig = sig - sig.mean()
        ac = np.correlate(sig, sig, mode="full")[T - 1 :]
        # First local max after the first zero crossing.
        lag_min = int(fps / 30)  # cap at 30 Hz strides
        lag_max = int(fps / 2)  # at least 2 Hz
        lag = lag_min + int(np.argmax(ac[lag_min:lag_max]))
        stride_freq_hz = fps / lag

    phase = (np.arange(T) / fps * stride_freq_hz * 2 * np.pi) % (2 * np.pi)
    bins = np.minimum((phase / (2 * np.pi) * n_bins).astype(int), n_bins - 1)

    tables = np.zeros((6, n_bins, 7), np.float32)
    counts = np.zeros(n_bins, np.int64)
    np.add.at(counts, bins, 1)
    for b in range(n_bins):
        mask = bins == b
        if mask.any():
            tables[:, b, :] = angles[mask].mean(axis=0).astype(np.float32)
    # Fill empty bins by nearest neighbor.
    for b in range(n_bins):
        if counts[b] == 0:
            nearest = np.argmin(
                np.minimum(np.abs(np.arange(n_bins) - b), counts.size)
                + 1e9 * (counts == 0)
            )
            tables[:, b, :] = tables[:, nearest, :]

    # Stance labeling from leg-tip keypoint height (one tarsus5 keypoint per
    # leg, ordered like snippet.legs).
    stance = np.zeros((6, n_bins), np.float32)
    tip_idx = []
    for leg in snippet.legs:
        matches = [
            i
            for i, kp in enumerate(snippet.keypoints)
            if isinstance(kp, tuple)
            and len(kp) >= 2
            and kp[0] == leg
            and any("tarsus5" in str(p) for p in kp[1:])
        ]
        if matches:
            tip_idx.append(matches[0])
    if len(tip_idx) == 6:
        tip_z = snippet.fwdkin_egoxyz[:, tip_idx, 2]  # (T, 6)
        thresh = np.median(tip_z, axis=0, keepdims=True)
        grounded = (tip_z <= thresh + 0.05 * np.abs(thresh)).astype(np.float32)
        for b in range(n_bins):
            mask = bins == b
            if mask.any():
                stance[:, b] = grounded[mask].mean(axis=0)
        stance = (stance > 0.5).astype(np.float32)
    else:
        # Fallback: stance during the half-cycle where the femur-tibia flexes.
        for leg in range(6):
            sig = tables[leg, :, 2]
            stance[leg] = (sig < np.median(sig)).astype(np.float32)

    dof_map = np.array(
        [
            (
                snippet.legs.index(dof.child.pos),
                snippet.dofs_per_leg.index(
                    (dof.parent.link, dof.child.link, dof.axis.value)
                ),
            )
            for dof in dof_order
        ],
        np.int32,
    )
    neutral = tables.mean(axis=1)
    return {
        "tables": tables,
        "stance": stance,
        "freq_hz": float(stride_freq_hz),
        "dof_map": dof_map,
        "neutral": neutral.astype(np.float32),
    }


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CPGState:
    """Oscillator network state (all (6,) float32)."""

    phase: jnp.ndarray
    amplitude: jnp.ndarray
    damplitude: jnp.ndarray

    @classmethod
    def init(cls, seed: int = 0) -> "CPGState":
        key = jax.random.PRNGKey(seed)
        return cls(
            phase=jax.random.uniform(key, (6,), maxval=2 * jnp.pi),
            amplitude=jnp.zeros(6),
            damplitude=jnp.zeros(6),
        )


@dataclass(frozen=True)
class CPGNetwork:
    """Coupled-oscillator parameters (host-side static config)."""

    intrinsic_freq_hz: float = 12.0
    coupling_weight: float = 10.0
    convergence_rate: float = 20.0
    target_amplitude: float = 1.0
    phase_biases: np.ndarray = None  # (6, 6), default tripod

    def __post_init__(self):
        if self.phase_biases is None:
            object.__setattr__(self, "phase_biases", tripod_phase_biases())

    def step(self, state: CPGState, dt: float, drive: float = 1.0) -> CPGState:
        """One Euler step of the oscillator dynamics (pure jnp).

        ``drive`` scales both frequency and target amplitude (a descending
        drive signal, the brain→VNC interface's simplest form).
        """
        phi = jnp.asarray(self.phase_biases, jnp.float32)
        theta = state.phase
        r = state.amplitude
        coupling = jnp.sum(
            r[None, :]
            * self.coupling_weight
            * jnp.sin(theta[None, :] - theta[:, None] - phi),
            axis=1,
        )
        dtheta = 2 * jnp.pi * self.intrinsic_freq_hz * drive + coupling
        a = self.convergence_rate
        R = self.target_amplitude * drive
        ddr = a * (a / 4.0 * (R - r) - state.damplitude)
        return CPGState(
            phase=(theta + dt * dtheta) % (2 * jnp.pi),
            amplitude=r + dt * state.damplitude,
            damplitude=state.damplitude + dt * ddr,
        )


class CPGController:
    """CPG network + preprogrammed step tables → joint targets + adhesion.

    Produces a pure-JAX per-step function so whole walking episodes scan on
    device (controller fused with physics, the north-star "brain-VNC
    controller as a pure-JAX callback").
    """

    def __init__(
        self,
        steps_data: dict,
        network: CPGNetwork | None = None,
        *,
        timestep: float = 1e-4,
    ):
        self.network = network or CPGNetwork(
            intrinsic_freq_hz=steps_data["freq_hz"]
        )
        self.timestep = timestep
        self.tables = jnp.asarray(steps_data["tables"])  # (6, B, 7)
        self.stance = jnp.asarray(steps_data["stance"])  # (6, B)
        self.neutral = jnp.asarray(steps_data["neutral"])  # (6, 7)
        self.dof_map = jnp.asarray(steps_data["dof_map"])  # (42, 2)
        self.n_bins = self.tables.shape[1]

    def init_state(self, seed: int = 0) -> CPGState:
        return CPGState.init(seed)

    def __call__(self, state: CPGState, drive: float = 1.0):
        """Advance the CPG one physics timestep.

        Returns:
            (new_state, joint_targets (42,), adhesion_ctrl (6,)).
        """
        new = self.network.step(state, self.timestep, drive)
        # Phase → step-table lookup with linear interpolation.
        pos = new.phase / (2 * jnp.pi) * self.n_bins
        b0 = jnp.floor(pos).astype(jnp.int32) % self.n_bins
        b1 = (b0 + 1) % self.n_bins
        w = (pos - jnp.floor(pos))[:, None]
        legs = jnp.arange(6)
        ang = (1 - w) * self.tables[legs, b0] + w * self.tables[legs, b1]
        # Amplitude scales excursion about the mid-stance posture.
        ang = self.neutral + new.amplitude[:, None] * (ang - self.neutral)
        targets = ang[self.dof_map[:, 0], self.dof_map[:, 1]]
        stance = (1 - w[:, 0]) * self.stance[legs, b0] + w[:, 0] * self.stance[
            legs, b1
        ]
        adhesion = jnp.where(stance > 0.5, 100.0, 1.0)
        return new, targets, adhesion
