"""Experimentally recorded fly walking (Spotlight motion capture).

Parity reference: flygym_demo ``spotlight_data/preprocessing.py``. The bundled
clip (joint angles for all six legs at 7 DoFs/leg, 330 Hz) comes from the
NeuroMechFly v2 reference assets (Apache-2.0).
"""

from pathlib import Path

import numpy as np

from flygym_tpu import assets_dir
from flygym_tpu.anatomy import JointDOF

__all__ = ["MotionSnippet"]

DEFAULT_CLIP_PATH = assets_dir / "demo/spotlight_behavior_clip.npz"

# NPZ field -> (attribute, decoder). The names are the recording format's
# schema (shared with the upstream clip files).
_CLIP_FIELDS = {
    "rawpred_egoxyz": ("rawpred_egoxyz", np.asarray),
    "fwdkin_egoxyz": ("fwdkin_egoxyz", np.asarray),
    "joint_angles": ("joint_angles", lambda a: np.array(a, copy=True)),
    "keypoints": ("keypoints", lambda a: [tuple(x) for x in a.tolist()]),
    "legs": ("legs", lambda a: a.tolist()),
    "dofs_per_leg": ("dofs_per_leg", lambda a: [tuple(x) for x in a.tolist()]),
    "experiment_trial": ("experiment_trial", lambda a: a.item()),
    "framerange_in_raw_recording": (
        "framerange_in_raw_recording",
        lambda a: a.tolist(),
    ),
    "data_fps": ("data_fps", lambda a: a.item()),
}


class MotionSnippet:
    """A short clip of experimentally recorded fly leg kinematics.

    Args:
        data_path: NPZ recording; None loads the bundled example clip.
        angles_global2anatomical: Flip right-leg roll/yaw signs to convert
            from the global (SeqIKPy) convention to the anatomical convention
            where left/right angles are symmetric
            (reference ``preprocessing.py:61-78``).

    Attributes:
        joint_angles: (n_steps, 6 legs, 7 DoFs/leg) radians.
        fwdkin_egoxyz / rawpred_egoxyz: keypoint positions in the ego frame.
        legs / dofs_per_leg / keypoints: axis labels.
        data_fps: Recording frame rate in Hz.
    """

    def __init__(
        self,
        data_path: Path | None = None,
        *,
        angles_global2anatomical: bool = True,
    ) -> None:
        npz = np.load(data_path or DEFAULT_CLIP_PATH, allow_pickle=True)
        for field, (attr, decode) in _CLIP_FIELDS.items():
            setattr(self, attr, decode(npz[field]))
        if angles_global2anatomical:
            self._flip_right_roll_yaw()

    def _flip_right_roll_yaw(self) -> None:
        on_right = np.array([leg[0] == "r" for leg in self.legs])
        is_mirror_axis = np.array(
            [axis in ("roll", "yaw") for _p, _c, axis in self.dofs_per_leg]
        )
        sign = np.where(on_right[:, None] & is_mirror_axis[None, :], -1.0, 1.0)
        self.joint_angles *= sign[None, :, :]

    def get_joint_angles(
        self,
        output_timestep: float,
        output_dof_order: list[JointDOF],
        *,
        sgfilter_window_sec: float = 0.03,
        sgfilter_polyorder: int = 3,
    ) -> np.ndarray:
        """Smooth, resample, and reorder the clip for simulation replay.

        Savitzky-Golay smoothing → cubic interpolation onto the simulation
        time grid → reorder to the simulator's actuated-DoF order
        (reference ``preprocessing.py:80-142``).

        Returns:
            (n_output_steps, len(output_dof_order)) radians.
        """
        from scipy.interpolate import interp1d
        from scipy.signal import savgol_filter

        # Odd smoothing window spanning sgfilter_window_sec of recording.
        window = int(sgfilter_window_sec * self.data_fps) | 1
        smoothed = savgol_filter(
            self.joint_angles, window, sgfilter_polyorder, axis=0
        )

        src_t = np.arange(len(smoothed)) / self.data_fps
        out_t = np.arange(0, len(smoothed) / self.data_fps, output_timestep)
        spline = interp1d(
            src_t,
            smoothed,
            kind="cubic",
            axis=0,
            bounds_error=False,
            fill_value=(smoothed[0], smoothed[-1]),
        )
        resampled = spline(out_t)

        # (leg index, DoF-within-leg index) for each requested sim DoF.
        leg_of = [self.legs.index(d.child.pos) for d in output_dof_order]
        slot_of = [
            self.dofs_per_leg.index((d.parent.link, d.child.link, d.axis.value))
            for d in output_dof_order
        ]
        return resampled[:, leg_of, slot_of]
