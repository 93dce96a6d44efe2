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
        if data_path is None:
            data_path = DEFAULT_CLIP_PATH
        data = np.load(data_path, allow_pickle=True)
        self.rawpred_egoxyz = data["rawpred_egoxyz"]
        self.fwdkin_egoxyz = data["fwdkin_egoxyz"]
        self.joint_angles = data["joint_angles"].copy()
        self.keypoints = [tuple(x) for x in data["keypoints"].tolist()]
        self.legs = data["legs"].tolist()
        self.dofs_per_leg = [tuple(x) for x in data["dofs_per_leg"].tolist()]
        self.experiment_trial = data["experiment_trial"].item()
        self.framerange_in_raw_recording = data["framerange_in_raw_recording"].tolist()
        self.data_fps = data["data_fps"].item()

        if angles_global2anatomical:
            self._flip_right_roll_yaw()

    def _flip_right_roll_yaw(self) -> None:
        right_legs = [i for i, leg in enumerate(self.legs) if leg.startswith("r")]
        mirror_dofs = [
            i
            for i, (_, _, axis) in enumerate(self.dofs_per_leg)
            if axis in ("roll", "yaw")
        ]
        self.joint_angles[np.ix_(range(len(self.joint_angles)), right_legs, mirror_dofs)] *= -1

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

        window = int(sgfilter_window_sec * self.data_fps)
        window += 1 - (window % 2)  # must be odd
        smoothed = savgol_filter(
            self.joint_angles,
            window_length=window,
            polyorder=sgfilter_polyorder,
            axis=0,
        )

        n_frames = self.joint_angles.shape[0]
        duration = n_frames / self.data_fps
        src_t = np.arange(n_frames) / self.data_fps
        out_t = np.arange(0, duration, output_timestep)
        interp = interp1d(
            src_t,
            smoothed,
            kind="cubic",
            axis=0,
            bounds_error=False,
            fill_value=(smoothed[0], smoothed[-1]),
        )
        resampled = interp(out_t)

        pairs = np.array(
            [
                (
                    self.legs.index(dof.child.pos),
                    self.dofs_per_leg.index(
                        (dof.parent.link, dof.child.link, dof.axis.value)
                    ),
                )
                for dof in output_dof_order
            ],
            dtype=np.int32,
        )
        return resampled[:, pairs[:, 0], pairs[:, 1]]
