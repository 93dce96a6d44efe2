"""The headline benchmark: batched kinematic replay of recorded fly walking.

Parity reference: flygym_demo ``benchmark/time_gpu_simulation.py``. Same
protocol — position-actuator replay of the Spotlight clip with leg adhesion on
flat ground, dt = 1e-4 s, world-count sweep, metrics
``steps_per_second = sim_steps * n_worlds / walltime`` and
``realtime_factor = steps_per_second * dt`` (``time_gpu_simulation.py:195-197``).

Where the reference replays a captured CUDA graph per step
(``time_gpu_simulation.py:137-153``), the TPU build runs the whole episode —
per-step target-angle table lookup + step — as a single jitted ``lax.scan``,
so there is zero host involvement inside the episode.
"""

import dataclasses
from functools import partial
from time import perf_counter_ns

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.anatomy import (
    ActuatedDOFPreset,
    AxisOrder,
    JointDOF,
    JointPreset,
    Skeleton,
)
from flygym_tpu.batch import BatchSimulation
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    GeomFittingOption,
    KinematicPosePreset,
)
from flygym_tpu.demo.spotlight import MotionSnippet
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.utils.math import Rotation3D

__all__ = ["make_model", "ReplayTargetData", "run_simulation", "run_benchmark"]


def make_model(
    joints_preset=JointPreset.LEGS_ONLY,
    actuated_dofs_preset=ActuatedDOFPreset.LEGS_ACTIVE_ONLY,
    actuator_type=ActuatorType.POSITION,
    position_gain=50.0,
    neutral_pose=KinematicPosePreset.NEUTRAL,
    spawn_position=(0, 0, 0.8),  # xyz in mm
    spawn_rotation=Rotation3D("quat", (1, 0, 0, 0)),
    simplify_geom=False,
    trim_contacts=False,
):
    """The canonical benchmark fly + world (reference ``time_gpu_simulation.py:21-64``).

    Args:
        trim_contacts: single-world latency specialization — restrict the
            ground-candidate table to the distal tarsal links (tarsus3-5,
            36 candidates vs the default preset's 110) and skip the
            ground-contact sensors. On the flat-ground walking replay the
            trajectory is numerically identical to the full preset (only
            tarsal rows ever activate; measured max COM delta < 1e-3 mm
            over 2,000 steps) while the mega-kernel's serial op chain
            drops 279k -> 154k lane ops (~45%), which is the single-fly
            ceiling lever named in docs/benchmarks.md. Keep False (the
            reference-parity default) for anything other than flat-ground
            locomotion — on rugged terrain or in collisions non-tarsal
            segments DO make contact.
    """
    geom_fitting = (
        GeomFittingOption.ALL_TO_CAPSULES
        if simplify_geom
        else GeomFittingOption.UNMODIFIED
    )
    fly = Fly(geom_fitting_option=geom_fitting)
    axis_order = AxisOrder.YAW_PITCH_ROLL

    skeleton = Skeleton(axis_order=axis_order, joint_preset=joints_preset)
    fly.add_joints(skeleton, neutral_pose=neutral_pose)

    actuated = fly.skeleton.get_actuated_dofs_from_preset(actuated_dofs_preset)
    fly.add_actuators(
        actuated,
        actuator_type=actuator_type,
        kp=position_gain,
        neutral_input=neutral_pose,
    )
    fly.add_leg_adhesion()
    fly.colorize()
    cam = fly.add_tracking_camera()

    world = FlatGroundWorld()
    if trim_contacts:
        from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment

        tips = [
            BodySegment(n)
            for n in ALL_SEGMENT_NAMES
            if n.split("_", 1)[-1] in ("tarsus3", "tarsus4", "tarsus5")
        ]
        world.add_fly(
            fly,
            spawn_position,
            spawn_rotation,
            bodysegs_with_ground_contact=tips,
            add_ground_contact_sensors=False,
        )
    else:
        world.add_fly(fly, spawn_position, spawn_rotation)
    return fly, world, cam


class ReplayTargetData:
    """Partition the Spotlight clip across worlds
    (reference ``time_gpu_simulation.py:67-86``)."""

    def __init__(self, sim_timestep: float, output_dof_order: list[JointDOF]):
        self.snippet = MotionSnippet()
        self.dof_angles = self.snippet.get_joint_angles(
            sim_timestep, output_dof_order
        )
        self.n_total_steps, self.n_dofs = self.dof_angles.shape

    def make_target_angles_all_worlds(
        self, n_worlds: int, sim_steps: int
    ) -> np.ndarray:
        """(n_worlds, sim_steps, n_dofs): world w replays partition w mod P."""
        out = np.zeros((n_worlds, sim_steps, self.n_dofs), np.float32)
        n_partitions = max(self.n_total_steps // sim_steps, 1)
        for world in range(n_worlds):
            start = (world % n_partitions) * sim_steps
            chunk = self.dof_angles[start : start + sim_steps]
            out[world, : len(chunk)] = chunk
        return out


@partial(
    jax.jit,
    static_argnames=("n_steps", "batched_step", "kstep_fn"),
    donate_argnums=(1,),
)
def _replay_episode(model, state, targets, act_ids, n_steps: int,
                    batched_step=None, kstep_fn=None):
    """Whole replay episode on device: per-step table lookup + batched step
    (the Pallas mega-kernel when available, vmapped XLA step otherwise).

    With ``kstep_fn`` (the K-step fused kernel, ops/megastep.py
    ``make_megastep(model, k_steps=K)``), the scan runs n_steps/K kernel
    launches, each fusing K physics steps in-kernel with the per-step
    target slice selected from the replay table."""
    if kstep_fn is not None and n_steps % kstep_fn.k_steps == 0:
        K = kstep_fn.k_steps
        n_outer = n_steps // K

        def body_k(carry, _):
            i, st = carry
            tgt = jax.lax.dynamic_slice_in_dim(targets, i, K, axis=1)
            ctrl_seq = jnp.broadcast_to(
                st.ctrl[None], (K,) + st.ctrl.shape
            )
            ctrl_seq = ctrl_seq.at[:, :, act_ids].set(tgt.transpose(1, 0, 2))
            st, _traj = kstep_fn(st, ctrl_seq)
            return (i + K, st), None

        (_, final), _ = jax.lax.scan(
            body_k, (jnp.zeros((), jnp.int32), state), None, length=n_outer
        )
        return final

    if batched_step is None:
        vstep = jax.vmap(engine_step, in_axes=(None, 0))
        batched_step = lambda s: vstep(model, s)

    def body(carry, t):
        i, st = carry
        ctrl = st.ctrl.at[:, act_ids].set(targets[:, i])
        st = batched_step(dataclasses.replace(st, ctrl=ctrl))
        return (i + 1, st), None

    (_, final), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), state), None, length=n_steps
    )
    return final


def run_simulation(
    replay_data: np.ndarray,
    enable_rendering: bool,
    timestep: float,
    simplify_geom: bool,
    warmup_steps: int = 500,
) -> float:
    """Time one replay run; returns walltime in seconds
    (reference ``time_gpu_simulation.py:108-156``)."""
    n_worlds, n_steps, n_dofs = replay_data.shape

    fly, world, cam = make_model(simplify_geom=simplify_geom)
    sim = BatchSimulation(world, n_worlds)
    assert sim.model.timestep == timestep

    if enable_rendering:
        sim.set_renderer(cam, playback_speed=0.2, output_fps=25)

    sim.set_leg_adhesion_states(
        fly.name, np.ones((n_worlds, 6), dtype=np.float32)
    )
    # Warmup: settle on the ground (on device, scanned).
    sim.rollout(None, warmup_steps)

    act_ids = jnp.asarray(
        sim._act_ids_by_type[ActuatorType.POSITION][fly.name]
    )
    targets = jnp.asarray(replay_data)

    # Compile outside the timed region (the reference's graph capture is also
    # outside its timed loop). NOTE: block_until_ready does not reliably block
    # on the axon TPU backend; a host fetch is the only true device sync.
    mega = sim._megastep
    kfn = sim._get_megastep_k(n_steps) if mega is not None else None
    final = _replay_episode(
        sim.model, sim.state, targets, act_ids, n_steps, batched_step=mega,
        kstep_fn=kfn,
    )
    np.asarray(final.qpos[0])
    sim.state = final

    start = perf_counter_ns()
    final = _replay_episode(
        sim.model, sim.state, targets, act_ids, n_steps, batched_step=mega,
        kstep_fn=kfn,
    )
    np.asarray(final.qpos[0])
    walltime_s = (perf_counter_ns() - start) / 1e9
    sim.state = final

    if enable_rendering:
        sim.render_as_needed()
    return walltime_s


def run_benchmark(
    enable_rendering: bool,
    min_worlds: int,
    max_worlds: int,
    factor: int,
    sim_timestep: float,
    sim_steps: int,
    simplify_geom: bool,
):
    """World-count sweep; returns a DataFrame with steps/s and realtime factor
    (reference ``time_gpu_simulation.py:159-198``)."""
    import pandas as pd

    ref_fly, *_ = make_model()
    dof_order = ref_fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
    replay = ReplayTargetData(sim_timestep, dof_order)

    rows = []
    n_worlds = min_worlds
    while True:
        targets = replay.make_target_angles_all_worlds(n_worlds, sim_steps)
        try:
            walltime = run_simulation(
                targets, enable_rendering, sim_timestep, simplify_geom
            )
            print(
                f"Simulated {sim_steps} steps * {n_worlds} worlds "
                f"in {walltime:.2f}s"
            )
        except Exception as e:  # record OOM/compile failures and stop the sweep
            print(f"Simulation failed for n_worlds={n_worlds}: {e}")
            break
        rows.append({"n_worlds": n_worlds, "walltime_s": walltime})
        n_worlds *= factor
        if n_worlds > max_worlds:
            break

    df = pd.DataFrame(rows)
    df["steps_per_second"] = sim_steps * df["n_worlds"] / df["walltime_s"]
    df["realtime_factor"] = df["steps_per_second"] * sim_timestep
    df["simplify_geom"] = simplify_geom
    return df
