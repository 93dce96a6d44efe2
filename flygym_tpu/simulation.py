"""Single-world simulation runtime.

The user-facing API mirrors the reference's ``Simulation`` (flygym
``simulation.py``): construct from a composed world, then ``step()`` /
``reset()`` / ``warmup()``, read state in *fly-defined canonical orders*
(``get_joint_angles``, ``get_body_positions``, ...), and write control inputs
(``set_actuator_inputs``, ``set_leg_adhesion_states``).

Underneath, instead of calling into the MuJoCo C engine per step
(``mj.mj_step``, reference ``simulation.py:76``), the state lives on device as
a :class:`~flygym_tpu.engine.model.State` pytree and ``step()`` invokes one
jitted XLA program. The ID-mapping layer (reference ``simulation.py:311-448``)
becomes precomputed integer gather indices resolved from the compiler's name
maps.

For maximum throughput use :meth:`rollout` (whole episodes under ``lax.scan``,
no per-step host involvement) or :class:`flygym_tpu.batch.BatchSimulation`
(vmapped worlds).
"""

import dataclasses
from time import perf_counter_ns
from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.compose.fly import ActuatorType
from flygym_tpu.compose.world import BaseWorld
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.utils.profiling import print_perf_report

__all__ = ["Simulation"]


class Simulation:
    """Single-world physics simulation on the TPU-native engine.

    Args:
        world: A fully configured world with at least one fly attached.

    Attributes:
        world: The world used to construct this simulation.
        model: Compiled :class:`PhysicsModel` (the ``mj_model`` analog).
        state: Current :class:`State` pytree (the ``mj_data`` analog).
        renderer: The attached renderer, or None.
    """

    def __init__(self, world: BaseWorld) -> None:
        if len(world.fly_lookup) == 0:
            raise ValueError("The world must contain at least one fly.")
        self.renderer = None
        self.world = world
        self.model, self._initial_state = world.compile()
        self.state = self._initial_state
        self._compiled = world.compiled
        self._jit_step = jax.jit(engine_step)

        # On the TPU backend, rollout() routes even a single world through
        # the Pallas mega-step kernel (the kernel pads to its 1024-lane
        # block, so one fly costs the same as 1024): ~10x the in-scan rate
        # of the serial small-kernel path. Opt out with FLYGYM_TPU_MEGASTEP=0.
        # Interpret-mode builds are rejected: rollout puts the kernel inside
        # a jitted scan, which interpret mode must never enter.
        from flygym_tpu.ops.megastep import maybe_make_megastep

        self._megastep = maybe_make_megastep(self.model)
        if self._megastep is not None and getattr(
            self._megastep, "interpret_mode", False
        ):
            self._megastep = None

        self._map_internal_ids()

        self._megastep_k_fn = None

        # Performance profiling counters (reference simulation.py:53-57).
        self._curr_step = 0
        self._frames_rendered = 0
        self._total_physics_time_ns = 0
        self._total_render_time_ns = 0

    # ------------------------------------------------------------------
    # ID mapping: fly-order → compiled-model index arrays
    # ------------------------------------------------------------------

    def _map_internal_ids(self) -> None:
        c = self._compiled
        self._qpos_adrs: dict[str, np.ndarray] = {}
        self._qvel_adrs: dict[str, np.ndarray] = {}
        self._body_ids: dict[str, np.ndarray] = {}
        self._site_ids: dict[str, np.ndarray] = {}
        self._act_ids_by_type: dict[ActuatorType, dict[str, np.ndarray]] = {
            ty: {} for ty in ActuatorType
        }
        self._adh_ids: dict[str, np.ndarray] = {}
        self._sensor_slots: dict[str, np.ndarray] = {}

        for fly_name, fly in self.world.fly_lookup.items():
            ns = fly_name
            self._qpos_adrs[fly_name] = np.array(
                [c.hinge_qadr[f"{ns}/{d.name}"] for d in fly.get_jointdofs_order()],
                np.int32,
            )
            self._qvel_adrs[fly_name] = np.array(
                [c.hinge_vadr[f"{ns}/{d.name}"] for d in fly.get_jointdofs_order()],
                np.int32,
            )
            self._body_ids[fly_name] = np.array(
                [
                    c.body_name2id[f"{ns}/{seg.name}"]
                    for seg in fly.get_bodysegs_order()
                ],
                np.int32,
            )
            self._site_ids[fly_name] = np.array(
                [
                    c.site_name2id[f"{ns}/{joint.name}"]
                    for joint in fly.get_sites_order()
                ],
                np.int32,
            )
            for ty in ActuatorType:
                specs = fly.jointdof_to_specactuator_by_type[ty]
                if specs:
                    self._act_ids_by_type[ty][fly_name] = np.array(
                        [c.actuator_name2id[a.full_identifier] for a in specs.values()],
                        np.int32,
                    )
            if fly.leg_to_adhesionactuator:
                self._adh_ids[fly_name] = np.array(
                    [
                        c.actuator_name2id[
                            fly.leg_to_adhesionactuator[leg].full_identifier
                        ]
                        for leg in fly.get_legs_order()
                    ],
                    np.int32,
                )
            sensors = self.world.legpos_to_groundcontactsensors_by_fly
            if sensors and fly_name in sensors:
                self._sensor_slots[fly_name] = np.array(
                    [
                        c.sensor_name2slot[sensors[fly_name][leg].full_identifier]
                        for leg in fly.get_legs_order()
                        if leg in sensors[fly_name]
                    ],
                    np.int32,
                )

    # ------------------------------------------------------------------
    # Stepping
    # ------------------------------------------------------------------

    def reset(self) -> None:
        """Reset to the neutral keyframe (and reset the renderer)."""
        self.state = self._initial_state
        if self.renderer is not None:
            self.renderer.reset()
        self._curr_step = 0
        self._frames_rendered = 0
        self._total_physics_time_ns = 0
        self._total_render_time_ns = 0

    def step(self) -> None:
        """Advance physics by one timestep."""
        self.state = self._jit_step(self.model, self.state)

    def step_with_profile(self) -> None:
        """Advance one timestep, accumulating wall-clock timing."""
        start = perf_counter_ns()
        self.step()
        jax.block_until_ready(self.state.qpos)
        self._total_physics_time_ns += perf_counter_ns() - start
        self._curr_step += 1

    def warmup(self, duration_s: float = 0.05) -> None:
        """Step briefly so initialization transients settle
        (reference ``simulation.py:298-309``). Runs as one scanned program
        (no per-step dispatch) while holding the current control."""
        n_steps = int(duration_s / self.model.timestep)
        if n_steps > 0:
            self.rollout(None, n_steps, record_trajectory=False)
            # Warmup is excluded from perf-report step counts, like the
            # reference's (which steps without profiling).
            self._curr_step -= n_steps

    def _get_megastep_k(self, n_steps: int):
        """The K-step fused mega-kernel for rollouts, or None.

        K physics steps run inside ONE kernel invocation
        (``make_megastep(model, k_steps=K)``): the K-1 intermediate steps
        skip the HBM round trip, launch overhead, and output sections.
        K comes from FLYGYM_TPU_MEGASTEP_K (default 8; 0/1 disables);
        disabled when n_steps is not a multiple of K or when the
        mega-kernel itself is off. Mesh-sharded runs wrap the K-kernel in
        the same shard_map as the single-step kernel
        (``make_megastep_sharded(..., k_steps=K)``).

        K is VMEM-aware: fusion adds (K-1)*nu ctrl input rows and
        (K-1)*nq trajectory output rows of double-buffered kernel I/O, so
        big models near the VMEM gate get K clamped to the largest
        divisor of n_steps whose K-step estimate still fits (the 204-DoF
        ALL_POSSIBLE kernel OOM'd at K=8 / 4096 worlds with exactly this
        signature: 107.48 MiB spill + 26.4 MiB of K-widened I/O windows).
        """
        import os

        if self._megastep is None or getattr(
            self._megastep, "interpret_mode", False
        ):
            return None
        K = int(os.environ.get("FLYGYM_TPU_MEGASTEP_K", "8"))
        if K <= 1 or n_steps % K != 0:
            return None
        from flygym_tpu.ops.megastep import _VMEM_GATE_MB, _est_kernel_mb

        while K > 1 and (
            n_steps % K != 0
            or _est_kernel_mb(self.model, k_steps=K) > _VMEM_GATE_MB
        ):
            K -= 1
        if K <= 1:
            return None
        if self._megastep_k_fn is None or self._megastep_k_fn.k_steps != K:
            from flygym_tpu.ops.megastep import (
                make_megastep,
                make_megastep_sharded,
            )

            mesh = getattr(self, "_mesh", None)
            if mesh is not None:
                self._megastep_k_fn = make_megastep_sharded(
                    self.model,
                    mesh,
                    self._world_axis,
                    self._initial_batch_state,
                    k_steps=K,
                )
            else:
                self._megastep_k_fn = make_megastep(self.model, k_steps=K)
        return self._megastep_k_fn

    def rollout(
        self,
        ctrl_sequence: np.ndarray | None,
        n_steps: int,
        *,
        record_trajectory: bool = True,
    ):
        """Run ``n_steps`` entirely on device under ``lax.scan``.

        This is the performance path — the TPU analog of the reference's
        CUDA-graph replay (``time_gpu_simulation.py:137-153``).

        Args:
            ctrl_sequence: (n_steps, nu) per-step control in *model order*,
                or None to hold the current ctrl.
        Returns:
            (n_steps, nq) qpos trajectory as a device array.
        """
        from flygym_tpu.engine.step import rollout as engine_rollout

        if ctrl_sequence is None:
            ctrl_sequence = jnp.full(
                (n_steps, self.model.nu), jnp.nan, jnp.float32
            )
        ctrl_sequence = jnp.asarray(ctrl_sequence)
        if ctrl_sequence.shape[0] < n_steps:
            raise ValueError(
                f"ctrl_sequence has {ctrl_sequence.shape[0]} steps, "
                f"need at least n_steps={n_steps}"
            )
        if self._megastep is not None and type(self) is Simulation:
            # Ride the mega-step kernel with a single-world batch (padded
            # to the kernel block internally) — ~10x the serial path. The
            # K-step fused kernel cuts the per-step launch + HBM round
            # trip + output sections further (single-fly latency).
            from flygym_tpu.engine.step import rollout_batched

            bstate = jax.tree.map(lambda x: x[None], self.state)
            final, traj = rollout_batched(
                self.model,
                bstate,
                ctrl_sequence[:n_steps, None, :],
                n_steps,
                batched_step=self._megastep,
                record=record_trajectory,
                kstep_fn=self._get_megastep_k(n_steps),
            )
            self.state = jax.tree.map(lambda x: x[0], final)
            self._curr_step += n_steps
            return traj[:, 0] if record_trajectory else None
        self.state, traj = engine_rollout(
            self.model, self.state, ctrl_sequence[:n_steps], n_steps,
            record=record_trajectory,
        )
        self._curr_step += n_steps
        return traj

    # ------------------------------------------------------------------
    # State readout (fly canonical orders; reference simulation.py:142-256)
    # ------------------------------------------------------------------

    def get_joint_angles(self, fly_name: str) -> np.ndarray:
        """Joint angles (rad), ordered as ``fly.get_jointdofs_order()``."""
        return np.asarray(self.state.qpos[self._qpos_adrs[fly_name]])

    def get_joint_velocities(self, fly_name: str) -> np.ndarray:
        """Joint velocities (rad/s), ordered as ``fly.get_jointdofs_order()``."""
        return np.asarray(self.state.qvel[self._qvel_adrs[fly_name]])

    def get_body_positions(self, fly_name: str) -> np.ndarray:
        """Global body positions (mm), shape (n_bodies, 3)."""
        return np.asarray(self.state.xpos[self._body_ids[fly_name]])

    def get_body_rotations(self, fly_name: str) -> np.ndarray:
        """Global body quaternions (w, x, y, z), shape (n_bodies, 4)."""
        return np.asarray(self.state.xquat[self._body_ids[fly_name]])

    def get_actuator_forces(
        self, fly_name: str, actuator_type: ActuatorType
    ) -> np.ndarray:
        """Scalar actuator forces, ordered as
        ``fly.get_actuated_jointdofs_order(actuator_type)``."""
        actuator_type = ActuatorType(actuator_type)
        ids = self._act_ids_by_type[actuator_type][fly_name]
        return np.asarray(self.state.actuator_force[ids])

    def get_ground_contact_info(self, fly_name: str) -> tuple:
        """Per-leg ground contact info (reference ``simulation.py:210-243``).

        Returns (contact_active (6,), forces (6,3), torques (6,3),
        positions (6,3), normals (6,3), tangents (6,3)); forces/torques in the
        contact frame, the rest in the world frame.
        """
        slots = self._sensor_slots[fly_name]
        data = np.asarray(self.state.contact_sensordata[slots])
        return (
            data[:, 0],
            data[:, 1:4],
            data[:, 4:7],
            data[:, 7:10],
            data[:, 10:13],
            data[:, 13:16],
        )

    def get_site_positions(self, fly_name: str) -> np.ndarray:
        """Global site positions (mm), ordered as ``fly.get_sites_order()``."""
        return np.asarray(self.state.site_xpos[self._site_ids[fly_name]])

    # ------------------------------------------------------------------
    # Control input (reference simulation.py:258-296)
    # ------------------------------------------------------------------

    def set_actuator_inputs(
        self, fly_name: str, actuator_type: ActuatorType, inputs
    ) -> None:
        """Set control for the given actuator type, ordered as
        ``fly.get_actuated_jointdofs_order(actuator_type)``."""
        actuator_type = ActuatorType(actuator_type)
        ids = self._act_ids_by_type[actuator_type][fly_name]
        inputs = jnp.asarray(inputs, jnp.float32)
        if inputs.shape[-1] != len(ids):
            raise ValueError(
                f"Expected {len(ids)} inputs for actuator type "
                f"'{actuator_type.name}', but got {inputs.shape[-1]}"
            )
        self._set_ctrl(ids, inputs)

    def set_leg_adhesion_states(self, fly_name: str, leg_to_adhesion_state) -> None:
        """Set per-leg adhesion control in [1, 100], ordered as
        ``fly.get_legs_order()``."""
        ids = self._adh_ids[fly_name]
        values = jnp.asarray(leg_to_adhesion_state, jnp.float32)
        if values.shape[-1] != len(ids):
            raise ValueError(
                "Unexpected number of adhesion states: "
                f"expected {len(ids)}, got {values.shape[-1]}"
            )
        self._set_ctrl(ids, values)

    def _set_ctrl(self, ids, values) -> None:
        self.state = dataclasses.replace(
            self.state, ctrl=self.state.ctrl.at[ids].set(values)
        )

    # ------------------------------------------------------------------
    # Rendering hooks (renderer implemented in flygym_tpu.render)
    # ------------------------------------------------------------------

    def set_renderer(self, cameras, **kwargs: Any):
        """Attach a raycasting renderer to this simulation."""
        from flygym_tpu.render import Renderer

        self.renderer = Renderer(self.model, self.world, cameras, **kwargs)
        return self.renderer

    def render_as_needed(self) -> bool:
        """Render a frame if enough sim time elapsed since the last one."""
        return self.renderer.render_as_needed(self.state)

    def render_as_needed_with_profile(self) -> bool:
        start = perf_counter_ns()
        done = self.render_as_needed()
        self._total_render_time_ns += perf_counter_ns() - start
        if done:
            self._frames_rendered += 1
        return done

    # ------------------------------------------------------------------
    # Checkpointing (SURVEY.md §5: keyframe + export analog, extended to
    # full dynamic state save/restore)
    # ------------------------------------------------------------------

    def save_state(self, path) -> None:
        """Write the current dynamic state to an npz checkpoint."""
        from flygym_tpu.utils.checkpoint import save_state

        save_state(self.state, path)

    def load_state(self, path) -> None:
        """Restore a dynamic state from an npz checkpoint."""
        from flygym_tpu.utils.checkpoint import load_state

        self.state = load_state(path)

    # ------------------------------------------------------------------
    # Misc
    # ------------------------------------------------------------------

    @property
    def time(self) -> float:
        """Current simulation time in seconds."""
        return float(self.state.time)

    @property
    def timestep(self) -> float:
        """Simulation timestep in seconds."""
        return self.model.timestep

    def print_performance_report(
        self, show_in_notebook: bool | Literal["auto"] = "auto"
    ) -> None:
        """Summarize physics/render performance (requires the
        ``*_with_profile`` stepping variants)."""
        print_perf_report(
            n_steps=self._curr_step,
            n_frames_rendered=self._frames_rendered,
            total_physics_time_ns=self._total_physics_time_ns,
            total_render_time_ns=self._total_render_time_ns,
            timestep=self.timestep,
            show_in_notebook=show_in_notebook,
        )
