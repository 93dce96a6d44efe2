"""Batched multi-world simulation: N identical worlds stepped in parallel.

The analog of the reference's ``GPUSimulation`` (flygym
``warp/simulation.py``): every state array gains a leading ``n_worlds`` axis
and all getters/setters operate on ``(n_worlds, ...)`` data. Where the
reference marshals CPU structs into MuJoCo-Warp and launches CUDA
gather/scatter kernels per readout (``warp/simulation.py:73-258``,
``warp/utils.py:6-152``), here the whole step is one ``jax.vmap`` of the pure
step function and readouts are XLA gathers — no custom kernels needed, and the
same code shards across TPU meshes by passing ``mesh=`` (worlds are
embarrassingly parallel; the sharding rides ICI with zero collectives in the
step itself).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flygym_tpu.compose.fly import ActuatorType
from flygym_tpu.compose.world import BaseWorld
from flygym_tpu.engine.step import step as engine_step
from flygym_tpu.simulation import Simulation
from flygym_tpu.utils.profiling import print_perf_report_parallel

__all__ = ["BatchSimulation"]


class BatchSimulation(Simulation):
    """N worlds, one compiled model, vmapped stepping.

    Args:
        world: A fully configured world with at least one fly.
        n_worlds: Number of parallel worlds.
        mesh: Optional ``jax.sharding.Mesh`` to shard the world axis across
            devices. The mesh must have a ``world_axis`` axis; ``n_worlds``
            must be divisible by its size.
        world_axis: Name of the mesh axis to shard worlds over.
    """

    def __init__(
        self,
        world: BaseWorld,
        n_worlds: int,
        *,
        mesh: Mesh | None = None,
        world_axis: str = "world",
    ) -> None:
        super().__init__(world)
        self.n_worlds = int(n_worlds)
        self._mesh = mesh
        self._world_axis = world_axis

        if mesh is not None:
            if n_worlds % mesh.shape[world_axis] != 0:
                raise ValueError(
                    f"n_worlds={n_worlds} not divisible by mesh axis "
                    f"'{world_axis}' of size {mesh.shape[world_axis]}"
                )
            from flygym_tpu.parallel import replicate_model

            self._state_sharding = jax.tree.map(
                lambda _: NamedSharding(mesh, P(world_axis)), self._initial_state
            )
            self._model_sharding = jax.tree.map(
                lambda _: NamedSharding(mesh, P()), self.model
            )
            self.model = replicate_model(self.model, mesh)
        else:
            self._state_sharding = None

        self._initial_batch_state = self._broadcast(self._initial_state)
        self.state = self._initial_batch_state

        # Pallas mega-kernel step: the whole physics step as one TPU kernel
        # per SUBLANES x 128-world block (ops/megastep.py) — used
        # automatically on the TPU backend for supported models (Newton
        # solver; flat ground or heightfield). Opt out with
        # FLYGYM_TPU_MEGASTEP=0. Mesh-sharded runs wrap the kernel in
        # shard_map over the world axis: each device runs the kernel on its
        # world shard, SPMD with zero collectives (the worlds are
        # independent). FLYGYM_TPU_MEGASTEP_INTERPRET=1 forces the Pallas
        # interpreter on any backend — used by CI to cover this wiring on
        # the virtual CPU mesh (per-call stepping only; see rollout).
        from flygym_tpu.ops.megastep import maybe_make_megastep

        self._megastep = maybe_make_megastep(
            self.model,
            mesh=mesh,
            world_axis=world_axis,
            state_template=self._initial_batch_state,
        )

        vstep = jax.vmap(engine_step, in_axes=(None, 0))
        if self._megastep is not None:
            mega = self._megastep
            self._jit_step = lambda _model, s: mega(s)
        elif mesh is not None:
            self._jit_step = jax.jit(
                vstep, in_shardings=(self._model_sharding, self._state_sharding),
                out_shardings=self._state_sharding,
            )
        else:
            self._jit_step = jax.jit(vstep)

    def _broadcast(self, state):
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_worlds,) + x.shape), state
        )
        if self._state_sharding is not None:
            batched = jax.device_put(batched, self._state_sharding)
        return batched

    def reset(self) -> None:
        """Reset all worlds to the neutral keyframe."""
        self.state = self._initial_batch_state
        if self.renderer is not None:
            self.renderer.reset()
        self._curr_step = 0
        self._frames_rendered = 0
        self._total_physics_time_ns = 0
        self._total_render_time_ns = 0

    # ------------------------------------------------------------------
    # Batched control input: accepts (n,) broadcast or (n_worlds, n).
    # ------------------------------------------------------------------

    def _set_ctrl(self, ids, values) -> None:
        values = jnp.asarray(values, jnp.float32)
        if values.ndim == 1:
            values = jnp.broadcast_to(values, (self.n_worlds, values.shape[0]))
        self.state = dataclasses.replace(
            self.state, ctrl=self.state.ctrl.at[:, ids].set(values)
        )

    # ------------------------------------------------------------------
    # Batched readouts: (n_worlds, ...) arrays (kept on device as jnp, like
    # the reference returns wp arrays, warp/simulation.py:73-211).
    # ------------------------------------------------------------------

    def get_joint_angles(self, fly_name: str):
        return self.state.qpos[:, self._qpos_adrs[fly_name]]

    def get_joint_velocities(self, fly_name: str):
        return self.state.qvel[:, self._qvel_adrs[fly_name]]

    def get_body_positions(self, fly_name: str):
        return self.state.xpos[:, self._body_ids[fly_name]]

    def get_body_rotations(self, fly_name: str):
        return self.state.xquat[:, self._body_ids[fly_name]]

    def get_actuator_forces(self, fly_name: str, actuator_type: ActuatorType):
        actuator_type = ActuatorType(actuator_type)
        ids = self._act_ids_by_type[actuator_type][fly_name]
        return self.state.actuator_force[:, ids]

    def get_site_positions(self, fly_name: str):
        return self.state.site_xpos[:, self._site_ids[fly_name]]

    def get_ground_contact_info(self, fly_name: str) -> tuple:
        slots = self._sensor_slots[fly_name]
        data = self.state.contact_sensordata[:, slots]
        return (
            data[..., 0],
            data[..., 1:4],
            data[..., 4:7],
            data[..., 7:10],
            data[..., 10:13],
            data[..., 13:16],
        )

    # ------------------------------------------------------------------
    # Whole-episode rollout (the perf path)
    # ------------------------------------------------------------------

    def rollout(
        self, ctrl_sequence, n_steps: int, *, record_trajectory: bool = True
    ):
        """Scan ``n_steps`` for all worlds in one XLA program.

        ``n_steps`` is a static jit argument: EVERY DISTINCT VALUE compiles
        its own episode program (1-3 min over a remote-TPU tunnel, cached
        thereafter). For timing or repeated rollouts, reuse one fixed
        ``n_steps`` — a warmup call with a different count does NOT warm
        the cache entry your timed call needs.

        Args:
            ctrl_sequence: (n_steps, n_worlds, nu) in model order, or None.

        Returns:
            (n_steps, n_worlds, nq) qpos trajectory (device array).
        """
        from flygym_tpu.engine.step import rollout_batched

        if ctrl_sequence is None:
            ctrl_sequence = jnp.full(
                (n_steps, self.n_worlds, self.model.nu), jnp.nan, jnp.float32
            )
        ctrl_sequence = jnp.asarray(ctrl_sequence)
        if ctrl_sequence.shape[0] < n_steps:
            raise ValueError(
                f"ctrl_sequence has {ctrl_sequence.shape[0]} steps, "
                f"need at least n_steps={n_steps}"
            )
        # Interpret-mode kernels stay OUT of the jitted scan: the kernel
        # unrolls to ~1e5 ops and XLA-CPU-compiling that takes tens of
        # minutes (they exist for per-call wiring coverage in CI).
        mega = self._megastep
        if mega is not None and getattr(mega, "interpret_mode", False):
            mega = None

        # VMEM-gated models fall back to the vmapped jnp path, whose XLA
        # compile is PATHOLOGICAL at large world counts (204-DoF
        # ALL_POSSIBLE at 4096 worlds: >40 min on TPU, measured
        # 2026-08-20 and abandoned). Rather than let a user sink that
        # silently, big-batch gated rollouts are split into world chunks:
        # one bounded compile for the chunk size, reused across chunks.
        chunk = self._fallback_world_chunk() if mega is None else None
        if chunk is not None:
            import warnings

            warnings.warn(
                f"Model exceeds the mega-kernel's VMEM gate and falls back "
                f"to the vmapped jnp path, whose XLA compile is known to be "
                f"pathological at large batch (measured >40 min at 4096 "
                f"worlds on TPU). Splitting the rollout into "
                f"{-(-self.n_worlds // chunk)} sequential chunks of "
                f"<= {chunk} worlds (override with "
                f"FLYGYM_TPU_FALLBACK_MAX_WORLDS=<n>, 0 disables).",
                stacklevel=2,
            )
            states, trajs = [], []
            for i in range(0, self.n_worlds, chunk):
                sub = jax.tree.map(lambda x: x[i : i + chunk], self.state)
                fs, tr = rollout_batched(
                    self.model,
                    sub,
                    ctrl_sequence[:n_steps, i : i + chunk],
                    n_steps,
                    record=record_trajectory,
                )
                states.append(fs)
                trajs.append(tr)
            self.state = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *states
            )
            self._curr_step += n_steps
            if not record_trajectory:
                return None
            return jnp.concatenate(trajs, axis=1)

        self.state, traj = rollout_batched(
            self.model,
            self.state,
            ctrl_sequence[:n_steps],
            n_steps,
            batched_step=mega,
            record=record_trajectory,
            kstep_fn=self._get_megastep_k(n_steps) if mega is not None else None,
        )
        self._curr_step += n_steps
        return traj

    def _fallback_world_chunk(self) -> "int | None":
        """World-chunk size for VMEM-gated jnp-fallback rollouts, or None.

        None = no split (kernel path available, mesh-sharded run, small
        batch, model gated for a feature reason rather than size, or the
        user disabled it with FLYGYM_TPU_FALLBACK_MAX_WORLDS=0).
        """
        import os

        from flygym_tpu.ops.megastep import vmem_gated

        if self._mesh is not None:
            return None
        cap = int(os.environ.get("FLYGYM_TPU_FALLBACK_MAX_WORLDS", "1024"))
        if cap <= 0 or self.n_worlds <= cap:
            return None
        if not vmem_gated(self.model):
            return None
        # Equalize chunk sizes when possible so every chunk reuses ONE
        # compiled program (a ragged last chunk would compile twice).
        n_chunks = -(-self.n_worlds // cap)
        if self.n_worlds % n_chunks == 0:
            return self.n_worlds // n_chunks
        return cap

    @property
    def time(self) -> float:
        """Simulation time of world 0, in seconds."""
        return float(self.state.time[0])

    def print_performance_report(self, show_in_notebook="auto") -> None:
        """Parallel performance report (aggregate columns ×n_worlds)."""
        n_worlds_rendered = (
            len(getattr(self.renderer, "world_ids", []))
            if self.renderer is not None
            else 0
        )
        print_perf_report_parallel(
            n_steps=self._curr_step,
            n_frames_rendered=self._frames_rendered,
            total_physics_time_ns=self._total_physics_time_ns,
            total_render_time_ns=self._total_render_time_ns,
            timestep=self.timestep,
            n_worlds=self.n_worlds,
            n_worlds_rendered=n_worlds_rendered,
            show_in_notebook=show_in_notebook,
        )
