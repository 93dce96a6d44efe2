"""Gym-style reinforcement-learning interface.

The reference v2 repo does not ship the Gymnasium interface (moved to
flygym-gymnasium, SURVEY.md §0); this implements the NeuroMechFly task
environment concept with flygym-1.x-compatible spaces:

- action: dict(joints=(n_actuated,), adhesion=(6,))
- observation: dict(joints=(3, n_actuated) pos/vel/torque,
  fly=(4, 3) pos/vel/orientation/angular-velocity, contact_forces=(6, 3),
  end_effectors=(6, 3), plus optional vision=(2, 721, 2) and
  odor_intensity=(n_dim, 4))

Two flavors:
- :class:`FlyEnv` — a standard ``gymnasium.Env`` for single-world use.
- :class:`VectorFlyEnv` — a *functional* env (pure jittable reset/step over
  explicit state) that vmaps to thousands of flies per chip and shards over
  meshes, for large-scale RL (BASELINE.json config 5).
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.compose.fly import ActuatorType
from flygym_tpu.engine.maths import quat_rotate
from flygym_tpu.engine.model import State
from flygym_tpu.engine.step import step as engine_step

__all__ = ["FlyEnv", "VectorFlyEnv"]


def _build_default_world(fly_name: str = "fly0"):
    from flygym_tpu.anatomy import (
        ActuatedDOFPreset,
        AxisOrder,
        JointPreset,
        Skeleton,
    )
    from flygym_tpu.compose import (
        Fly,
        FlatGroundWorld,
        KinematicPosePreset,
    )
    from flygym_tpu.utils.math import Rotation3D

    fly = Fly(name=fly_name)
    skeleton = Skeleton(
        axis_order=AxisOrder.YAW_PITCH_ROLL, joint_preset=JointPreset.LEGS_ONLY
    )
    fly.add_joints(skeleton, neutral_pose=KinematicPosePreset.NEUTRAL)
    dofs = fly.skeleton.get_actuated_dofs_from_preset(
        ActuatedDOFPreset.LEGS_ACTIVE_ONLY
    )
    fly.add_actuators(
        dofs,
        ActuatorType.POSITION,
        kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    return fly, world


class VectorFlyEnv:
    """Functional fly environment: pure reset/step for massive vmap RL.

    Args:
        world: composed world (default: flagship walking fly).
        fly_name: which fly is the agent.
        decision_interval: physics steps per env step (default 10 → 1 kHz
            control at dt = 1e-4).
        enable_vision: include retina output in observations.
        odor_field: optional OdorField to include odor observations.

    Usage (single):
        env = VectorFlyEnv()
        state = env.reset(jax.random.PRNGKey(0))
        state, obs, reward, done, info = env.step(state, action)

    Usage (vmapped, 4096 flies):
        reset = jax.vmap(env.reset)
        step = jax.vmap(env.step)
    """

    def __init__(
        self,
        world=None,
        fly_name: str | None = None,
        *,
        decision_interval: int = 10,
        enable_vision: bool = False,
        odor_field=None,
    ):
        if world is None:
            fly, world = _build_default_world()
            fly_name = fly.name
        if fly_name is None:
            fly_name = next(iter(world.fly_lookup))
        self.world = world
        self.fly_name = fly_name
        self.fly = world.fly_lookup[fly_name]
        self.model, self._state0 = world.compile()
        self.decision_interval = decision_interval
        self.enable_vision = enable_vision
        self.odor_field = odor_field

        c = world.compiled
        ns = fly_name
        order = self.fly.get_actuated_jointdofs_order(ActuatorType.POSITION)
        self._act_ids = jnp.asarray(
            [
                c.actuator_name2id[a.full_identifier]
                for a in self.fly.jointdof_to_specactuator_by_type[
                    ActuatorType.POSITION
                ].values()
            ],
            jnp.int32,
        )
        self._adh_ids = jnp.asarray(
            [
                c.actuator_name2id[
                    self.fly.leg_to_adhesionactuator[leg].full_identifier
                ]
                for leg in self.fly.get_legs_order()
            ],
            jnp.int32,
        )
        self._qpos_adrs = jnp.asarray(
            [c.hinge_qadr[f"{ns}/{d.name}"] for d in order], jnp.int32
        )
        self._qvel_adrs = jnp.asarray(
            [c.hinge_vadr[f"{ns}/{d.name}"] for d in order], jnp.int32
        )
        self._root_body = c.body_name2id[f"{ns}/{self.fly.root_segment.name}"]
        self._tip_bodies = jnp.asarray(
            [c.body_name2id[f"{ns}/{leg}_tarsus5"]
             for leg in self.fly.get_legs_order()],
            jnp.int32,
        )
        sensors = world.legpos_to_groundcontactsensors_by_fly
        self._sensor_slots = jnp.asarray(
            [
                c.sensor_name2slot[sensors[ns][leg].full_identifier]
                for leg in self.fly.get_legs_order()
            ],
            jnp.int32,
        )
        self.n_actuated = len(order)
        if enable_vision:
            from flygym_tpu.vision import Retina

            self.retina = Retina.for_fly(world, fly_name)
        else:
            self.retina = None

    # -- functional API ----------------------------------------------------

    def reset(self, key: jnp.ndarray) -> State:
        """Fresh state with a small random joint-angle perturbation."""
        noise = 0.01 * jax.random.normal(key, (self.model.nq,))
        # Do not perturb any free-joint quaternion block (multi-fly worlds
        # have one per fly; Gaussian noise would de-normalize them).
        for _b, qadr, _v in self.model.free_joints:
            noise = noise.at[qadr + 3 : qadr + 7].set(0.0)
        return dataclasses.replace(
            self._state0, qpos=self._state0.qpos + noise
        )

    def reset_batched(self, key: jnp.ndarray, n_envs: int) -> State:
        """(B,)-batched fresh states (one RNG stream per env)."""
        return jax.vmap(self.reset)(jax.random.split(key, n_envs))

    def step(self, state: State, action: dict):
        """Apply an action and advance ``decision_interval`` physics steps.

        Args:
            action: dict(joints=(n_actuated,) target angles,
                adhesion=(6,) on/off in [0, 1]).
        Returns:
            (state, obs dict, reward, done, info dict)
        """
        ctrl = state.ctrl.at[self._act_ids].set(action["joints"])
        adhesion = 1.0 + 99.0 * jnp.clip(action["adhesion"], 0.0, 1.0)
        ctrl = ctrl.at[self._adh_ids].set(adhesion)
        state = dataclasses.replace(state, ctrl=ctrl)

        def body(carry, _):
            return engine_step(self.model, carry), None

        state, _ = jax.lax.scan(
            body, state, None, length=self.decision_interval
        )

        obs = self.observe(state)
        reward, done = self._reward_done(state)
        return state, obs, reward, done, {}

    def _reward_done(self, state: State):
        root_quat = state.xquat[self._root_body]
        heading = quat_rotate(root_quat, jnp.array([1.0, 0.0, 0.0]))
        root_vel = state.qvel[0:3] if self.model.free_joints else jnp.zeros(3)
        reward = jnp.dot(root_vel, heading) * 1e-3  # forward speed (mm/s scale)
        up = quat_rotate(root_quat, jnp.array([0.0, 0.0, 1.0]))
        flipped = up[2] < 0.0
        fallen = state.xpos[self._root_body, 2] < 0.2
        return reward, flipped | fallen

    def make_batched_step(self, *, interpret: bool = False,
                          auto_reset: bool = False):
        """TPU-native batched env step: (B,) states + batched action dict →
        ``(states, obs, reward, done, info)`` with every leaf batched.

        Semantically identical to ``jax.vmap(self.step)``, but the physics
        substeps run through the Pallas mega-step kernel and vision through
        the Pallas retina kernel on the TPU backend (vmapped jnp elsewhere)
        — the full-rate RL training path for thousands of environments.
        The returned function is jitted and usable inside ``lax.scan``.

        With ``auto_reset=True`` the returned function takes an extra
        ``key`` argument; environments that finished are replaced by fresh
        reset states and the returned observation corresponds to the
        post-reset state (gymnax/brax vectorized-training semantics) while
        ``reward``/``done`` report the terminating step.
        """
        from flygym_tpu.ops.megastep import maybe_make_megastep

        # Interpret-mode kernels must never enter the jitted scan below
        # (~1e5-op XLA-CPU compile); with interpret=True only the (small)
        # retina kernel runs interpreted and physics stays on vmap.
        batched_physics = maybe_make_megastep(self.model)
        if batched_physics is not None and getattr(
            batched_physics, "interpret_mode", False
        ):
            batched_physics = None
        if batched_physics is None:
            vstep = jax.vmap(engine_step, in_axes=(None, 0))
            batched_physics = lambda s: vstep(self.model, s)

        render = (
            self.retina.make_render_batched(self.model, interpret=interpret)
            if self.retina is not None
            else None
        )
        observe_rest = jax.vmap(lambda s: self.observe(s, include_vision=False))
        reward_done = jax.vmap(self._reward_done)

        def _advance(states: State, action: dict):
            ctrl = states.ctrl.at[:, self._act_ids].set(action["joints"])
            adhesion = 1.0 + 99.0 * jnp.clip(action["adhesion"], 0.0, 1.0)
            ctrl = ctrl.at[:, self._adh_ids].set(adhesion)
            states = dataclasses.replace(states, ctrl=ctrl)

            def body(carry, _):
                return batched_physics(carry), None

            states, _ = jax.lax.scan(
                body, states, None, length=self.decision_interval
            )
            return states

        def _observe(states: State):
            obs = observe_rest(states)
            if render is not None:
                obs["vision"] = render(states)
            return obs

        if not auto_reset:

            @jax.jit
            def step_batched(states: State, action: dict):
                states = _advance(states, action)
                reward, done = reward_done(states)
                return states, _observe(states), reward, done, {}

            return step_batched

        @jax.jit
        def step_batched_autoreset(states: State, action: dict, key):
            states = _advance(states, action)
            reward, done = reward_done(states)
            n = states.qpos.shape[0]
            fresh = self.reset_batched(key, n)

            def pick(new, old):
                mask = done.reshape((n,) + (1,) * (old.ndim - 1))
                return jnp.where(mask, new, old)

            states = jax.tree.map(pick, fresh, states)
            return states, _observe(states), reward, done, {}

        return step_batched_autoreset

    def observe(self, state: State, include_vision: bool = True) -> dict:
        """Build the observation dict (flygym-1.x layout)."""
        joints = jnp.stack(
            [
                state.qpos[self._qpos_adrs],
                state.qvel[self._qvel_adrs],
                state.actuator_force[
                    jnp.arange(self.n_actuated)
                    if self.model.nu == 0
                    else self._act_ids
                ],
            ]
        )
        root_pos = state.xpos[self._root_body]
        root_quat = state.xquat[self._root_body]
        if self.model.free_joints:
            _b, _q, vadr = self.model.free_joints[0]
            lin_vel = jax.lax.dynamic_slice(state.qvel, (vadr,), (3,))
            ang_vel = jax.lax.dynamic_slice(state.qvel, (vadr + 3,), (3,))
        else:
            lin_vel = jnp.zeros(3)
            ang_vel = jnp.zeros(3)
        heading = quat_rotate(root_quat, jnp.array([1.0, 0.0, 0.0]))
        fly = jnp.stack([root_pos, lin_vel, heading, ang_vel])
        contact = state.contact_sensordata[self._sensor_slots]
        obs = {
            "joints": joints,
            "fly": fly,
            "contact_forces": contact[:, 1:4],
            "end_effectors": state.xpos[self._tip_bodies],
            "fly_orientation": heading,
        }
        if self.retina is not None and include_vision:
            obs["vision"] = self.retina.render(self.model, state)
        if self.odor_field is not None:
            obs["odor_intensity"] = self.odor_field.sample(self.model, state)
        return obs

    @property
    def timestep(self) -> float:
        return self.model.timestep * self.decision_interval


class FlyEnv:
    """Standard gymnasium.Env wrapper around :class:`VectorFlyEnv`."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, *args, render_camera: str | None = None, **kwargs):
        import gymnasium
        from gymnasium import spaces

        self._core = VectorFlyEnv(*args, **kwargs)
        self._state = None
        self._step_fn = jax.jit(self._core.step)
        self._key = jax.random.PRNGKey(0)
        self._render_camera = render_camera

        n = self._core.n_actuated
        self.action_space = spaces.Dict(
            {
                "joints": spaces.Box(-np.pi, np.pi, shape=(n,), dtype=np.float32),
                "adhesion": spaces.Box(0.0, 1.0, shape=(6,), dtype=np.float32),
            }
        )
        obs_spaces = {
            "joints": spaces.Box(-np.inf, np.inf, (3, n), dtype=np.float32),
            "fly": spaces.Box(-np.inf, np.inf, (4, 3), dtype=np.float32),
            "contact_forces": spaces.Box(-np.inf, np.inf, (6, 3), np.float32),
            "end_effectors": spaces.Box(-np.inf, np.inf, (6, 3), np.float32),
            "fly_orientation": spaces.Box(-1.0, 1.0, (3,), np.float32),
        }
        if self._core.retina is not None:
            obs_spaces["vision"] = spaces.Box(
                0.0, 1.0, (2, self._core.retina.n_ommatidia, 2), np.float32
            )
        if self._core.odor_field is not None:
            obs_spaces["odor_intensity"] = spaces.Box(
                0.0,
                np.inf,
                (self._core.odor_field.n_dimensions, 4),
                np.float32,
            )
        self.observation_space = spaces.Dict(obs_spaces)
        self._gymnasium = gymnasium

    def reset(self, *, seed: int | None = None, options: Any = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        self._state = self._core.reset(sub)
        obs = self._core.observe(self._state)
        return jax.tree.map(np.asarray, obs), {}

    def step(self, action: dict):
        action = {
            "joints": jnp.asarray(action["joints"], jnp.float32),
            "adhesion": jnp.asarray(action["adhesion"], jnp.float32),
        }
        self._state, obs, reward, done, info = self._step_fn(
            self._state, action
        )
        return (
            jax.tree.map(np.asarray, obs),
            float(reward),
            bool(done),
            False,
            info,
        )

    def render(self):
        from flygym_tpu.render.raycast import render_pixels
        from flygym_tpu.engine.kinematics import geom_poses

        model = self._core.model
        gpos, gquat = geom_poses(model, self._state.xpos, self._state.xquat)
        root = self._state.xpos[self._core._root_body]
        cam_pos = root + jnp.array([0.0, -7.5, 6.0])
        from flygym_tpu.utils.math import Rotation3D

        cam_quat = jnp.asarray(
            Rotation3D("xyaxes", (1, 0, 0, 0, 0.6, 0.8)).as_quat_wxyz(),
            jnp.float32,
        )
        mask = jnp.asarray(
            [1.0 if t in ("capsule", "sphere") else 0.0 for t in model.geom_types],
            jnp.float32,
        )
        frame = render_pixels(
            model, gpos, gquat, cam_pos, cam_quat, 240, 320, 30.0, mask
        )
        return (np.asarray(frame) * 255).astype(np.uint8)

    def close(self):
        pass
