"""Static physics model and dynamic simulation state pytrees.

A :class:`PhysicsModel` is the compiled form of a composed world: every body,
joint, geom, actuator, contact candidate, site, and sensor flattened into
dense, shape-static arrays (plus hashable static metadata). It plays the role
of MuJoCo's ``MjModel`` (reference crosses into it via
``mjcf.Physics.from_mjcf_model``, flygym ``compose/base.py:26-27``), but is a
JAX pytree, so it can be closed over by ``jit``, ``vmap``, and ``shard_map``.

A :class:`State` is the per-world dynamic state (qpos/qvel/ctrl plus cached
outputs), the analog of ``MjData``. Batched simulation stacks a leading world
axis on every array field via ``jax.vmap``.

Design notes (TPU-first):
- All shapes are static; variable-size concepts (contacts, joints-per-body)
  are padded tables with -1 sentinels.
- Tree topology is encoded as dense index arrays and boolean masks
  (ancestor/subtree) so that tree algorithms become masked matmuls (MXU) and
  short level-indexed loops instead of pointer chasing.
"""

from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp

__all__ = ["PhysicsModel", "State", "ActKind", "static_field"]


def static_field(**kwargs):
    """Dataclass field treated as static (hashable) pytree metadata."""
    return field(metadata={"static": True}, **kwargs)


def _register(cls):
    data_fields = [f.name for f in fields(cls) if not f.metadata.get("static")]
    meta_fields = [f.name for f in fields(cls) if f.metadata.get("static")]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


class ActKind:
    """Integer codes for actuator transmission/dynamics kinds."""

    MOTOR = 0
    POSITION = 1
    VELOCITY = 2
    INTVELOCITY = 3
    DAMPER = 4
    ADHESION = 5
    CYLINDER = 6  # first-order-filter activation, force = gain * act
    MUSCLE = 7  # MuJoCo muscle model: FLV curves + activation dynamics


@_register
@dataclass(frozen=True)
class PhysicsModel:
    """Compiled, static description of a world (bodies + joints + contacts).

    Index conventions:
    - Body 0 is the world body; all static world geometry hangs off it.
    - Hinge DoFs are indexed 0..nhinge-1 in composition (DFS) order; the full
      DoF space (nv) prepends 6 DoFs for each free-floating fly root.
    - qpos packs [x y z qw qx qy qz] per free joint then one angle per hinge.
    - qvel packs [vx vy vz wx wy wz] (world frame) per free joint then one
      angular rate per hinge.
    """

    # ---- static metadata ----
    nbody: int = static_field()
    nq: int = static_field()
    nv: int = static_field()
    nu: int = static_field()
    na: int = static_field()
    nhinge: int = static_field()
    nsite: int = static_field()
    ngeom: int = static_field()
    ncand: int = static_field()  # candidate contact points (static table)
    # Capsule-capsule pair candidates (fly-fly contacts): the LAST
    # ncand_pair rows of the candidate table; the first ncand - ncand_pair
    # rows are capsule-end vs ground rows (static partition).
    ncand_pair: int = static_field()
    # Pair-row grouping for nearest-neighbor compression: (start, size)
    # runs (in pair-row space) sharing geom1. With pair_compress, only the
    # closest geom2 of each group reaches the solver — the shape-static
    # answer to oversized pair sets (e.g. the 3,025-row default two-fly
    # preset), in exchange for at most one contact per geom1 per group.
    pair_groups: tuple = static_field()
    pair_compress: bool = static_field()
    ncon: int = static_field()  # max simultaneous contacts fed to the solver
    # Contact dimensionality (MuJoCo condim): 1 = frictionless, 3 = sliding,
    # 4 = + torsional, 6 = + rolling. Model-wide (static row count:
    # 1/4/6/10 pyramid rows per contact).
    condim: int = static_field()
    nsensor_contact: int = static_field()
    timestep: float = static_field()
    solver_type: str = static_field()  # "active_set" (TPU default) | "pgs"
    solver_iterations: int = static_field()
    # Strict-parity mode: re-factor the contact Hessian from the CURRENT
    # active set every Newton iteration (true semismooth Newton, like
    # MuJoCo's solver) instead of freezing the warm-start factor. Slower
    # (one LDL per iteration) but tracks MuJoCo through violent transients;
    # pair with solver_iterations ~10 for parity studies.
    solver_exact: bool = static_field()
    solver_relaxation: float = static_field()
    # Differentiable mode: route the contact solve through the pure-jnp
    # tree-LDL (skipping the custom_vmap/Pallas linear-algebra ops, which
    # have no autodiff rules) so jax.grad flows through the whole step —
    # controls, initial state, and model parameters. Slightly slower under
    # vmap on TPU; identical numerics.
    differentiable: bool = static_field()
    levels: tuple = static_field()  # tuple[tuple[int, ...]] body ids per tree depth
    # Pointer-doubling ancestor tables: jumps[k][b] = ancestor of b at distance
    # 2^k (clamped to the world body). FK composes transforms along these in
    # O(log depth) rounds instead of O(depth) level sweeps.
    ancestor_jumps: tuple = static_field()
    ref_body: int = static_field()  # Plücker reference body (fly-0 root)
    free_joints: tuple = static_field()  # tuple[(body, qadr, vadr)] per free joint
    dof_height_levels: tuple = static_field()  # DoFs grouped leaves → root
    dof_depth_levels: tuple = static_field()  # DoFs grouped root → leaves
    dof_chains: tuple = static_field()  # per-DoF ancestor chains (static)
    geom_types: tuple = static_field()  # per-geom type strings (host-side use)

    # ---- bodies ----
    gravity: jnp.ndarray  # (3,)
    body_parent: jnp.ndarray  # (nbody,) i32
    body_pos: jnp.ndarray  # (nbody, 3) frame offset in parent frame
    body_quat: jnp.ndarray  # (nbody, 4)
    body_mass: jnp.ndarray  # (nbody,)
    body_ipos: jnp.ndarray  # (nbody, 3) com in body frame
    body_iquat: jnp.ndarray  # (nbody, 4) principal-axis frame in body frame
    body_inertia: jnp.ndarray  # (nbody, 3) principal moments
    body_hinge_idx: jnp.ndarray  # (nbody, 3) i32, -1 padded
    body_free_qadr: jnp.ndarray  # (nbody,) i32, -1 if body has no free joint
    body_free_vadr: jnp.ndarray  # (nbody,) i32
    body_subtree_mask: jnp.ndarray  # (nbody, nbody) f32: [i, j]=1 if j in subtree(i)

    # ---- hinge joints ----
    hinge_body: jnp.ndarray  # (nhinge,) i32
    hinge_slot: jnp.ndarray  # (nhinge,) i32 position within the body (0..2)
    hinge_axis: jnp.ndarray  # (nhinge, 3) axis in child body frame
    hinge_qadr: jnp.ndarray  # (nhinge,) i32 address into qpos
    hinge_vadr: jnp.ndarray  # (nhinge,) i32 address into qvel
    hinge_stiffness: jnp.ndarray  # (nhinge,)
    hinge_damping: jnp.ndarray  # (nhinge,)
    hinge_springref: jnp.ndarray  # (nhinge,)

    # ---- full DoF space ----
    dof_body: jnp.ndarray  # (nv,) i32
    dof_armature: jnp.ndarray  # (nv,)
    dof_damping: jnp.ndarray  # (nv,)
    dof_ancestor_mask: jnp.ndarray  # (nv, nv) f32: [i, j]=1 if i ancestor-or-self of j
    # Tree-sparse LDL structure (see engine/linalg.py): per-DoF ancestor
    # chains and the elimination/solve level schedules.
    dof_anc: jnp.ndarray  # (nv, C) i32, -1 padded, ancestors excluding self

    # ---- geoms (collision + rendering primitives) ----
    geom_body: jnp.ndarray  # (ngeom,) i32
    geom_pos: jnp.ndarray  # (ngeom, 3) in body frame
    geom_quat: jnp.ndarray  # (ngeom, 4)
    geom_size: jnp.ndarray  # (ngeom, 3)
    geom_rgba: jnp.ndarray  # (ngeom, 4)
    # Material table (visuals.json → Fly.colorize; the analog of the
    # reference's MuJoCo material/texture pipeline, fly.py:443-469):
    # matprops = [specular, shininess]; tex = [builtin (0 none / 1 flat /
    # 2 gradient), rgb1(3), rgb2(3), markrgb(3), mark probability].
    geom_matprops: jnp.ndarray  # (ngeom, 2)
    geom_tex: jnp.ndarray  # (ngeom, 11)

    # ---- contact candidates ----
    # Ground rows (first ncand - ncand_pair): capsule-end vs ground plane.
    # Pair rows (last ncand_pair): capsule vs capsule (fly-fly contacts),
    # one closest-point contact per geom pair; can_end is unused there and
    # can_geom2/can_body2 identify the second capsule (-1/0 = ground/world
    # on ground rows).
    can_geom: jnp.ndarray  # (ncand,) i32 capsule geom
    can_body: jnp.ndarray  # (ncand,) i32
    can_geom2: jnp.ndarray  # (ncand,) i32 second capsule, -1 on ground rows
    can_body2: jnp.ndarray  # (ncand,) i32 second body, 0 (world) on ground rows
    can_end: jnp.ndarray  # (ncand,) f32 +-1: which capsule end
    can_friction: jnp.ndarray  # (ncand, 3) sliding, torsional, rolling
    can_solref: jnp.ndarray  # (ncand, 2)
    can_solimp: jnp.ndarray  # (ncand, 5) dmin dmax width midpoint power
    can_margin: jnp.ndarray  # (ncand,)
    can_adh_act: jnp.ndarray  # (ncand,) i32 adhesion actuator or -1
    can_sensor: jnp.ndarray  # (ncand,) i32 contact sensor slot or -1
    # Per-pyramid-row inverse weight J M0^-1 J^T at the neutral pose — the
    # constraint regularizer scale, precomputed at compile like MuJoCo's
    # body_invweight0/diagApprox so the solver needs no per-step diag(A).
    can_invweight: jnp.ndarray  # (ncand, nrows) with nrows = pyramid rows/contact
    ground_pos: jnp.ndarray  # (3,)
    ground_normal: jnp.ndarray  # (3,)
    # Optional heightfield terrain overriding the flat ground (blocks / gaps /
    # rugged worlds): z = hfield_data[iy, ix] sampled bilinearly over a grid
    # anchored at hfield_xy0 with spacing hfield_cell.
    has_hfield: bool = static_field()
    hfield_data: jnp.ndarray  # (nrow, ncol)
    hfield_xy0: jnp.ndarray  # (2,)
    hfield_cell: jnp.ndarray  # (2,)

    # Soft weld constraints (TetheredWorld(weld="soft")): per weld a tuple
    # (body, qadr, vadr, refpos (3,), refquat (4,), solref (2,),
    # solimp (5,)) pinning a FREE root body to a world pose with MuJoCo's
    # equality-weld softness (reference world.py:334-366). Solved as a
    # mass-consistent penalty on the root's 6 DoFs (engine/step.py).
    welds: tuple = static_field()

    # ---- actuators ----
    act_kind: jnp.ndarray  # (nu,) i32, see ActKind
    act_hinge: jnp.ndarray  # (nu,) i32 target hinge or -1
    act_body: jnp.ndarray  # (nu,) i32 adhesion body or -1
    act_gain: jnp.ndarray  # (nu,) kp / gain / kv by kind
    act_kv: jnp.ndarray  # (nu,) extra velocity feedback (position/intvelocity)
    act_ctrlrange: jnp.ndarray  # (nu, 2)
    act_ctrllimited: jnp.ndarray  # (nu,) f32 mask
    act_forcerange: jnp.ndarray  # (nu, 2)
    act_forcelimited: jnp.ndarray  # (nu,) f32 mask
    act_actadr: jnp.ndarray  # (nu,) i32 activation slot or -1
    # Activation dynamics params: [tau_act, tau_deact, _] (muscle) or
    # [tau, _, _] (cylinder); zeros otherwise.
    act_dynprm: jnp.ndarray  # (nu, 3)
    # Muscle gain params (MuJoCo gainprm layout):
    # [range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax].
    act_muscleprm: jnp.ndarray  # (nu, 9)
    act_lengthrange: jnp.ndarray  # (nu, 2) actuator length range (muscles)
    act_acc0: jnp.ndarray  # (nu,) |qacc| per unit force at qpos0 (muscles)

    # ---- sites ----
    site_body: jnp.ndarray  # (nsite,) i32
    site_pos: jnp.ndarray  # (nsite, 3) in body frame

    # ---- neutral keyframe ----
    qpos0: jnp.ndarray  # (nq,)
    ctrl0: jnp.ndarray  # (nu,)


@_register
@dataclass(frozen=True)
class State:
    """Dynamic per-world simulation state (the ``MjData`` analog).

    Fields after ``time`` are outputs cached by the last ``step`` so that
    readouts are free (no recompute, no extra device round trips).
    """

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    ctrl: jnp.ndarray  # (nu,)
    act: jnp.ndarray  # (na,)
    time: jnp.ndarray  # () f32
    qacc: jnp.ndarray  # (nv,) last acceleration (constraint-solver warm start)

    # Cached outputs (world frame).
    xpos: jnp.ndarray  # (nbody, 3)
    xquat: jnp.ndarray  # (nbody, 4)
    site_xpos: jnp.ndarray  # (nsite, 3)
    actuator_force: jnp.ndarray  # (nu,)
    contact_sensordata: jnp.ndarray  # (nsensor_contact, 16)


@jax.jit
def make_initial_state(model: PhysicsModel) -> State:
    """Neutral-keyframe initial state (the analog of
    ``mj_resetDataKeyframe(neutral)``, reference ``simulation.py:41``)."""
    from flygym_tpu.engine.kinematics import forward_kinematics

    qpos = jnp.asarray(model.qpos0, dtype=jnp.float32)
    ctrl = jnp.asarray(model.ctrl0, dtype=jnp.float32)
    xpos, xquat = forward_kinematics(model, qpos)
    site_xpos = compute_site_xpos(model, xpos, xquat)
    return State(
        qpos=qpos,
        qvel=jnp.zeros((model.nv,), jnp.float32),
        ctrl=ctrl,
        act=jnp.zeros((model.na,), jnp.float32),
        time=jnp.zeros((), jnp.float32),
        qacc=jnp.zeros((model.nv,), jnp.float32),
        xpos=xpos,
        xquat=xquat,
        site_xpos=site_xpos,
        actuator_force=jnp.zeros((model.nu,), jnp.float32),
        contact_sensordata=jnp.zeros((model.nsensor_contact, 16), jnp.float32),
    )


def compute_site_xpos(
    model: PhysicsModel, xpos: jnp.ndarray, xquat: jnp.ndarray
) -> jnp.ndarray:
    from flygym_tpu.engine.maths import quat_rotate

    if model.nsite == 0:
        return jnp.zeros((0, 3), jnp.float32)
    body_q = xquat[model.site_body]
    body_p = xpos[model.site_body]
    return body_p + quat_rotate(body_q, model.site_pos)
