"""Mega-step: the entire physics step as one Pallas TPU kernel.

The jnp step (engine/step.py) lowers to hundreds of small XLA ops whose
dispatch + HBM round trips dominate TPU step time (~2 MFLOP/world-step vs a
50 TFLOP/s chip). This module re-expresses the *whole* step — FK, motion
subspaces, velocities, spatial inertias, CRBA, RNEA, actuator forces,
contact rows, tree-LDLᵀ, primal Newton with line search, integration, and
contact sensors — as straight-line elementwise code over **lane vectors**
(one (128,) vector per per-world scalar; worlds live in the TPU lane
dimension), which a single Pallas kernel executes per 128-world block with
zero inter-op boundaries.

Key design points (vs the batched-XLA pipeline it replaces):

- **Sequential tree recursions come back.** Inside a kernel there is no
  dispatch cost, so FK/velocities/composite inertias use plain unrolled
  parent→child loops over the ~70 bodies instead of pointer-doubling and
  mask matmuls. All indices/branches are static Python; the model's constant
  data (body poses, axes, masses, friction...) is baked into the kernel as
  immediates.
- **Tree sparsity everywhere.** The mass matrix, contact Hessian, and LDLᵀ
  factor are stored as dicts of lane vectors keyed by (ancestor, dof) pairs
  — only the ~650 structurally nonzero entries of the fly's 72×72 matrices
  exist.
- **No top-K contact compression.** The kernel processes every candidate
  contact row; far-away candidates contribute zero force. (The jnp path
  keeps top-K for worlds with many flies.)

The emitter (:func:`emit_step`) is pure elementwise jnp over lane vectors,
so the exact in-kernel computation can be run and tested *outside* Pallas by
feeding (B,) arrays — see tests/engine/test_megastep.py.

Scope/fallbacks: flat-ground + heightfield worlds (terrain sampled as
per-candidate local planes outside the kernel), fly-fly capsule-capsule
pair rows, Newton solver (the engine default). The PGS cross-check solver,
the strict-parity exact-Newton mode, and models whose estimated Mosaic
stack exceeds scoped VMEM (see :func:`megastep_supported`) stay on the
jnp path.

Replaces (perf-path only): MuJoCo's mj_step + MuJoCo-Warp's batched kernels
behind the reference's GPU simulation (flygym ``warp/simulation.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.utils.exceptions import FlyGymInternalError

__all__ = [
    "emit_step",
    "make_megastep",
    "make_megastep_sharded",
    "maybe_make_megastep",
    "megastep_supported",
]

LANE = 128
# Worlds per kernel block = SUBLANES x LANE. Each per-world value is an
# (SUBLANES, LANE) array filling a whole f32 vreg tile — at (1, 128) the
# VPU runs at 1/8 utilization and the value occupies the same VMEM tile
# anyway (Mosaic pads to 8 sublanes), so packing 8 sublanes is ~free.
SUBLANES = int(__import__("os").environ.get("FLYGYM_TPU_MEGASTEP_SUBLANES", "8"))
BLOCK = SUBLANES * LANE


def _pair_comp_shape(model):
    """(n_groups, max_group_size, kernel_ncand) for pair_compress models.

    ``kernel_ncand`` is the row count the kernel actually emits: ground
    rows plus ONE row per geom1 group. Uncompressed models return
    (0, 0, model.ncand).
    """
    if not (model.pair_compress and model.ncand_pair):
        return 0, 0, model.ncand
    ng = model.ncand - model.ncand_pair
    n_groups = len(model.pair_groups)
    gmax = max(size for _, size in model.pair_groups)
    return n_groups, gmax, ng + n_groups


def _pair_group_specs(model, validate=True):
    """Static spec per compressed pair group (pair_compress models).

    Each group collapses a contiguous run of capsule-capsule candidate rows
    sharing one geom1 into ONE kernel row whose geom2 is the group's runtime
    winner (out-of-kernel argmin, K-chunk-stale). Returns (specs, keep):

    - specs[g]: dict with ``row0`` (representative model row), ``members``
      ([(geom2, body2)]), ``invw``/``r2``/``h2`` (per-member scalars the
      winner selects among), ``dof_sign_spec`` ({dof: "all" | member-index
      runs} over the geom2 union), ``listed`` (sorted UNIQUE runs — one
      sign-mask row each; DoFs on the same body path share a row),
      ``dof_sign_idx`` ({run-listed dof: row index into listed}), and
      ``n_rows`` = 1 winner-index row + unique runs + 3 scalar rows (eq
      one-hots are lazy in-kernel compares against the index row).
    - keep: model-row -> kernel-row selection (ground rows + one per group).

    ``validate=False`` skips the param/tree invariant raises (used by the
    VMEM estimator, which must stay total on any model; the invariants are
    enforced when the kernel is actually built).
    """
    if not (model.pair_compress and model.ncand_pair):
        return [], None
    body_parent = np.asarray(model.body_parent)
    hinge_body = np.asarray(model.hinge_body)
    hinge_vadr = np.asarray(model.hinge_vadr)
    body_dofs = {b: [] for b in range(model.nbody)}
    for h in range(model.nhinge):
        body_dofs[int(hinge_body[h])].append(int(hinge_vadr[h]))
    for b, _qa, va in model.free_joints:
        body_dofs[b] = list(range(va, va + 6))

    def path_dofs(b):
        out = set()
        while b != 0:
            out.update(body_dofs[b])
            b = int(body_parent[b])
        return out

    can_geom = np.asarray(model.can_geom)
    can_geom2 = np.asarray(model.can_geom2)
    can_body = np.asarray(model.can_body)
    can_body2 = np.asarray(model.can_body2)
    can_friction = np.asarray(model.can_friction)
    can_solref = np.asarray(model.can_solref)
    can_solimp = np.asarray(model.can_solimp)
    can_margin = np.asarray(model.can_margin)
    can_invweight = np.asarray(model.can_invweight)
    geom_size = np.asarray(model.geom_size)

    ng = model.ncand - model.ncand_pair
    keep = list(range(ng))
    specs = []
    for start, size in model.pair_groups:
        rows = [ng + start + j for j in range(size)]
        r0 = rows[0]
        if validate:
            for r in rows[1:]:
                # spec.compile() splits groups on geom1/param boundaries;
                # real raises (not asserts) so the invariant survives
                # ``python -O``.
                if int(can_geom[r]) != int(can_geom[r0]):
                    raise FlyGymInternalError("pair group mixes geom1")
                if not (
                    np.array_equal(can_friction[r], can_friction[r0])
                    and np.array_equal(can_solref[r], can_solref[r0])
                    and np.array_equal(can_solimp[r], can_solimp[r0])
                    and can_margin[r] == can_margin[r0]
                ):
                    raise FlyGymInternalError("pair group mixes contact params")
        members = [(int(can_geom2[r]), int(can_body2[r])) for r in rows]
        # Per-DoF sign spec over the group's geom2 union: "all" (every
        # member moves this DoF — free/root joints — so the sign is the
        # STATIC -1 of an ordinary two-body row) or a tuple of contiguous
        # member-index runs, from which the winner mask is built.
        member_dofs = [path_dofs(b2) for _g2, b2 in members]
        dof_members = {}
        for j, dofs in enumerate(member_dofs):
            for d in dofs:
                dof_members.setdefault(d, []).append(j)
        g1_path = path_dofs(int(can_body[r0]))
        dof_sign_spec = {}
        for d, js in sorted(dof_members.items()):
            if d in g1_path:
                if validate:
                    # spec.compile() clears pair_compress for same-tree
                    # pairs; raise (not assert) if one slips through.
                    raise FlyGymInternalError(
                        "pair group geom2 shares DoFs with geom1 (same "
                        "kinematic tree) — compression assumes disjoint "
                        "trees (fly-fly contacts)"
                    )
                continue
            if len(js) == size:
                dof_sign_spec[d] = "all"
                continue
            runs = []
            lo = prev = js[0]
            for j in js[1:]:
                if j == prev + 1:
                    prev = j
                    continue
                runs.append((lo, prev))
                lo = prev = j
            runs.append((lo, prev))
            dof_sign_spec[d] = tuple(runs)
        # Sign rows are keyed by DISTINCT runs, not per DoF: every DoF on
        # the same body path sees the same member subtree, so e.g. a
        # coxa's three DoFs (and every more-proximal DoF of the same leg)
        # share one mask row. ``listed`` holds the unique runs in sorted
        # order; ``dof_sign_idx`` maps each run-listed DoF to its row.
        listed = sorted({s for s in dof_sign_spec.values() if s != "all"})
        run_idx = {runs: k for k, runs in enumerate(listed)}
        dof_sign_idx = {
            d: run_idx[s]
            for d, s in dof_sign_spec.items()
            if s != "all"
        }
        specs.append(
            dict(
                row0=r0,
                members=members,
                invw=[float(can_invweight[r, 0]) for r in rows],
                r2=[float(geom_size[g2, 0]) for g2, _b2 in members],
                h2=[float(geom_size[g2, 1]) for g2, _b2 in members],
                dof_sign_spec=dof_sign_spec,
                listed=listed,
                dof_sign_idx=dof_sign_idx,
                # Aux input rows per group: [winner index | per-unique-run
                # sign rows | r2 h2 invw]. Winner eq one-hots are lazy
                # in-kernel compares against the index row, NOT rows.
                n_rows=1 + len(listed) + 3,
            )
        )
        keep.append(r0)
    return specs, np.asarray(keep, np.int64)


def _pair_mask_rows(model) -> int:
    """Total winner-mask aux input rows (see _pair_group_specs.n_rows)."""
    specs, _keep = _pair_group_specs(model, validate=False)
    return sum(g["n_rows"] for g in specs)


# Headroom gate under the v5e's 128 MiB physical VMEM: models whose
# estimate exceeds this fall back to the vmapped jnp path. Raised
# 118 -> 124 on 2026-08-20 with the FIFTH hardware calibration point (the
# 204-DoF H0-matvec kernel: 107.48 MiB of register spill slots measured
# from its 4096-world K=8 OOM dump; B=128 K=1 compiled and ran)
# — each per-row-class coefficient now reproduces its dump to ~2 MiB, so
# 4 MiB of physical headroom covers the estimator error; rollout K
# selection is VMEM-aware against the same gate (_get_megastep_k).
_VMEM_GATE_MB = 124.0


def _stack_mb(model, h0_matvec: bool) -> float:
    """The value-stack part of the scoped-VMEM estimate (no I/O term)."""
    n_groups, _gmax, _kernel_ncand = _pair_comp_shape(model)
    npairs = model.nv + sum(len(c) for c in model.dof_chains)
    n_ground = model.ncand - model.ncand_pair
    if model.pair_compress and model.ncand_pair:
        n_pair_rows, n_winner_rows = 0, n_groups
    else:
        n_pair_rows, n_winner_rows = model.ncand_pair, 0
    # h0 coefficient measured 2026-08-20 on the 204-DoF ALL_POSSIBLE
    # kernel's OOM dump (107.48 MiB spill at npairs=3408, n_ground=110,
    # K=8 — the fori carry is inside the measurement, so no separate
    # K-carry term): (107.48 - 14 - 0.11*110) / 3408 = 0.0239.
    pair_coef = 0.0239 if h0_matvec else 0.028
    # Winner rows: 2.5 MiB/row measured 2026-08-19 with IN-KERNEL mask
    # rebuilds (55x55 preset, 248.96 MiB of which 223.82 register spill).
    # With masks precomputed out of the kernel and read lazily (2026-08-20
    # redesign) a winner row holds the same live state as an ordinary
    # two-body pair row whose comps stream — PROVISIONAL 1.2 MiB/row
    # pending a hardware measurement (scripts/dev/measure_kernel_vmem.py
    # on the 55x55 preset); recalibrate this coefficient from that dump.
    return (
        14.0
        + pair_coef * npairs
        + 0.11 * n_ground
        + 1.1 * n_pair_rows
        + 1.2 * n_winner_rows
    )


def _use_h0_matvec(model) -> bool:
    """Whether the kernel recovers M·x from the frozen LDL factor.

    In frozen-Hessian mode the Newton loop needs the mass matrix only for
    the matvecs Ma = M·a and Md = M·δ. When the model has NO cross-tree
    pair rows (ncand_pair == 0), the frozen Hessian is EXACTLY
    H0 = Mh + JᵀΣ0J + 1e-9·I (no fill-in was dropped), so
    M·x = H0·x − Jᵀ(Σ0·(Jx)) − 1e-9·x where H0·x rides the already-live
    LDL factor (two tree passes, see _tree_mul) and the J part reuses the
    per-candidate direction components the line search keeps anyway. Mh
    then dies right after the Hessian fill — the kernel's longest live
    range — which is what lets the 204-DoF ALL_POSSIBLE tree fit VMEM.

    Costs ~2x the ops per matvec (a few % of the kernel), so the mode is
    picked only when the plain estimate would gate the model off the
    kernel. FLYGYM_TPU_MEGASTEP_MATVEC=h0|pairs forces it for testing.
    Strict exact-Newton re-factors H per iteration (the factor is not
    frozen), so the identity does not apply there.
    """
    import os

    mode = os.environ.get("FLYGYM_TPU_MEGASTEP_MATVEC", "auto")
    if mode == "pairs":
        return False
    if model.solver_exact or model.ncand_pair or model.ncand == 0:
        return False
    if mode == "h0":
        return True
    return _est_scoped_mb(model, h0_matvec=False) > _VMEM_GATE_MB


def _est_scoped_mb(
    model, h0_matvec: "bool | None" = None, k_steps: int = 1,
    sublanes: int = SUBLANES,
) -> float:
    """Estimated Mosaic scoped-VMEM use of the kernel, in MiB.

    ``k_steps`` models the K-step fused kernel's extra double-buffered I/O
    tiles: (K-1)*nu additional ctrl input rows and (K-1)*nq qpos-trajectory
    output rows (the fori-loop carry is folded into the calibrated stack
    coefficients — the 204-DoF dump was measured at K=8).

    Two parts, both measured on the two-fly pair-row model (nv=144,
    ncand≈270, n_in=446, n_out=1611):

    - The value stack: Mosaic spills live lane values in full (8, 128) f32
      tiles (4 KiB each) regardless of the block's sublane count —
      measured 85.35 MiB at BOTH 8 and 4 sublanes, so shrinking the block
      never helps; the knob that matters is the
      ``xla_tpu_scoped_vmem_limit_kib`` flag (flygym_tpu/__init__.py sets
      112 MiB of the v5e's 128 MiB). The live set grows with the
      mass-matrix tree pairs (~nv) and the contact rows (~ncand); the
      single-fly kernel (nv=72, ncand≈110) needs more than libtpu's
      16 MiB default but fits 64.
    - Double-buffered per-block I/O: with more than one grid block the
      pipeline keeps 2x(n_in + n_out) (8, 128) tiles resident — the same
      kernel measures 101.36 MiB total at 4 grid blocks.
    """
    # Recalibrated 2026-08-19 on FOUR hardware points (Mosaic out-of-VMEM
    # dumps + one success): 204-DoF ALL_POSSIBLE 146.32 MiB (no pairs,
    # npairs=3408 — the live set tracks the mass-matrix TREE-PAIR count,
    # nv + sum of per-DoF ancestor-chain lengths, NOT nv); two-fly with
    # 49 uncompressed capsule-capsule rows 152.45 MiB (pair rows hold
    # two-body Jacobians over BOTH flies' path-DoF unions — ~1.1 MiB of
    # register pressure per row, 10x a ground row); two-fly 55x55
    # compressed 248.96 MiB (winner-blend rows rebuild geometry/sign
    # masks per use — ~2.5 MiB per winner row); ALL_BIOLOGICAL compiles
    # and runs (13.02M w/s), bounding the fit from below. Every
    # coefficient reproduces its dump to ~2 MiB.
    #
    # H0-matvec mode (see _use_h0_matvec): Mh dies right after the
    # Hessian fill instead of staying live across the whole Newton loop
    # (the kernel's longest live range: one lane per tree pair, plus its
    # share of Mosaic register-allocator pressure). The reduced
    # coefficient is PROVISIONAL pending a hardware measurement of the
    # 204-DoF kernel in this mode; if the compile still overruns, the
    # model gates back to the jnp path exactly as before.
    if h0_matvec is None:
        h0_matvec = _use_h0_matvec(model)
    stack = _stack_mb(model, h0_matvec=h0_matvec)
    n_groups, _gmax, kernel_ncand = _pair_comp_shape(model)
    # Compressed pair rows read their winner masks lazily from input rows
    # (one-hot eq + per-listed-DoF signs + 3 winner scalars per group,
    # expanded out-of-kernel) — they cost input-block I/O, not stack.
    n_terrain = 4 * kernel_ncand if model.has_hfield else 0
    n_wmask = _pair_mask_rows(model) if n_groups else 0
    K = int(k_steps)
    n_in = (
        model.nq
        + 2 * model.nv
        + K * model.nu
        + model.na
        + n_terrain
        + n_wmask
    )
    n_out = (
        (K - 1) * model.nq
        + model.nq
        + 2 * model.nv
        + model.na
        + 7 * model.nbody
        + 3 * model.nsite
        + model.nu
        + 16 * model.nsensor_contact
    )
    # The stack is sublane-INdependent (Mosaic pads spills to full
    # (8, 128) tiles — measured identical at 8 and 4 sublanes); only the
    # window I/O shrinks with a narrower block.
    io = 2 * (n_in + n_out) * (sublanes * LANE * 4) / 2**20
    return stack + io


# Fused-estimate threshold above which FLYGYM_TPU_MEGASTEP_STREAM=auto
# switches to the streaming contact emitter (_emit_contacts_stream).
# NOTE: an apparent "model-size performance cliff" that motivated the
# streaming variant turned out to be a measurement artifact (the timed
# rollout was compiling — rollout's n_steps is a static jit arg; see
# ROADMAP.md). Correctly measured, the fused kernel is fast for every
# supported model (ALL_BIOLOGICAL ~6M world-steps/s at 4096 worlds), so
# the default is fused everywhere and streaming is an opt-in that only
# trades ~1.2x vector ops for a smaller Mosaic value stack.
STREAM_ABOVE_MB = 60.0


def _est_stream_mb(model, sublanes: int = SUBLANES) -> float:
    """Estimated Mosaic scoped-VMEM use of the STREAMING kernel, in MiB.

    Live set: motion subspace S (6nv), body frames (7nbody), the three
    tree-sparse matrices Mh/H/Ld (~3 x pair_keys), solver vectors (~4nv),
    ~38 persistent lane scalars per contact candidate (incl. the hoisted
    D·jd line-search rows), plus the same double-buffered block I/O term
    as the fused kernel.
    """
    n_groups, _gmax, kernel_ncand = _pair_comp_shape(model)
    npairs = model.nv + sum(len(c) for c in model.dof_chains)
    lanes = (
        6 * model.nv
        + 7 * model.nbody
        + 3 * npairs
        + 4 * model.nv
        + 38 * kernel_ncand
    )
    # Winner-group stack term, calibrated on the 2026-08-20 55x55
    # hardware runs: at 8 sublanes the stream kernel used the FULL
    # 112.5 MiB scoped arena + 19.39 MiB of (single-buffered, B=128)
    # windows = 131.89 total (OOM > 128); at 4 sublanes (9.55 MiB
    # windows) it COMPILED AND RAN at the 127 MiB ceiling. The lazy
    # winner-mask reads cost Mosaic stack per mask row (the lane-model
    # above had the 55-group stack at 81.3 — ~31 MiB under the arena
    # cap); 0.0075 MiB/row makes the double-buffered-io estimate
    # reproduce the measured 4-sublane fit and 8-sublane miss (with
    # margin for the actuated variant's extra ctrl/actuator rows).
    wmask_stack = 0.0075 * (_pair_mask_rows(model) if n_groups else 0)
    # I/O part = fused estimate minus its (recalibrated) stack model.
    h0 = _use_h0_matvec(model)
    return 12.0 + lanes / 256.0 + wmask_stack + (
        _est_scoped_mb(model, h0_matvec=h0, sublanes=sublanes)
        - _stack_mb(model, h0_matvec=h0)
    )


def _stream_mode(model) -> bool:
    """Whether the kernel should use the streaming contact emitter.

    Default ("rescue"): fused — fast for every supported model once
    measured correctly (see STREAM_ABOVE_MB note) — UNLESS the fused
    estimate alone would gate the model off the kernel and the streaming
    estimate fits: then streaming trades ~1.2x vector ops for staying
    in-kernel at all, which beats the jnp fallback by an order of
    magnitude (the VMEM-wall rescue, 2026-08-20; targets the 55x55
    two-fly preset and 3-fly configs).
    FLYGYM_TPU_MEGASTEP_STREAM=1 forces streaming, =0 forces fused,
    =auto selects it for models whose fused value-stack estimate exceeds
    STREAM_ABOVE_MB.
    """
    import os

    mode = os.environ.get("FLYGYM_TPU_MEGASTEP_STREAM", "rescue")
    if mode == "1":
        return True
    if mode == "0":
        return False
    if mode == "auto":
        return _est_scoped_mb(model) > STREAM_ABOVE_MB
    # Rescue: streaming fits at EITHER block width (the 55x55 preset
    # only fits at 4 sublanes — see _kernel_sublanes).
    return _est_scoped_mb(model) > _VMEM_GATE_MB and (
        min(_est_stream_mb(model), _est_stream_mb(model, sublanes=4))
        <= _VMEM_GATE_MB
    )


def _est_kernel_mb_at(model, k_steps: int, sublanes: int) -> float:
    """Kernel estimate at an EXPLICIT block width (mode still resolved
    by _stream_mode)."""
    if _stream_mode(model):
        est = _est_stream_mb(model, sublanes=sublanes) + _kfuse_io_mb(
            model, k_steps
        )
    else:
        est = _est_scoped_mb(model, k_steps=k_steps, sublanes=sublanes)
    if k_steps > 1 and _pair_comp_shape(model)[0]:
        est += 12.2 * (k_steps - 1)  # see _est_kernel_mb
    return est


def _kernel_sublanes(model, k_steps: int = 1) -> int:
    """Block width the kernel will be built with: 8 sublanes (full VPU
    vregs) unless only the NARROW 4-sublane block fits the VMEM gate —
    halving the input/output window allocations at half the throughput
    (the Mosaic value stack is sublane-independent). First validated on
    the 55x55 stream kernel, 2026-08-20: 131.89 MiB at 8 sublanes
    (OOM), compiled and ran at 4. FLYGYM_TPU_MEGASTEP_SUBLANES forces a
    width."""
    import os

    ovr = os.environ.get("FLYGYM_TPU_MEGASTEP_SUBLANES")
    if ovr:
        return int(ovr)
    if _est_kernel_mb_at(model, k_steps, SUBLANES) <= _VMEM_GATE_MB:
        return SUBLANES
    if _est_kernel_mb_at(model, k_steps, 4) <= _VMEM_GATE_MB:
        return 4
    return SUBLANES  # gated anyway; caller falls back to jnp


def _kfuse_io_mb(model, k_steps: int) -> float:
    """Extra double-buffered I/O of K-step fusion: (K-1)*nu ctrl input
    rows + (K-1)*nq qpos-trajectory output rows."""
    return (
        2
        * (k_steps - 1)
        * (model.nu + model.nq)
        * (SUBLANES * LANE * 4)
        / 2**20
    )


def _est_kernel_mb(model, k_steps: int = 1) -> float:
    """Scoped-VMEM estimate of the kernel AS IT WOULD BE BUILT — resolves
    the fused/stream emitter choice AND the block width (8 vs narrow 4
    sublanes) exactly like make_megastep, so the gate
    (megastep_supported), the rollout K clamp (_get_megastep_k) and the
    per-kernel vmem_limit_bytes all agree.

    The K>1 term for pair-group kernels is calibrated on two 2026-08-20
    hardware points: the two-fly 49-pair kernel at K=4 OOM'd at
    147.40 MiB against a 122.9 estimate (+24.5 over three fused steps —
    the fori-loop carry interacts with the pair rows' two-body live set
    nonlinearly in Mosaic's allocator), while K=2 COMPILED AND RAN at
    4096 worlds (scripts/dev/probe_k2_pair.py: excess <= ~4 MiB for the
    one extra step — the growth is superlinear in K). The linear
    12.2/(K-1) term brackets both: it admits K=2 (measured good) and
    rejects K>=3 (unmeasured, trending toward the K=4 blowup)."""
    return _est_kernel_mb_at(model, k_steps, _kernel_sublanes(model, k_steps))


_EPS = 1e-9

# Bisection line-search schedule — must match the engine's
# _exact_linesearch (engine/contact.py) so emitter and engine trajectories
# stay in lockstep.
_LS_BISECT_ITERS = 8
_LS_ALPHA_MAX = 2.0

# ---------------------------------------------------------------------------
# Lane-vector math: 3-vectors and quaternions as python tuples of (L,) arrays
# ---------------------------------------------------------------------------


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _quat_to_mat(q):
    """Quaternion → 3x3 rotation as a tuple-of-tuples of lane vectors."""
    w, x, y, z = q
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


# -- constant-folded variants: the second operand is a python float tuple --
# Mosaic does not reliably fold multiplies by splat 0.0 / ±1.0, and the
# model's constant frames are full of them (63/70 body quats are identity,
# hinge axes are unit basis vectors, capsule quats have two zero
# components), so these emit only the nonzero terms at trace time.

_C_EPS = 1e-12


def _comb(terms, z):
    """Σ coef·val with exact-0 terms dropped and ±1 coefs multiply-free
    (the same fold rules as _mul_cf/_acc, which it delegates to)."""
    out = None
    for v, k in terms:
        k = float(k)
        out = _acc(out, _mul_cf(0.0 if abs(k) < _C_EPS else k, v))
    return z if out is None else out


def _is_ident_quat(c):
    return (
        abs(float(c[0]) - 1.0) < _C_EPS
        and abs(float(c[1])) < _C_EPS
        and abs(float(c[2])) < _C_EPS
        and abs(float(c[3])) < _C_EPS
    )


def _qmul_c(a, c, z):
    """a ∘ c with c a constant quaternion (python floats)."""
    if _is_ident_quat(c):
        return a
    aw, ax, ay, az = a
    cw, cx, cy, cz = (float(v) for v in c)
    return (
        _comb([(aw, cw), (ax, -cx), (ay, -cy), (az, -cz)], z),
        _comb([(aw, cx), (ax, cw), (ay, cz), (az, -cy)], z),
        _comb([(aw, cy), (ax, -cz), (ay, cw), (az, cx)], z),
        _comb([(aw, cz), (ax, cy), (ay, -cx), (az, cw)], z),
    )


def _cross_c(a, c, z):
    """a × c with c a constant 3-vector."""
    ax, ay, az = a
    cx, cy, cz = (float(v) for v in c)
    return (
        _comb([(ay, cz), (az, -cy)], z),
        _comb([(az, cx), (ax, -cz)], z),
        _comb([(ax, cy), (ay, -cx)], z),
    )


def _cross_cl(c, b, z):
    """c × b with c a constant 3-vector (python floats) and b lanes."""
    cx, cy, cz = (float(v) for v in c)
    return (
        _comb([(b[2], cy), (b[1], -cz)], z),
        _comb([(b[0], cz), (b[2], -cx)], z),
        _comb([(b[1], cx), (b[0], -cy)], z),
    )


def _mul_cf(coef, x):
    """coef·x where coef may be a python float (folded at trace time) or a
    lane value, and x a lane or None (structural zero). Returns None for
    an exactly-zero product — exact: 0·finite = 0 and 1·x = x bitwise."""
    if x is None or coef is None:
        return None
    if isinstance(coef, float):
        if coef == 0.0:
            return None
        if coef == 1.0:
            return x
        if coef == -1.0:
            return -x
        return x * coef
    return coef * x


def _acc(out, term):
    """Accumulate with None-as-zero skipping (out + 0 == out bitwise)."""
    if term is None:
        return out
    return term if out is None else out + term


def _qrot_c(q, c, z):
    """Rotate constant 3-vector c by lane quaternion q."""
    cx, cy, cz = (float(v) for v in c)
    if abs(cx) < _C_EPS and abs(cy) < _C_EPS and abs(cz) < _C_EPS:
        return (z, z, z)
    w, x, y, zc = q
    qv = (x, y, zc)
    t = _scale3(_cross_c(qv, (cx, cy, cz), z), 2.0)
    u = _cross(qv, t)
    out = []
    for comp, cv in zip(range(3), (cx, cy, cz)):
        val = w * t[comp] + u[comp]
        if abs(cv) >= _C_EPS:
            val = val + cv
        out.append(val)
    return tuple(out)


def _qmul_sp(a, b, z):
    """a ∘ b where b's components may be None (structurally zero lanes)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b

    def comb(terms):
        out = None
        for u, v, s in terms:
            if v is None:
                continue
            t = u * v
            if out is None:
                out = -t if s < 0 else t
            else:
                out = out - t if s < 0 else out + t
        return z if out is None else out

    return (
        comb([(aw, bw, 1), (ax, bx, -1), (ay, by, -1), (az, bz, -1)]),
        comb([(aw, bx, 1), (ax, bw, 1), (ay, bz, 1), (az, by, -1)]),
        comb([(aw, by, 1), (ax, bz, -1), (ay, bw, 1), (az, bx, 1)]),
        comb([(aw, bz, 1), (ax, by, 1), (ay, bx, -1), (az, bw, 1)]),
    )


# ---------------------------------------------------------------------------
# Static model snapshot (numpy / python — baked into the kernel)
# ---------------------------------------------------------------------------


class _Static:
    """Everything the emitter needs, as numpy arrays / python structures."""

    def __init__(self, model):
        f = lambda x: np.asarray(x)
        self.nbody = model.nbody
        self.nq, self.nv, self.nu, self.na = model.nq, model.nv, model.nu, model.na
        self.nhinge = model.nhinge
        self.nsite = model.nsite
        self.ncand = model.ncand
        self.condim = model.condim
        self.nrows = max(1, 2 * (model.condim - 1))
        self.timestep = float(model.timestep)
        self.solver_iterations = int(model.solver_iterations)
        self.solver_exact = bool(model.solver_exact)
        self.ref_body = int(model.ref_body)
        self.gravity = f(model.gravity)
        # Big models stream the contact section (see _emit_contacts_stream).
        self.stream = _stream_mode(model)
        # Recover M·x from the frozen LDL factor, freeing Mh's live range
        # (deep trees whose plain estimate would gate them off the kernel).
        self.matvec_h0 = _use_h0_matvec(model)

        self.body_parent = f(model.body_parent)
        self.body_pos = f(model.body_pos)
        self.body_quat = f(model.body_quat)
        self.body_ipos = f(model.body_ipos)
        self.body_iquat = f(model.body_iquat)
        self.body_mass = f(model.body_mass)
        self.body_inertia = f(model.body_inertia)
        self.body_hinge_idx = f(model.body_hinge_idx)

        # Topological order (parents before children), skipping world (0).
        order, depth = [], {0: 0}
        pending = list(range(1, self.nbody))
        while pending:
            nxt = [b for b in pending if int(self.body_parent[b]) in depth]
            for b in nxt:
                depth[b] = depth[int(self.body_parent[b])] + 1
                order.append(b)
            pending = [b for b in pending if b not in depth]
        self.topo = order

        self.hinge_body = f(model.hinge_body)
        self.hinge_slot = f(model.hinge_slot)
        self.hinge_axis = f(model.hinge_axis)
        self.hinge_qadr = f(model.hinge_qadr)
        self.hinge_vadr = f(model.hinge_vadr)
        self.hinge_stiffness = f(model.hinge_stiffness)
        self.hinge_damping = None  # via dof_damping
        self.hinge_springref = f(model.hinge_springref)

        self.dof_body = f(model.dof_body)
        self.dof_armature = f(model.dof_armature)
        self.dof_damping = f(model.dof_damping)
        self.dof_chains = [list(c) for c in model.dof_chains]
        self.free_joints = list(model.free_joints)
        free_dofs = set()
        self.free_dof_axis = {}
        for _b, _qa, va in self.free_joints:
            free_dofs.update(range(va, va + 6))
            for i in range(6):
                self.free_dof_axis[va + i] = i  # 0-2 translation, 3-5 rotation
        self.free_dofs = free_dofs

        # Hinges per body (sorted by slot) and dofs per body.
        self.body_hinges = {b: [] for b in range(self.nbody)}
        for h in range(self.nhinge):
            self.body_hinges[int(self.hinge_body[h])].append(h)
        for b in self.body_hinges:
            self.body_hinges[b].sort(key=lambda h: int(self.hinge_slot[h]))
        self.body_dofs = {b: [] for b in range(self.nbody)}
        for h in range(self.nhinge):
            self.body_dofs[int(self.hinge_body[h])].append(int(self.hinge_vadr[h]))
        for b, _qa, va in self.free_joints:
            self.body_dofs[b] = list(range(va, va + 6))

        # Per-dof root path (ancestors + self), and per-body affecting dofs.
        self.dof_path = [self.dof_chains[d] + [d] for d in range(self.nv)]
        anc_bodies = {0: []}
        for b in order:
            anc_bodies[b] = anc_bodies[int(self.body_parent[b])] + [b]
        self.body_path_dofs = {
            b: [d for ab in anc_bodies[b] for d in self.body_dofs[ab]]
            for b in range(self.nbody)
        }
        self.anc_bodies = anc_bodies

        # Tree-sparse matrix keys: (ancestor_or_self, dof).
        self.pair_keys = []
        for d in range(self.nv):
            for a_ in self.dof_path[d]:
                self.pair_keys.append((a_, d))
        # Leaves→root dof elimination order (by descending depth).
        self.elim_order = sorted(
            range(self.nv), key=lambda d: -len(self.dof_chains[d])
        )

        self.geom_body = f(model.geom_body)
        self.geom_pos = f(model.geom_pos)
        self.geom_quat = f(model.geom_quat)
        self.geom_size = f(model.geom_size)
        self.site_body = f(model.site_body) if self.nsite else np.zeros(0, int)
        self.site_pos = f(model.site_pos) if self.nsite else np.zeros((0, 3))

        self.can_geom = f(model.can_geom)
        self.can_body = f(model.can_body)
        self.can_geom2 = f(model.can_geom2)
        self.can_body2 = f(model.can_body2)
        self.ncand_pair = int(model.ncand_pair)
        self.can_end = f(model.can_end)
        self.can_friction = f(model.can_friction)
        self.can_solref = f(model.can_solref)
        self.can_solimp = f(model.can_solimp)
        self.can_margin = f(model.can_margin)
        self.can_adh_act = f(model.can_adh_act)
        self.can_sensor = f(model.can_sensor)
        self.can_invweight = f(model.can_invweight)
        self.ground_z = float(f(model.ground_pos)[2])
        self.has_hfield = bool(model.has_hfield)
        self.nsensor = model.nsensor_contact

        # Nearest-neighbor pair compression (PhysicsModel.pair_compress):
        # collapse each geom1 group to ONE kernel row whose geom2 is picked
        # at runtime (out-of-kernel argmin over the group, K-chunk-stale —
        # same staleness contract as the terrain planes). The candidate
        # table is re-sliced to ground rows + one row per group; the
        # group's members and per-DoF participation live here as static
        # structures the emitter blends with the winner-index eq-masks.
        self.pair_comp_groups, keep = _pair_group_specs(model)
        self.pair_keep = keep  # model-row -> kernel-row selection
        if self.pair_comp_groups:
            ng = self.ncand - self.ncand_pair
            self.can_geom = self.can_geom[keep]
            self.can_body = self.can_body[keep]
            self.can_geom2 = self.can_geom2[keep]
            self.can_body2 = self.can_body2[keep]
            self.can_end = self.can_end[keep]
            self.can_friction = self.can_friction[keep]
            self.can_solref = self.can_solref[keep]
            self.can_solimp = self.can_solimp[keep]
            self.can_margin = self.can_margin[keep]
            self.can_adh_act = self.can_adh_act[keep]
            self.can_sensor = self.can_sensor[keep]
            self.can_invweight = self.can_invweight[keep]
            self.ncand_pair = len(self.pair_comp_groups)
            self.ncand = ng + self.ncand_pair

        # Candidates grouped by adhesion actuator / sensor slot (static).
        self.adh_groups = {}
        for c in range(self.ncand):
            a_ = int(self.can_adh_act[c])
            if a_ >= 0:
                self.adh_groups.setdefault(a_, []).append(c)
        self.sensor_groups = {s: [] for s in range(self.nsensor)}
        for c in range(self.ncand):
            s = int(self.can_sensor[c])
            if s >= 0:
                self.sensor_groups[s].append(c)

        self.act_kind = f(model.act_kind)
        self.act_hinge = f(model.act_hinge)
        self.act_gain = f(model.act_gain)
        self.act_kv = f(model.act_kv)
        self.act_ctrlrange = f(model.act_ctrlrange)
        self.act_ctrllimited = f(model.act_ctrllimited)
        self.act_forcerange = f(model.act_forcerange)
        self.act_forcelimited = f(model.act_forcelimited)
        self.act_actadr = f(model.act_actadr)
        self.act_dynprm = f(model.act_dynprm)
        self.act_muscleprm = f(model.act_muscleprm)
        self.act_lengthrange = f(model.act_lengthrange)
        self.act_acc0 = f(model.act_acc0)


def maybe_make_megastep(
    model,
    *,
    mesh=None,
    world_axis: str = "world",
    state_template=None,
    env: bool = True,
):
    """The ONE gating policy for the mega-step kernel, shared by
    Simulation, BatchSimulation, and VectorFlyEnv (previously triplicated).

    Returns a batched step function, or None when the kernel should not be
    used: opted out (FLYGYM_TPU_MEGASTEP=0), unsupported model, non-TPU
    backend without FLYGYM_TPU_MEGASTEP_INTERPRET=1, or a build error.

    The returned function also carries ``interpret_mode`` (bool): interpret
    builds stay UNJITTED (the kernel unrolls to ~1e5 ops; XLA-CPU-compiling
    that takes tens of minutes) — callers must keep them out of jitted
    scans and use them for per-call stepping only.
    """
    import os

    import jax as _jax

    if env and os.environ.get("FLYGYM_TPU_MEGASTEP", "1") == "0":
        return None
    interpret = os.environ.get("FLYGYM_TPU_MEGASTEP_INTERPRET", "0") == "1"
    try:
        if not (_jax.default_backend() == "tpu" or interpret):
            return None
        if not megastep_supported(model):
            return None
        if mesh is None:
            fn = make_megastep(model, interpret=interpret)
        else:
            fn = make_megastep_sharded(
                model, mesh, world_axis, state_template, interpret=interpret
            )
        fn.interpret_mode = interpret
        return fn
    except Exception:
        return None


def megastep_supported(model) -> bool:
    """Mega-kernel covers Newton-solver models (the engine default).

    Heightfield terrain is handled by sampling per-candidate local ground
    planes (height + normal) OUTSIDE the kernel from the previous step's
    cached FK — candidates move ~1e-3 mm/step vs ~0.25 mm terrain cells, so
    the one-step-stale sample is far below contact resolution.

    Capsule-capsule pair rows (fly-fly contacts) run in-kernel: closest
    points between the two world-frame segments, dynamic contact frames,
    and two-body (±1 signed) Jacobian rows over the union of both flies'
    path DoFs. Cross-tree Hessian fill-in is dropped — identical to the
    jnp path, whose tree-LDL factor reads only tree-pattern entries (the
    gradient stays exact; Newton is approximate-Hessian + exact line
    search).

    The kernel processes EVERY candidate (no top-K compression), so its
    Mosaic scoped-VMEM use grows with the model (see :func:`_est_scoped_mb`);
    models estimated past the limit fall back to the jnp path, which
    top-K-compresses to ncon before the solver. Oversized fly-fly pair sets
    are handled by nearest-neighbor pair compression (PhysicsModel.
    pair_compress, auto for >= 512 pair rows): the kernel emits ONE row per
    geom1 group whose geom2 is the group's runtime winner, sampled out of
    the kernel (K-chunk-stale, like the terrain planes) and blended with
    eq-masks. The eq/sign masks and winner scalars are FUNCTIONS OF THE
    CHUNK-STALE WINNER ONLY, so they are expanded out of the kernel
    (sample_planes) into input rows the emitter reads lazily at each use
    point: 2026-08-19 hardware measured the previous IN-KERNEL mask
    rebuilds at 248.96 MiB on the 55x55 two-fly preset (223.82 MiB of
    Mosaic register spill slots — the where-chain rebuilds multiplied
    register pressure by n_groups x gmax), which the input-row design
    converts into a bounded, double-buffered I/O term. Small EXPLICIT
    pair sets run
    in-kernel uncompressed at ~1.1 MiB of register pressure per row
    (a 49-row set measured 152.45 MiB — over budget; ~16 rows fit).

    The strict-parity exact-Newton mode (model.solver_exact) runs
    in-kernel: the Hessian is re-filled and re-factored from the current
    active set at every Newton iteration, mirroring the engine's
    _solve_primal_newton. The PGS cross-check solver stays on the jnp
    path (different algorithm, used for solver-validation only).
    """
    if model.solver_type == "pgs":
        return False
    if getattr(model, "welds", ()):
        # Soft-weld tethers (TetheredWorld(weld="soft")) stay on the jnp
        # path: a niche single-fly configuration, not a batch perf path.
        return False
    # Headroom under the 128 MiB physical VMEM (2026-08-19 recalibration;
    # see _est_scoped_mb for the four hardware calibration points). Models
    # with no pair rows whose plain estimate exceeds the gate get one more
    # chance through the H0-matvec mode (_use_h0_matvec), which frees the
    # Mh live range; _est_scoped_mb resolves that mode automatically, and
    # _est_kernel_mb resolves the fused/stream emitter choice (incl. the
    # stream-rescue path) exactly as make_megastep would build it.
    return _est_kernel_mb(model) <= _VMEM_GATE_MB


def vmem_gated(model) -> bool:
    """True when the model is kernel-ELIGIBLE but fails only the VMEM gate.

    Used by BatchSimulation to fence the jnp-fallback compile pathology:
    the 204-DoF ALL_POSSIBLE fallback at 4096 worlds hit a >40-minute XLA
    compile on TPU (2026-08-20, abandoned) — exactly the models this
    returns True for are the ones whose fallback programs are big enough
    to risk it, so their large-batch rollouts are warned about and
    auto-split into world chunks (FLYGYM_TPU_FALLBACK_MAX_WORLDS).
    """
    if model.solver_type == "pgs" or getattr(model, "welds", ()):
        return False  # gated for a feature reason, not size
    return not megastep_supported(model)


# ---------------------------------------------------------------------------
# The emitter: one physics step over lane vectors
# ---------------------------------------------------------------------------


def _wmask_from_widx(st: "_Static", widx):
    """Adapt per-group winner-index lane values into the mask-dict form.

    The Pallas kernel feeds PRECOMPUTED mask rows (winner one-hots, per-DoF
    sign masks, winner-selected r2/h2/invw — all functions of the
    chunk-stale winner index only), read lazily from the input block at
    each use. Direct :func:`emit_step` callers (tests, eager cross-checks)
    pass raw winner indices instead and get the same masks computed from
    ``w`` inline — identical values, CSE'd by XLA outside Mosaic.
    """
    out = []
    for g, grp in enumerate(st.pair_comp_groups):
        w = widx[g]
        nmem = len(grp["members"])
        eq = [
            (lambda j=j, w=w: jnp.where(w == float(j), 1.0, 0.0))
            for j in range(nmem)
        ]

        def _sel(vals, w=w):
            acc = None
            for j, val in enumerate(vals):
                t = jnp.where(w == float(j), float(val), 0.0)
                acc = t if acc is None else acc + t
            return acc

        run_masks = []
        for runs in grp["listed"]:

            def _mask(runs=runs, w=w):
                acc = None
                for lo, hi in runs:
                    t = (
                        jnp.where(w == float(lo), 1.0, 0.0)
                        if lo == hi
                        else jnp.where(
                            (w >= float(lo)) & (w <= float(hi)), 1.0, 0.0
                        )
                    )
                    acc = t if acc is None else acc + t
                return acc

            run_masks.append(_mask)
        sign = {d: run_masks[k] for d, k in grp["dof_sign_idx"].items()}
        out.append(
            dict(
                eq=eq,
                sign=sign,
                r2=(lambda vals=grp["r2"], s=_sel: s(vals)),
                h2=(lambda vals=grp["h2"], s=_sel: s(vals)),
                invw=(lambda vals=grp["invw"], s=_sel: s(vals)),
            )
        )
    return out


def emit_step(st: _Static, q, v, ctrl, act, warm, terrain=None, widx=None):
    """Emit one physics step.

    Args:
        st: static model snapshot.
        q, v, ctrl, act, warm: lists of lane vectors (len nq/nv/nu/na/nv).
        terrain: per-candidate local ground planes [(h, nx, ny, nz)] of lane
            vectors (heightfield worlds; None = flat plane at ground_z).
        widx: winner-mask dicts (one per compressed pair group, the kernel's
            lazy input-row readers), or raw per-group winner-index lane
            vectors (adapted via :func:`_wmask_from_widx`).

    Returns dict with lists of lane vectors: qpos, qvel, act, qacc,
    xpos (nbody of 3-tuples), xquat (nbody of 4-tuples), site_xpos,
    actuator_force, sensordata (nsensor of 16).
    """
    z = jnp.zeros_like(q[0])
    one = jnp.ones_like(q[0])
    dt = st.timestep
    if widx and not isinstance(widx[0], dict):
        widx = _wmask_from_widx(st, widx)

    # ---------------- FK: sequential unrolled tree recursion --------------
    xpos = [None] * st.nbody
    xquat = [None] * st.nbody
    xpos[0] = (z, z, z)
    xquat[0] = (one, z, z, z)
    hinge_xaxis = [None] * st.nhinge
    free_bodies = {b for b, _qa, _va in st.free_joints}
    free_qadr = {b: qa for b, qa, _va in st.free_joints}

    for b in st.topo:
        p = int(st.body_parent[b])
        if b in free_bodies:
            qa = free_qadr[b]
            xpos[b] = (q[qa], q[qa + 1], q[qa + 2])
            xquat[b] = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
            continue
        bq = st.body_quat[b]
        cur = _qmul_c(xquat[p], bq, z)
        for h in st.body_hinges[b]:
            ax = st.hinge_axis[h]
            # World hinge axis uses the rotation accumulated before the hinge.
            a_w = _qrot_c(cur, ax, z)
            hinge_xaxis[h] = a_w
            ang = q[int(st.hinge_qadr[h])]
            half = 0.5 * ang
            c_, s_ = jnp.cos(half), jnp.sin(half)
            # Hinge axes are (possibly sign-flipped) basis vectors: fold the
            # structural zeros / ±1s of the local rotation quaternion.
            hq = [c_, None, None, None]
            for j in range(3):
                aj = float(ax[j])
                if abs(aj) < _C_EPS:
                    continue
                hq[j + 1] = (
                    s_ if aj == 1.0 else (-s_ if aj == -1.0 else s_ * aj)
                )
            cur = _qmul_sp(cur, hq, z)
        xquat[b] = cur
        bp = st.body_pos[b]
        if max(abs(float(v)) for v in bp) < _C_EPS:
            xpos[b] = xpos[p]
        else:
            xpos[b] = _add3(xpos[p], _qrot_c(xquat[p], bp, z))

    ref = xpos[st.ref_body]

    # ---------------- motion subspace S (per dof: 6 lane vectors) ---------
    # S[d] = (angular(3), linear(3)) world Plücker at ref.
    S = [None] * st.nv
    for h in range(st.nhinge):
        b = int(st.hinge_body[h])
        a_w = hinge_xaxis[h]
        anchor = _sub3(xpos[b], ref)
        lin = _cross(anchor, a_w)
        S[int(st.hinge_vadr[h])] = (a_w, lin)
    for b, _qa, va in st.free_joints:
        p_ = _sub3(xpos[b], ref)
        for i in range(3):
            e = [z, z, z]
            e[i] = one
            S[va + i] = ((z, z, z), tuple(e))
        for i in range(3):
            e = (one if i == 0 else z, one if i == 1 else z, one if i == 2 else z)
            S[va + 3 + i] = (e, _cross(p_, e))

    # ---------------- velocities / bias accelerations (topo) --------------
    # cvel[b] = cvel[parent] + Σ_{d ∈ dofs(b)} S_d v_d
    # cacc[b] = cacc[parent] + Σ_{d ∈ hinge dofs(b)} cvel_before(d) ×̂ S_d v_d
    #           (+ exact free-joint term (0; v×ω))
    zero6 = ((z, z, z), (z, z, z))

    def m6_add(a, b_):
        return (_add3(a[0], b_[0]), _add3(a[1], b_[1]))

    def m6_scale(a, s):
        return (_scale3(a[0], s), _scale3(a[1], s))

    def m6_cross(m, o):
        w_, v_ = m
        ow, ov = o
        return (_cross(w_, ow), _add3(_cross(w_, ov), _cross(v_, ow)))

    cvel = [zero6] * st.nbody
    cacc = [zero6] * st.nbody
    for b in st.topo:
        p = int(st.body_parent[b])
        vel = cvel[p]
        acc = cacc[p]
        if b in free_bodies:
            va = st.body_dofs[b][0]
            for i in range(6):
                vel = m6_add(vel, m6_scale(S[va + i], v[va + i]))
            vlin = (v[va], v[va + 1], v[va + 2])
            omg = (v[va + 3], v[va + 4], v[va + 5])
            acc = m6_add(acc, ((z, z, z), _cross(vlin, omg)))
        else:
            for d in st.body_dofs[b]:
                sd = m6_scale(S[d], v[d])
                acc = m6_add(acc, m6_cross(vel, sd))
                vel = m6_add(vel, sd)
        cvel[b] = vel
        cacc[b] = acc

    # ---------------- spatial inertias (21 unique entries, symmetric) -----
    # I = [[Ī + m c×c×ᵀ, m c×], [m c×ᵀ, m·1]] about ref, world axes.
    # Stored as full 6x6 tuple-of-tuples for clarity (entries shared).
    I_body = [None] * st.nbody
    for b in st.topo:
        iq = st.body_iquat[b]
        qi = _qmul_c(xquat[b], iq, z)
        R = _quat_to_mat(qi)
        I1, I2, I3 = (float(x) for x in st.body_inertia[b])
        # Ī = R diag(I) Rᵀ
        Ibar = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(i, 3):
                Ibar[i][j] = (
                    R[i][0] * R[j][0] * I1
                    + R[i][1] * R[j][1] * I2
                    + R[i][2] * R[j][2] * I3
                )
                Ibar[j][i] = Ibar[i][j]
        m = float(st.body_mass[b])
        ip = st.body_ipos[b]
        if max(abs(float(v)) for v in ip) < _C_EPS:
            com = xpos[b]
        else:
            com = _add3(xpos[b], _qrot_c(xquat[b], ip, z))
        c = _sub3(com, ref)
        cx, cy, cz = c
        # m c× c×ᵀ = m (|c|² δ - c cᵀ)
        c2 = cx * cx + cy * cy + cz * cz
        TL = [
            [
                Ibar[0][0] + m * (c2 - cx * cx),
                Ibar[0][1] - m * cx * cy,
                Ibar[0][2] - m * cx * cz,
            ],
            [None, Ibar[1][1] + m * (c2 - cy * cy), Ibar[1][2] - m * cy * cz],
            [None, None, Ibar[2][2] + m * (c2 - cz * cz)],
        ]
        TL[1][0], TL[2][0], TL[2][1] = TL[0][1], TL[0][2], TL[1][2]
        # m c× (top-right block; bottom-left is its transpose)
        TR = [
            [z, -m * cz, m * cy],
            [m * cz, z, -m * cx],
            [-m * cy, m * cx, z],
        ]
        I_body[b] = (TL, TR, m)

    def I_mul(I, m6):
        """Spatial inertia times motion vector → force vector (n(3), f(3))."""
        TL, TR, m_ = I
        w_, v_ = m6
        n = tuple(
            TL[i][0] * w_[0] + TL[i][1] * w_[1] + TL[i][2] * w_[2]
            + TR[i][0] * v_[0] + TR[i][1] * v_[1] + TR[i][2] * v_[2]
            for i in range(3)
        )
        f = tuple(
            TR[0][i] * w_[0] + TR[1][i] * w_[1] + TR[2][i] * w_[2] + m_ * v_[i]
            for i in range(3)
        )
        return (n, f)

    # ---------------- composite inertias (reverse topo) -------------------
    # Composite = sum of descendants' I; accumulate child into parent.
    Icomp = [
        (
            [[e for e in row] for row in I_body[b][0]] if I_body[b] else None,
            [[e for e in row] for row in I_body[b][1]] if I_body[b] else None,
            I_body[b][2] if I_body[b] else None,
        )
        if I_body[b]
        else None
        for b in range(st.nbody)
    ]
    for b in reversed(st.topo):
        p = int(st.body_parent[b])
        if p == 0:
            continue
        TLp, TRp, mp = Icomp[p]
        TLb, TRb, mb = Icomp[b]
        for i in range(3):
            for j in range(3):
                TLp[i][j] = TLp[i][j] + TLb[i][j]
                TRp[i][j] = TRp[i][j] + TRb[i][j]
        Icomp[p] = (TLp, TRp, mp + mb)

    # ---------------- CRBA: tree-sparse mass matrix ------------------------
    # M[a, d] = S_a · (I^C_{body(d)} S_d) for a ancestor-or-self of d.
    def dof_body_of(d):
        return int(st.dof_body[d])

    F = [I_mul(Icomp[dof_body_of(d)], S[d]) for d in range(st.nv)]

    def m6_dot(a, b_):
        return _dot3(a[0], b_[0]) + _dot3(a[1], b_[1])

    def m6_dot_free(a_, Fd):
        """S[a_]·F with the free joint's constant Plücker parts folded:
        translation (S = (0, e_i)) is a pick of F's linear part; rotation
        (S = (e_j, p×e_j)) is a pick plus one 3-dot. Bit-exact vs the
        dense dot (only 0/1 lane multiplies are elided)."""
        fa = st.free_dof_axis.get(a_)
        if fa is None:
            return m6_dot(S[a_], Fd)
        if fa < 3:
            return Fd[1][fa]
        return Fd[0][fa - 3] + _dot3(S[a_][1], Fd[1])

    Mh = {}
    for a_, d in st.pair_keys:
        val = m6_dot_free(a_, F[d])
        if a_ == d:
            val = val + float(st.dof_armature[d]) + dt * float(st.dof_damping[d])
        Mh[(a_, d)] = val

    # ---------------- RNEA bias (reverse-topo force accumulation) ---------
    g = tuple(float(v) for v in st.gravity)
    f_sub = [None] * st.nbody
    for b in st.topo:
        glin = tuple(
            cacc[b][1][k] - g[k] if abs(g[k]) >= _C_EPS else cacc[b][1][k]
            for k in range(3)
        )
        acc = (cacc[b][0], glin)
        Ia = I_mul(I_body[b], acc)
        Iv = I_mul(I_body[b], cvel[b])
        w_, v_ = cvel[b]
        n_, fl_ = Iv
        fc = (_add3(_cross(w_, n_), _cross(v_, fl_)), _cross(w_, fl_))
        f_sub[b] = m6_add(Ia, fc)
    for b in reversed(st.topo):
        p = int(st.body_parent[b])
        if p != 0:
            f_sub[p] = m6_add(f_sub[p], f_sub[b])
    qfrc_bias = [m6_dot_free(d, f_sub[dof_body_of(d)]) for d in range(st.nv)]

    # ---------------- passive + actuator forces ---------------------------
    qfrc = [-float(st.dof_damping[d]) * v[d] - qfrc_bias[d] for d in range(st.nv)]
    for h in range(st.nhinge):
        k = float(st.hinge_stiffness[h])
        if k:
            d = int(st.hinge_vadr[h])
            qfrc[d] = qfrc[d] - k * (q[int(st.hinge_qadr[h])] - float(st.hinge_springref[h]))

    actuator_force = [z] * st.nu
    c_clamped = [None] * st.nu
    from flygym_tpu.engine.model import ActKind

    for u in range(st.nu):
        c_ = ctrl[u]
        if st.act_ctrllimited[u] > 0:
            c_ = jnp.clip(c_, float(st.act_ctrlrange[u, 0]), float(st.act_ctrlrange[u, 1]))
        c_clamped[u] = c_
        kind = int(st.act_kind[u])
        gain, kv = float(st.act_gain[u]), float(st.act_kv[u])
        h = int(st.act_hinge[u])
        qh = q[int(st.hinge_qadr[h])] if h >= 0 else z
        vh = v[int(st.hinge_vadr[h])] if h >= 0 else z
        adr = int(st.act_actadr[u])
        a_slot = act[adr] if adr >= 0 else z
        if kind == ActKind.MOTOR:
            force = gain * c_
        elif kind == ActKind.POSITION:
            force = gain * (c_ - qh) - kv * vh
        elif kind == ActKind.VELOCITY:
            force = gain * (c_ - vh)
        elif kind == ActKind.INTVELOCITY:
            force = gain * (a_slot - qh) - kv * vh
        elif kind == ActKind.DAMPER:
            force = -gain * c_ * vh
        elif kind == ActKind.CYLINDER:
            force = gain * a_slot
        elif kind == ActKind.MUSCLE:
            force = _muscle_force_lane(st, u, qh, vh, a_slot, z)
        else:  # ADHESION: readout is the commanded force; solver applies it.
            actuator_force[u] = gain * c_
            continue
        if st.act_forcelimited[u] > 0:
            force = jnp.clip(
                force, float(st.act_forcerange[u, 0]), float(st.act_forcerange[u, 1])
            )
        actuator_force[u] = force
        if h >= 0:
            d = int(st.hinge_vadr[h])
            qfrc[d] = qfrc[d] + force

    # ---------------- contacts --------------------------------------------
    contacts_fn = _emit_contacts_stream if st.stream else _emit_contacts
    qacc, con = contacts_fn(
        st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
        terrain, widx,
    )

    # ---------------- integrate -------------------------------------------
    v_new = [v[d] + dt * qacc[d] for d in range(st.nv)]
    q_new = list(q)
    for h in range(st.nhinge):
        qa, va = int(st.hinge_qadr[h]), int(st.hinge_vadr[h])
        q_new[qa] = q[qa] + dt * v_new[va]
    for b, qa, va in st.free_joints:
        for i in range(3):
            q_new[qa + i] = q[qa + i] + dt * v_new[va + i]
        om = (v_new[va + 3], v_new[va + 4], v_new[va + 5])
        ang = jnp.sqrt(_dot3(om, om) + 1e-24) * dt
        scale = jnp.where(ang > 1e-12, jnp.sin(0.5 * ang) / jnp.maximum(ang / dt, 1e-12), 0.5 * dt)
        dq = (jnp.cos(0.5 * ang), om[0] * scale, om[1] * scale, om[2] * scale)
        quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
        nq_ = _qmul(dq, quat)
        norm = jnp.sqrt(nq_[0] ** 2 + nq_[1] ** 2 + nq_[2] ** 2 + nq_[3] ** 2)
        for i in range(4):
            q_new[qa + 3 + i] = nq_[i] / norm

    # Activation dynamics.
    act_new = list(act)
    for u in range(st.nu):
        adr = int(st.act_actadr[u])
        if adr < 0:
            continue
        kind = int(st.act_kind[u])
        c_ = c_clamped[u]
        a_ = act[adr]
        from flygym_tpu.engine.model import ActKind as _AK

        if kind == _AK.INTVELOCITY:
            act_new[adr] = a_ + dt * c_
        elif kind == _AK.CYLINDER:
            tau = max(float(st.act_dynprm[u, 0]), _EPS)
            act_new[adr] = a_ + dt * (c_ - a_) / tau
        elif kind == _AK.MUSCLE:
            cm = jnp.clip(c_, 0.0, 1.0)
            tau_act = max(float(st.act_dynprm[u, 0]), _EPS)
            tau_deact = max(float(st.act_dynprm[u, 1]), _EPS)
            tau = jnp.where(cm > a_, tau_act * (0.5 + 1.5 * a_), tau_deact / (0.5 + 1.5 * a_))
            act_new[adr] = jnp.clip(a_ + dt * (cm - a_) / jnp.maximum(tau, _EPS), 0.0, 1.0)

    # ---------------- sites + sensors --------------------------------------
    site_xpos = []
    for s in range(st.nsite):
        b = int(st.site_body[s])
        sp = st.site_pos[s]
        if max(abs(float(v)) for v in sp) < _C_EPS:
            site_xpos.append(xpos[b])
        else:
            site_xpos.append(_add3(xpos[b], _qrot_c(xquat[b], sp, z)))

    sensordata = _emit_sensors(st, con, z, one)

    return dict(
        qpos=q_new,
        qvel=v_new,
        act=act_new,
        qacc=qacc,
        xpos=xpos,
        xquat=xquat,
        site_xpos=site_xpos,
        actuator_force=actuator_force,
        sensordata=sensordata,
    )


def _muscle_force_lane(st, u, length, vel, a_slot, z):
    """MuJoCo muscle FLV force on lane vectors (port of actuation.py)."""
    prm = st.act_muscleprm[u]
    range0, range1 = float(prm[0]), float(prm[1])
    force, scale = float(prm[2]), float(prm[3])
    lmin, lmax, vmax = float(prm[4]), float(prm[5]), float(prm[6])
    fpmax, fvmax = float(prm[7]), float(prm[8])
    lr0, lr1 = float(st.act_lengthrange[u, 0]), float(st.act_lengthrange[u, 1])
    L0 = (lr1 - lr0) / max(range1 - range0, _EPS)
    L = range0 + (length - lr0) / max(L0, _EPS)
    V = vel / max(L0 * vmax, _EPS)
    acc0 = float(st.act_acc0[u]) if st.act_acc0.size else 1.0
    peak = scale / max(acc0, _EPS) if force < 0 else force

    a_ = 0.5 * (lmin + 1.0)
    b_ = 0.5 * (1.0 + lmax)
    x_rise = (L - lmin) / max(a_ - lmin, _EPS)
    x_plo = (1.0 - L) / max(1.0 - a_, _EPS)
    x_phi = (L - 1.0) / max(b_ - 1.0, _EPS)
    x_fall = (lmax - L) / max(lmax - b_, _EPS)
    gl = jnp.where(
        L <= lmin,
        0.0,
        jnp.where(
            L <= a_,
            0.5 * x_rise**2,
            jnp.where(
                L <= 1.0,
                1.0 - 0.5 * x_plo**2,
                jnp.where(L <= b_, 1.0 - 0.5 * x_phi**2, jnp.where(L <= lmax, 0.5 * x_fall**2, 0.0)),
            ),
        ),
    )
    y = fvmax - 1.0
    gv = jnp.where(
        V <= -1.0,
        0.0,
        jnp.where(V <= 0.0, (V + 1.0) ** 2, jnp.where(V <= y, fvmax - (y - V) ** 2 / max(y, _EPS), fvmax)),
    )
    gain = -peak * gl * gv
    x_ramp = (L - 1.0) / max(b_ - 1.0, _EPS)
    x_lin = (L - b_) / max(b_ - 1.0, _EPS)
    bias = jnp.where(
        L <= 1.0, 0.0, jnp.where(L <= b_, -peak * fpmax * 0.5 * x_ramp**2, -peak * fpmax * (0.5 + x_lin))
    )
    return gain * a_slot + bias


def _cand_geom(
    st, cidx, xpos, xquat, ref, terrain, z, one, geom_cache=None, widx=None
):
    """Per-candidate contact geometry + constraint-dynamics scalars.

    Rows [0, ncand - ncand_pair) are capsule-end vs ground (flat plane or
    terrain local planes); rows [ncand - ncand_pair, ncand) are
    capsule-capsule fly-fly pairs (closest points between the two world
    segments; normal from geom2 toward geom1 — lane port of
    contact.py:_segseg_closest / contact_candidates pair branch).

    Returns a dict of lane-vector scalars shared by the fused and
    streaming contact emitters: body/body2, path + per-DoF signs, dist,
    cpos, rel (= cpos - ref), active, imp, pos_err, b_gain, k_gain,
    frame ((n, t1, t2) or None for the axis-aligned flat frame), mu,
    invweight, adh, sensor.

    ``geom_cache`` (dict, shared across a step's candidates) memoizes the
    world geom pose: both endpoint candidates of a capsule — and every
    pair row touching it — reuse one ~45-op pose computation.
    """

    def geom_world_frame(gi):
        if geom_cache is not None and gi in geom_cache:
            return geom_cache[gi]
        b_ = int(st.geom_body[gi])
        gp = st.geom_pos[gi]
        gq = st.geom_quat[gi]
        if max(abs(float(v)) for v in gp) < _C_EPS:
            gpos = xpos[b_]
        else:
            gpos = _add3(xpos[b_], _qrot_c(xquat[b_], gp, z))
        gquat = _qmul_c(xquat[b_], gq, z)
        out = (b_, gpos, _qrot_c(gquat, (0.0, 0.0, 1.0), z))
        if geom_cache is not None:
            geom_cache[gi] = out
        return out

    ng_rows = st.ncand - st.ncand_pair
    gi = int(st.can_geom[cidx])
    b, gpos, zax = geom_world_frame(gi)
    radius = float(st.geom_size[gi, 0])
    halflen = float(st.geom_size[gi, 1])
    b2 = None
    pair_signs = None  # lane-valued geom2 DoF masks (compressed pair rows)
    invw = None  # lane-valued invweight (compressed pair rows)
    if cidx < ng_rows:
        end = float(st.can_end[cidx])
        ep = _add3(gpos, _scale3(zax, end * halflen))
        if terrain is None:
            # Flat ground: frame is axis-aligned (n = z, t1 = x, t2 = y).
            dist = ep[2] - st.ground_z - radius
            n_c = None
            cpos = (ep[0], ep[1], ep[2] - (radius + 0.5 * dist))
        else:
            h_c, nx_c, ny_c, nz_c = terrain[cidx]
            n_c = (nx_c, ny_c, nz_c)
            # Same signed-distance form as contact_candidates.
            dist = (ep[2] - h_c) * nz_c - radius
            cpos = _sub3(ep, _scale3(n_c, radius + 0.5 * dist))
    elif st.pair_comp_groups:
        # Compressed pair row: geom2 is the group's runtime winner. The
        # eq/sign masks and winner-selected scalars are functions of the
        # CHUNK-STALE WINNER INDEX ONLY, so they are precomputed OUT of
        # the kernel (sample_planes expands the winner argmin to one-hot
        # eq rows, per-DoF sign rows, and r2/h2/invw scalar rows) and read
        # lazily at each use point — a VMEM load per use instead of an
        # in-kernel where-chain rebuild, which Mosaic spilled at ~2.5 MiB
        # per winner row on the 55x55 two-fly preset (248.96 MiB total).
        grp = st.pair_comp_groups[cidx - ng_rows]
        wm = widx[cidx - ng_rows]
        members = grp["members"]
        gpos2 = (z, z, z)
        zax2 = (z, z, z)
        for j, (gi2_j, _b2_j) in enumerate(members):
            _bj, pj, zj = geom_world_frame(gi2_j)
            e = wm["eq"][j]()
            gpos2 = _add3(gpos2, _scale3(pj, e))
            zax2 = _add3(zax2, _scale3(zj, e))
        r2 = wm["r2"]()
        h2 = wm["h2"]()
        invw = wm["invw"]()
        # "all" DoFs take the ordinary static -1; run-listed DoFs stay
        # zero-arg callables (now a single precomputed-row read) evaluated
        # at each use point — nothing mask-shaped stays resident.
        pair_signs = {
            d: (1.0 if spec == "all" else wm["sign"][d])
            for d, spec in grp["dof_sign_spec"].items()
        }
    else:
        gi2 = int(st.can_geom2[cidx])
        b2, gpos2, zax2 = geom_world_frame(gi2)
        r2 = float(st.geom_size[gi2, 0])
        h2 = float(st.geom_size[gi2, 1])
    if cidx >= ng_rows:
        a0 = _sub3(gpos, _scale3(zax, halflen))
        d1 = _scale3(zax, 2.0 * halflen)  # a1 - a0
        b0 = _sub3(gpos2, _scale3(zax2, h2))
        d2 = _scale3(zax2, 2.0 * h2)
        r_ = _sub3(a0, b0)
        a_q = _dot3(d1, d1)
        e_q = _dot3(d2, d2)
        f_q = _dot3(d2, r_)
        c_q = _dot3(d1, r_)
        b_q = _dot3(d1, d2)
        denom = a_q * e_q - b_q * b_q
        s_p = jnp.where(
            denom > 1e-12,
            jnp.clip(
                (b_q * f_q - c_q * e_q) / jnp.maximum(denom, 1e-12),
                0.0,
                1.0,
            ),
            0.0,
        )
        t_p = jnp.where(
            e_q > 1e-12,
            (b_q * s_p + f_q) / jnp.maximum(e_q, 1e-12),
            0.0,
        )
        t_p = jnp.clip(t_p, 0.0, 1.0)
        s_p = jnp.where(
            a_q > 1e-12,
            jnp.clip(
                (b_q * t_p - c_q) / jnp.maximum(a_q, 1e-12), 0.0, 1.0
            ),
            0.0,
        )
        c1 = _add3(a0, _scale3(d1, s_p))
        c2 = _add3(b0, _scale3(d2, t_p))
        dvec = _sub3(c1, c2)
        dn = jnp.sqrt(jnp.maximum(_dot3(dvec, dvec), 1e-18))
        ok = dn > 1e-9
        n_c = (
            jnp.where(ok, dvec[0] / dn, 0.0),
            jnp.where(ok, dvec[1] / dn, 0.0),
            jnp.where(ok, dvec[2] / dn, 1.0),
        )
        dist = dn - radius - r2
        cpos = _sub3(c1, _scale3(n_c, radius + 0.5 * dist))
    margin = float(st.can_margin[cidx])
    active = dist < margin

    # solref / solimp constraint dynamics.
    solimp = st.can_solimp[cidx]
    dmin, dmax, width, mid, power = (float(x) for x in solimp)
    pos_err = jnp.minimum(dist - margin, 0.0)
    x_ = jnp.clip(jnp.abs(pos_err) / max(width, 1e-12), 0.0, 1.0)
    a_c = 1.0 / mid ** (power - 1.0)
    b_c = 1.0 / (1.0 - mid) ** (power - 1.0)
    y_ = jnp.where(x_ < mid, a_c * x_**power, 1.0 - b_c * (1.0 - x_) ** power)
    imp = jnp.clip(dmin + y_ * (dmax - dmin), 1e-4, 0.9999)
    tc, dr = float(st.can_solref[cidx][0]), float(st.can_solref[cidx][1])
    b_gain = 2.0 / (dmax * tc)
    k_gain = 1.0 / (dmax * dmax * tc * tc * dr * dr)

    # Contact frame rows [n, t1, t2] (port of _contact_frames).
    if n_c is not None:
        use_ey = jnp.abs(n_c[0]) > 0.9
        seed = (jnp.where(use_ey, 0.0, 1.0), jnp.where(use_ey, 1.0, 0.0), z)
        sn = _dot3(seed, n_c)
        t1 = _sub3(seed, _scale3(n_c, sn))
        t1n = jnp.maximum(jnp.sqrt(_dot3(t1, t1)), 1e-12)
        t1 = _scale3(t1, 1.0 / t1n)
        t2 = _cross(n_c, t1)
        frame = (n_c, t1, t2)
    else:
        frame = None

    # Two-body pair rows share the contact point: per-DoF sign is +1 when
    # the DoF moves body1, -1 when it moves body2 (contact.py:_affects).
    # Compressed pair rows have LANE-VALUED geom2 signs (-eq-mask of the
    # winner): the path spans the group's whole DoF union and
    # dof_components folds the masks per DoF.
    dof_signs = {d: 1.0 for d in st.body_path_dofs[b]}
    if b2 is not None:
        for d in st.body_path_dofs[b2]:
            dof_signs[d] = dof_signs.get(d, 0.0) - 1.0
    if pair_signs is not None:
        for d, m in sorted(pair_signs.items()):
            if callable(m):
                # Disjoint trees (asserted at build): no geom1 contribution
                # to fold in — the sign is just the negated lazy mask.
                dof_signs[d] = (lambda m=m: -m())
            else:
                dof_signs[d] = dof_signs.get(d, 0.0) - m
    path = [
        d
        for d, sgn in dof_signs.items()
        if not (isinstance(sgn, (int, float)) and sgn == 0.0)
    ]
    return dict(
        body=b,
        body2=b2,
        path=path,
        signs=dof_signs,
        dist=dist,
        cpos=cpos,
        rel=_sub3(cpos, ref),
        active=active,
        imp=imp,
        pos_err=pos_err,
        b_gain=b_gain,
        k_gain=k_gain,
        frame=frame,
        mu=tuple(float(x) for x in st.can_friction[cidx]),
        invweight=(
            invw if invw is not None else float(st.can_invweight[cidx, 0])
        ),
        adh=int(st.can_adh_act[cidx]),
        sensor=int(st.can_sensor[cidx]),
        no_comp_cache=pair_signs is not None,
    )


def _emit_contacts(
    st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
    terrain=None, widx=None,
):
    """Contact rows + tree-LDL + primal Newton on lane vectors (FUSED).

    Same structured solver as :func:`_emit_contacts_stream` (one shared
    implementation, :func:`_contacts_impl`), with the per-candidate
    direction components (jp_d = S_v[d] + S_w[d] x rel projected into the
    contact frame) computed ONCE and cached across the aref/Hessian pass,
    every Newton gradient fold, and every J.delta fold — the fewest
    emitted ops at the cost of ncand x ndirs x |path| extra lane values
    held live through the solve.
    """
    return _contacts_impl(
        st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
        terrain, widx, cache_comps=True,
    )



def _emit_contacts_stream(
    st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
    terrain=None, widx=None,
):
    """Contact solve with a STREAMED (low-live-set) row representation.

    Mathematically identical to :func:`_emit_contacts` (one shared
    implementation, :func:`_contacts_impl` — bit-identical modulo the
    comps caching, which only changes WHEN values are computed, not what).
    The fused emitter holds ncand x ndirs x |path| direction-component
    lane values live through the whole Newton solve; this variant stores
    only per-candidate scalars (contact frame, rel offset, D, aref, jar
    rows) and RECOMPUTES the per-DoF Jacobian components
    jp_d = S_v[d] + S_w[d] x rel from the motion subspace at each use —
    ~1.2x the emitted ops for a much smaller Mosaic value stack. Opt-in
    via ``_Static.stream`` (FLYGYM_TPU_MEGASTEP_STREAM); useful when a
    model's fused stack estimate approaches the VMEM ceiling.
    """
    return _contacts_impl(
        st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
        terrain, widx, cache_comps=False,
    )


def _contacts_impl(
    st, q, v, c_clamped, warm, xpos, xquat, S, ref, Mh, qfrc, z, one,
    terrain, widx, cache_comps,
):
    """Shared contact solver: candidate rows + tree-LDL + frozen-Hessian
    primal Newton with incremental iterates and bisection line search, on
    lane vectors. ``cache_comps`` picks the fused (cache the per-candidate
    direction components) vs streamed (recompute them at each use)
    evaluation order; everything else is one code path, so the two
    emitters cannot drift apart.
    """
    nv = st.nv

    def key(a_, b_):
        # Same tree-pair canonicalization as _emit_contacts (cross-tree
        # fill-in dropped).
        if a_ == b_:
            return (a_, b_)
        if a_ in st.dof_chains[b_]:
            return (a_, b_)
        if b_ in st.dof_chains[a_]:
            return (b_, a_)
        return None

    if st.ncand == 0:
        Ld, dd = _tree_ldl(st, Mh, z)
        qacc = _tree_solve(st, Ld, dd, qfrc)
        return qacc, None

    geom_cache = {}
    cons = [
        _cand_geom(
            st, cidx, xpos, xquat, ref, terrain, z, one, geom_cache, widx
        )
        for cidx in range(st.ncand)
    ]

    # Friction-direction tags per condim; rows are [n] (condim 1) or
    # [(tag, +1), (tag, -1) for tag in tags] — identical order to the
    # fused emitter's pyramid rows.
    if st.condim == 1:
        tags = []
    elif st.condim == 3:
        tags = ["t1", "t2"]
    elif st.condim == 4:
        tags = ["t1", "t2", "rn"]
    else:
        tags = ["t1", "t2", "rn", "rt1", "rt2"]

    def mu_of(c, tag):
        return c["mu"][0] if tag in ("t1", "t2") else (
            c["mu"][1] if tag == "rn" else c["mu"][2]
        )

    for c in cons:
        iw = c["invweight"]
        iw = max(iw, 1e-12) if isinstance(iw, float) else jnp.maximum(iw, 1e-12)
        R_ = (1.0 - c["imp"]) / c["imp"] * iw
        c["D"] = jnp.where(c["active"], 1.0 / jnp.maximum(R_, 1e-12), 0.0)

    # ---- adhesion split over active candidates (as in _emit_contacts) ----
    qfrc = list(qfrc)
    for u, group in st.adh_groups.items():
        gain = float(st.act_gain[u])
        total = gain * c_clamped[u]
        count = z
        for ci in group:
            count = count + jnp.where(cons[ci]["active"], 1.0, 0.0)
        per = total / jnp.maximum(count, 1.0)
        for ci in group:
            cons[ci]["adh_force"] = jnp.where(cons[ci]["active"], per, 0.0)
    for c in cons:
        c.setdefault("adh_force", z)

    def dof_components(c):
        """Recompute per-DoF Jacobian direction components for candidate c.

        Returns dict tag -> list aligned with c["path"]; tags "n","t1","t2"
        dot jp_d = S_v[d] + S_w[d] x rel into the contact frame, rotational
        tags dot S_w[d]. The flat frame picks components directly
        (n = z, t1 = x, t2 = y).

        Entries may be python FLOATS: the free joint's Plücker columns are
        constants (translation: jp = ±e_i exactly; rotation: S_w = ±e_j), so
        in the flat frame its components fold to 0/±1 at trace time — and
        every consumer (products, the gradient fold, the Hessian fill, the
        adhesion projection) folds them through _mul_cf/_acc. Exact: only
        multiplies by 0/±1 are elided, never reassociated.
        """
        frame = c["frame"]
        rel = c["rel"]
        comps = {t: [] for t in ["n"] + tags}

        def put(n_val, t1_val, t2_val, rn_val, rt1_val, rt2_val):
            # Rotational entries may be thunks so their ops are only
            # emitted when condim > 3 actually consumes them.
            comps["n"].append(n_val)
            if st.condim >= 3:
                comps["t1"].append(t1_val() if callable(t1_val) else t1_val)
                comps["t2"].append(t2_val() if callable(t2_val) else t2_val)
            if st.condim > 3:
                comps["rn"].append(rn_val() if callable(rn_val) else rn_val)
            if st.condim == 6:
                comps["rt1"].append(
                    rt1_val() if callable(rt1_val) else rt1_val
                )
                comps["rt2"].append(
                    rt2_val() if callable(rt2_val) else rt2_val
                )

        def pick_signed(vec3, idx, sgn):
            x = vec3[idx]
            if not isinstance(sgn, (int, float)):  # lane-valued sign
                return x * sgn
            return x if sgn == 1.0 else (-x if sgn == -1.0 else x * sgn)

        for d in c["path"]:
            sgn = c["signs"][d]
            if callable(sgn):  # lazy lane mask (compressed pair rows)
                sgn = sgn()
            sgn_static = isinstance(sgn, (int, float))
            fa = st.free_dof_axis.get(d)
            if fa is not None and fa < 3:
                # Free-joint translation: jp = sgn·e_fa, S_w = 0.
                if frame is None:
                    e = [0.0, 0.0, 0.0]
                    e[fa] = float(sgn)
                    put(e[2], e[0], e[1], 0.0, 0.0, 0.0)
                else:
                    n_c, t1, t2 = frame
                    put(
                        pick_signed(n_c, fa, sgn),
                        lambda: pick_signed(t1, fa, sgn),
                        lambda: pick_signed(t2, fa, sgn),
                        0.0, 0.0, 0.0,
                    )
                continue
            if fa is not None:
                # Free-joint rotation: S_w = e_j constant, S_v lanes.
                j = fa - 3
                _w_ignored, v_ = S[d]
                ec = [0.0, 0.0, 0.0]
                ec[j] = 1.0
                jp = _add3(v_, _cross_cl(ec, rel, z))
                if not sgn_static or sgn != 1.0:
                    jp = _scale3(jp, sgn)
                if frame is None:
                    sj = float(sgn)
                    put(jp[2], jp[0], jp[1],
                        sj if j == 2 else 0.0,
                        sj if j == 0 else 0.0,
                        sj if j == 1 else 0.0)
                else:
                    n_c, t1, t2 = frame
                    put(
                        _dot3(jp, n_c),
                        lambda: _dot3(jp, t1), lambda: _dot3(jp, t2),
                        lambda: pick_signed(n_c, j, sgn),
                        lambda: pick_signed(t1, j, sgn),
                        lambda: pick_signed(t2, j, sgn),
                    )
                continue
            w_, v_ = S[d]
            jp = _add3(v_, _cross(w_, rel))
            if not sgn_static or sgn != 1.0:
                jp = _scale3(jp, sgn)
                if st.condim > 3:
                    w_ = _scale3(w_, sgn)
            if frame is None:
                put(jp[2], jp[0], jp[1], w_[2], w_[0], w_[1])
            else:
                n_c, t1, t2 = frame
                put(
                    _dot3(jp, n_c),
                    lambda: _dot3(jp, t1), lambda: _dot3(jp, t2),
                    lambda: _dot3(w_, n_c), lambda: _dot3(w_, t1),
                    lambda: _dot3(w_, t2),
                )
        return comps

    def products(c, comps, vec):
        """J_dir · vec for each direction, as lane scalars (float comps
        fold: 0 terms vanish, ±1 terms add/subtract multiply-free)."""
        out = {}
        for t, col in comps.items():
            s_ = None
            for i, d in enumerate(c["path"]):
                s_ = _acc(s_, _mul_cf(col[i], vec[d]))
            out[t] = z if s_ is None else s_
        return out

    def row_combos(c, p):
        """Per-row scalar J_row·vec from per-direction products p."""
        if st.condim == 1:
            return [p["n"]]
        out = []
        for t in tags:
            mu = mu_of(c, t)
            out.append(p["n"] + mu * p[t])
            out.append(p["n"] - mu * p[t])
        return out

    def get_comps(c):
        """Direction components for candidate c — cached (fused) or
        recomputed at each use (streamed). Compressed pair rows
        (``no_comp_cache``) always stream: their |path| spans the whole
        DoF union of two flies, and caching ndirs x |path| lane values per
        row would alone blow the Mosaic value stack."""
        if not cache_comps or c.get("no_comp_cache"):
            return dof_components(c)
        cached = c.get("comps")
        if cached is None:
            cached = c["comps"] = dof_components(c)
        return cached

    def jar_grad_pass(c, a_vec, grad_con, with_hessian=None, with_aref=False,
                      use_cached_jar=False):
        """One streamed pass over candidate c at iterate a_vec.

        Computes jar rows (stored on c["jar_cur"]), accumulates the
        contact gradient contribution into grad_con, and optionally (first
        pass) the Hessian fill into with_hessian, aref rows, and the
        adhesion qfrc projection. With ``use_cached_jar`` the incrementally
        maintained ``c["jar_cur"]`` (jar + α·Jδ from the line search) is
        reused instead of re-projecting a_vec through the Jacobian.
        """
        comps = get_comps(c)
        if with_aref:
            pv = products(c, comps, v)
            vel_rows = row_combos(c, pv)
            krow = c["k_gain"]
            c["aref"] = [
                -c["b_gain"] * vel - krow * c["imp"] * c["pos_err"]
                for vel in vel_rows
            ]
            # Adhesion as applied generalized force along the normal rows.
            adh = c["adh_force"]
            for i, d in enumerate(c["path"]):
                term = _mul_cf(comps["n"][i], adh)
                if term is not None:
                    qfrc[d] = qfrc[d] - term
        if use_cached_jar:
            jars = c["jar_cur"]
        else:
            pa = products(c, comps, a_vec)
            jrows = row_combos(c, pa)
            jars = [jr - ar for jr, ar in zip(jrows, c["aref"])]
            c["jar_cur"] = jars
        D_ = c["D"]
        wk = [D_ * jnp.where(jr < 0.0, 1.0, 0.0) * jr for jr in jars]
        # grad contribution: J^T Σ_rows wk_r, folded per direction.
        if st.condim == 1:
            coef = {"n": wk[0]}
        else:
            coef_n = z
            for w_ in wk:
                coef_n = coef_n + w_
            coef = {"n": coef_n}
            for ti, t in enumerate(tags):
                coef[t] = mu_of(c, t) * (wk[2 * ti] - wk[2 * ti + 1])
        for i, d in enumerate(c["path"]):
            g = None
            for t, cf in coef.items():
                g = _acc(g, _mul_cf(comps[t][i], cf))
            if g is not None:
                grad_con[d] = grad_con[d] + g
        if with_hessian is not None:
            H = with_hessian
            wa = [D_ * jnp.where(jr < 0.0, 1.0, 0.0) for jr in jars]
            if st.condim == 1:
                W = wa[0]
                Bt = Wt = {}
            else:
                W = z
                for w_ in wa:
                    W = W + w_
                Bt, Wt = {}, {}
                for ti, t in enumerate(tags):
                    mu = mu_of(c, t)
                    Bt[t] = mu * (wa[2 * ti] - wa[2 * ti + 1])
                    Wt[t] = mu * mu * (wa[2 * ti] + wa[2 * ti + 1])
            path = c["path"]
            # The per-pair fill value is g_iᵀ Σ g_j with g = (n, d_t1, …)
            # and Σ the small symmetric weight matrix [[W, Bt…], [Bt, Wt
            # diag]]. Precomputing u_j = Σ g_j per path dof turns each
            # pair into one (1+T)-dot — ~19 → ~6 lane ops per pair at
            # condim 3, and the fill is O(|path|²) so this is the top
            # op-count block of the whole kernel.
            u_of = {}
            npath = len(path)
            u_of["n"] = [None] * npath
            for t in tags:
                u_of[t] = [None] * npath
            for j_ in range(npath):
                nj = comps["n"][j_]
                un = _mul_cf(nj, W)
                for t in tags:
                    dj = comps[t][j_]
                    un = _acc(un, _mul_cf(dj, Bt[t]))
                    u_of[t][j_] = _acc(
                        _mul_cf(nj, Bt[t]), _mul_cf(dj, Wt[t])
                    )
                u_of["n"][j_] = un
            for i_ in range(npath):
                for j_ in range(i_, npath):
                    k = key(path[i_], path[j_])
                    if k is None:  # cross-tree fill-in: dropped
                        continue
                    val = _mul_cf(comps["n"][i_], u_of["n"][j_])
                    for t in tags:
                        val = _acc(val, _mul_cf(comps[t][i_], u_of[t][j_]))
                    if val is None:  # exactly-zero fill (e.g. t1⊥t2 pair)
                        continue
                    H[k] = H[k] + val
        return comps

    def Mh_mul(a_vec):
        out = [None] * nv
        for d in range(nv):
            out[d] = Mh[(d, d)] * a_vec[d]
        for (a_, b_) in st.pair_keys:
            if a_ == b_:
                continue
            val = Mh[(a_, b_)]
            out[b_] = out[b_] + val * a_vec[a_]
            out[a_] = out[a_] + val * a_vec[b_]
        return out

    # ---- first pass: aref + adhesion + jars/grad at warm + Hessian ----
    a_vec = list(warm)
    H = dict(Mh)
    grad_con = [z] * nv
    for c in cons:
        jar_grad_pass(c, a_vec, grad_con, with_hessian=H, with_aref=True)
    for d in range(nv):
        H[(d, d)] = H[(d, d)] + 1e-9
    Ld, dd = _tree_ldl(st, H, z)

    if st.matvec_h0:
        # H0-matvec mode (frozen Hessian, ncand_pair == 0, see
        # _use_h0_matvec): no fill-in was dropped, so the frozen factor
        # satisfies H0 = Mh + JᵀΣ0J + 1e-9·I EXACTLY and
        # M·x = H0·x − Jᵀ(D·m0·(Jx)) − 1e-9·x. Mh's live range ends at
        # the fill above; only the Σ0 activity masks m0 (nrows lanes per
        # candidate) persist. fp note: this reassociates M·x vs Mh_mul
        # (tested ~1e-5 relative); the line search feeds back only the
        # sign of φ′, so trajectories stay within kernel-vs-jnp bands.
        for c in cons:
            c["m0"] = [
                jnp.where(jr < 0.0, 1.0, 0.0) for jr in c["jar_cur"]
            ]

        def M_mul(x):
            out = _tree_mul(st, Ld, dd, x)
            for c in cons:
                comps = get_comps(c)
                rows = row_combos(c, products(c, comps, x))
                wk0 = [c["D"] * m_ * r_ for m_, r_ in zip(c["m0"], rows)]
                if st.condim == 1:
                    coef = {"n": wk0[0]}
                else:
                    coef_n = z
                    for w_ in wk0:
                        coef_n = coef_n + w_
                    coef = {"n": coef_n}
                    for ti, t in enumerate(tags):
                        coef[t] = mu_of(c, t) * (
                            wk0[2 * ti] - wk0[2 * ti + 1]
                        )
                for i, d in enumerate(c["path"]):
                    g = None
                    for t, cf in coef.items():
                        g = _acc(g, _mul_cf(comps[t][i], cf))
                    if g is not None:
                        out[d] = out[d] - g
            return [out[d] - 1e-9 * x[d] for d in range(nv)]

    else:
        M_mul = Mh_mul

    # ---- Newton refinements (default: frozen Hessian; strict mode
    # (st.solver_exact) re-fills + re-factors the Hessian from the CURRENT
    # active set each iteration, matching the engine's exact-Newton path
    # (engine/contact.py _solve_primal_newton) — bisection/regula-falsi
    # line search, the engine's _exact_linesearch schedule) ----
    Ma = M_mul(a_vec)
    for it in range(max(st.solver_iterations, 1)):
        if it > 0:
            grad_con = [z] * nv
            if st.solver_exact:
                H = dict(Mh)
                for c in cons:
                    jar_grad_pass(
                        c, a_vec, grad_con, with_hessian=H,
                        use_cached_jar=True,
                    )
                for d in range(nv):
                    H[(d, d)] = H[(d, d)] + 1e-9
                Ld, dd = _tree_ldl(st, H, z)
            else:
                for c in cons:
                    jar_grad_pass(c, a_vec, grad_con, use_cached_jar=True)
        grad = [Ma[d] - qfrc[d] + grad_con[d] for d in range(nv)]
        delta = _tree_solve(st, Ld, dd, grad)
        delta = [-x for x in delta]

        Md = M_mul(delta)
        dMd = z
        gMd = z
        for d in range(nv):
            dMd = dMd + delta[d] * Md[d]
            gMd = gMd + a_vec[d] * Md[d] - qfrc[d] * delta[d]
        for c in cons:
            c["jd_cur"] = row_combos(c, products(c, get_comps(c), delta))
            # D·jd is invariant across the ~10 line-search evaluations —
            # hoist it (in streamed mode too: one extra per-row value live
            # through the search buys 10 fewer multiplies per row).
            c["djd_cur"] = [c["D"] * jd for jd in c["jd_cur"]]
        # Bisection line search with final regula falsi (same algorithm as
        # the engine's _exact_linesearch — see there for why bisection and
        # not 1D Newton: bisection feeds back only the SIGN of φ', keeping
        # engine and emitter trajectories in lockstep under ~1-ulp fp
        # differences).
        # t_ = D·jd is the same product the engine computes: m_ is exactly
        # 0/1, so the sums associate identically and engine and emitters
        # stay bit-comparable through the line search.
        def _dphi(alpha, at_zero=False):
            d_ = gMd if at_zero else gMd + alpha * dMd
            for c in cons:
                for jr, jd, t_ in zip(c["jar_cur"], c["jd_cur"], c["djd_cur"]):
                    ja = jr if at_zero else jr + alpha * jd
                    m_ = jnp.where(ja < 0.0, 1.0, 0.0)
                    d_ = d_ + m_ * t_ * ja
            return d_

        dlo = _dphi(z, at_zero=True)
        d0 = dlo
        dhi = _dphi(z + _LS_ALPHA_MAX)
        lo = z
        hi = z + _LS_ALPHA_MAX
        for _k in range(_LS_BISECT_ITERS):
            mid = 0.5 * (lo + hi)
            d_ = _dphi(mid)
            neg = d_ < 0.0
            lo = jnp.where(neg, mid, lo)
            dlo = jnp.where(neg, d_, dlo)
            hi = jnp.where(neg, hi, mid)
            dhi = jnp.where(neg, dhi, d_)
        t_ = -dlo / jnp.maximum(dhi - dlo, 1e-12)
        alpha_sel = lo + jnp.clip(t_, 0.0, 1.0) * (hi - lo)
        alpha_sel = jnp.where(d0 < 0.0, alpha_sel, 0.0)
        a_vec = [a_vec[d] + alpha_sel * delta[d] for d in range(nv)]
        Ma = [Ma[d] + alpha_sel * Md[d] for d in range(nv)]
        for c in cons:
            c["jar_cur"] = [
                jr + alpha_sel * jd
                for jr, jd in zip(c["jar_cur"], c["jd_cur"])
            ]

    # ---- final jars → per-row forces → per-contact frame forces ----
    for c in cons:
        jars = c["jar_cur"]
        D_ = c["D"]
        lam_c = [
            jnp.maximum(-D_ * jnp.where(jr < 0.0, 1.0, 0.0) * jr, 0.0)
            for jr in jars
        ]
        fn = z
        for l_ in lam_c:
            fn = fn + l_
        if st.condim >= 3:
            mu_s = c["mu"][0]
            ft1 = mu_s * (lam_c[0] - lam_c[1])
            ft2 = mu_s * (lam_c[2] - lam_c[3])
        else:
            ft1 = ft2 = z
        act_m = jnp.where(c["active"], 1.0, 0.0)
        c["f_frame"] = (fn * act_m, ft1 * act_m, ft2 * act_m)
        if c["frame"] is None:
            c["f_world"] = (ft1 * act_m, ft2 * act_m, fn * act_m)
        else:
            n_f, t1_f, t2_f = c["frame"]
            fw = tuple(
                fn * n_f[i] + ft1 * t1_f[i] + ft2 * t2_f[i] for i in range(3)
            )
            c["f_world"] = tuple(f * act_m for f in fw)

    qacc = a_vec
    return qacc, cons


def _tree_ldl(st, A, z):
    """Tree-sparse LDLᵀ of dict-matrix A (in-place on a copy).

    Returns (L dict {(anc, d): lane}, d list of lane diagonals).
    """
    A = dict(A)

    def key(a_, b_):
        if a_ == b_:
            return (a_, b_)
        return (a_, b_) if a_ in st.dof_chains[b_] else (b_, a_)

    L = {}
    dvec = [None] * st.nv
    for i in st.elim_order:
        chain = st.dof_chains[i]
        di = A[(i, i)]
        dvec[i] = di
        inv = 1.0 / di
        lis = {}
        for a_ in chain:
            lis[a_] = A[key(a_, i)] * inv
            L[(a_, i)] = lis[a_]
        for ia, a_ in enumerate(chain):
            ra = A[key(a_, i)]
            for b_ in chain[ia:]:
                k = key(a_, b_)
                A[k] = A[k] - lis[b_] * ra
    return L, dvec


def _tree_mul(st, L, dvec, x):
    """Multiply by the FACTORED matrix: H·x using only (L, d).

    _tree_solve computes H⁻¹b as M2·D⁻¹·M1·b (two unit-triangular tree
    passes around the diagonal scale), so H·x = M1⁻¹·D·M2⁻¹·x — the same
    two passes with inverted elementary ops applied in reverse order.
    2·|pair_keys| madds + nv multiplies; no residency beyond the factor
    (which the Newton loop keeps live anyway).
    """
    y = list(x)
    for i in st.elim_order:  # M2⁻¹: leaf-to-root, read-ancestors/write-self
        acc = y[i]
        for a_ in st.dof_chains[i]:
            acc = acc + L[(a_, i)] * y[a_]
        y[i] = acc
    for i in range(st.nv):
        y[i] = y[i] * dvec[i]
    for i in reversed(st.elim_order):  # M1⁻¹: root-to-leaf, write-ancestors
        yi = y[i]
        for a_ in st.dof_chains[i]:
            y[a_] = y[a_] + L[(a_, i)] * yi
    return y


def _tree_solve(st, L, dvec, b):
    """Solve LᵀDL x = b with the tree factor (port of engine/linalg.py)."""
    y = list(b)
    for i in st.elim_order:
        yi = y[i]
        for a_ in st.dof_chains[i]:
            y[a_] = y[a_] - L[(a_, i)] * yi
    for i in range(st.nv):
        y[i] = y[i] / dvec[i]
    for i in reversed(st.elim_order):
        acc = y[i]
        for a_ in st.dof_chains[i]:
            acc = acc - L[(a_, i)] * y[a_]
        y[i] = acc
    return y


def _emit_sensors(st, cons, z, one):
    """Per-leg 16-dim netforce sensors (port of engine/sensors.py)."""
    out = []
    for s in range(st.nsensor):
        group = [cons[c] for c in st.sensor_groups[s]] if cons else []
        if not group:
            out.append([z] * 16)
            continue
        w = [jnp.where(c["active"], 1.0, 0.0) for c in group]
        count = z
        for w_ in w:
            count = count + w_
        found = jnp.where(count > 0, 1.0, 0.0)
        ff = [z, z, z]
        for c, w_ in zip(group, w):
            for i in range(3):
                ff[i] = ff[i] + c["f_frame"][i] * w_
        fmag_sum = z
        posw = [z, z, z]
        posp = [z, z, z]
        for c, w_ in zip(group, w):
            fm = jnp.abs(c["f_frame"][0]) * w_
            fmag_sum = fmag_sum + fm
            for i in range(3):
                posw[i] = posw[i] + c["cpos"][i] * fm
                posp[i] = posp[i] + c["cpos"][i] * w_
        pos = [
            jnp.where(
                fmag_sum > 1e-12,
                posw[i] / jnp.maximum(fmag_sum, 1e-12),
                posp[i] / jnp.maximum(count, 1.0),
            )
            for i in range(3)
        ]
        if group[0]["frame"] is None:
            # Flat ground: weighted means coincide with the constants.
            normal = (z, z, one)
            tangent = (one, z, z)
        else:
            # Weighted mean normal, re-orthogonalized tangent (sensors.py).
            n_sum = [z, z, z]
            t_sum = [z, z, z]
            for c, w_ in zip(group, w):
                n_f, t1_f, _ = c["frame"]
                for i in range(3):
                    n_sum[i] = n_sum[i] + n_f[i] * w_
                    t_sum[i] = t_sum[i] + t1_f[i] * w_
            nn = jnp.sqrt(_dot3(tuple(n_sum), tuple(n_sum)))
            normal = tuple(
                jnp.where(nn > 1e-9, n_sum[i] / jnp.maximum(nn, 1e-12),
                          1.0 if i == 2 else 0.0)
                for i in range(3)
            )
            tdn = _dot3(tuple(t_sum), normal)
            t_sum = [t_sum[i] - tdn * normal[i] for i in range(3)]
            tn = jnp.sqrt(_dot3(tuple(t_sum), tuple(t_sum)))
            tangent = tuple(
                jnp.where(tn > 1e-9, t_sum[i] / jnp.maximum(tn, 1e-12),
                          1.0 if i == 0 else 0.0)
                for i in range(3)
            )
        t2 = _cross(normal, tangent)
        tw = [z, z, z]
        for c, w_ in zip(group, w):
            arm = _sub3(c["cpos"], tuple(pos))
            tq = _cross(arm, c["f_world"])
            for i in range(3):
                tw[i] = tw[i] + tq[i] * w_
        torque_frame = (
            _dot3(tuple(tw), normal),
            _dot3(tuple(tw), tangent),
            _dot3(tuple(tw), t2),
        )
        row = (
            [found]
            + list(ff)
            + list(torque_frame)
            + list(pos)
            + list(normal)
            + list(tangent)
        )
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# Pallas kernel + batched entry point
# ---------------------------------------------------------------------------


def _pad_lanes(x, multiple=LANE):
    b = x.shape[-1]
    pad = (-b) % multiple
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, b


def make_megastep(model, interpret: bool = False, jit: bool = True,
                  k_steps: int = 1):
    """Build a batched step: state (B, ...) pytree → new state, via Pallas.

    Returns a function with the same signature as
    ``jax.vmap(lambda s: step(model, s))`` over State pytrees.

    Args:
        model: compiled PhysicsModel.
        interpret: run the kernel through the Pallas interpreter (CPU) and
            skip the outer jit — used by CI to exercise the full
            pallas_call plumbing (lane packing, block specs, read/write
            offsets) without TPU hardware or a 1e5-op XLA compile.
        jit: wrap the result in ``jax.jit``. Pass False when composing the
            kernel inside an outer transform (e.g. ``shard_map`` over a
            device mesh) that jits the whole program itself.
        k_steps: number of physics steps fused into ONE kernel invocation.
            With K > 1 the returned function has signature
            ``megastep_k(state, ctrl_seq, terrain_planes=None) ->
            (new_state, qpos_traj)`` where ``ctrl_seq`` is (K, B, nu) of
            *effective* (NaN-free) controls and ``qpos_traj`` is
            (K, B, nq). The K-1 intermediate steps run inside a
            ``fori_loop`` in the kernel — they skip the HBM round trip,
            the kernel launch, and the output sections (FK/site/sensor
            emission is dead code except on the final step), which is the
            single-fly latency lever (VERDICT round 2 #2) and amortizes
            the out-of-kernel terrain-plane sampling (per K-chunk, same
            staleness argument as FLYGYM_TPU_TERRAIN_RESAMPLE).
    """
    from flygym_tpu.engine.model import State

    st = _Static(model)
    nq, nv, nu, na = st.nq, st.nv, st.nu, st.na
    nb, ns, nsite = st.nbody, st.nsensor, st.nsite
    ncand = st.ncand  # compressed row count for pair_compress models
    n_terrain = 4 * ncand if st.has_hfield else 0
    # Compressed pair groups: winner MASK input rows per group (one-hot eq
    # over the members, per-listed-DoF sign masks, then r2/h2/invw winner
    # scalars), expanded out-of-kernel from the winner argmin
    # (K-chunk-stale, like the terrain planes). The kernel reads them
    # LAZILY at use points — never resident, never rebuilt in-register.
    n_groups = len(st.pair_comp_groups)
    n_wmask = sum(g["n_rows"] for g in st.pair_comp_groups)
    n_aux = n_terrain + n_wmask
    K = int(k_steps)
    assert K >= 1

    n_in = nq + nv + K * nu + na + nv + n_aux
    # K > 1 prepends (K-1)*nq per-step qpos-trajectory rows (steps 0..K-2;
    # the final step's qpos is part of the regular state output).
    n_traj = (K - 1) * nq
    n_out = (
        n_traj + nq + nv + na + nv + 3 * nb + 4 * nb + 3 * nsite + nu + 16 * ns
    )

    def kernel(in_ref, out_ref):
        from jax.experimental import pallas as pl

        read = lambda i: in_ref[i, 0]
        q = [read(i) for i in range(nq)]
        v = [read(nq + i) for i in range(nv)]
        ctrl_rows = [read(nq + nv + i) for i in range(K * nu)]
        act = [read(nq + nv + K * nu + i) for i in range(na)]
        warm = [read(nq + nv + K * nu + na + i) for i in range(nv)]
        terrain = None
        widx = None
        t0 = nq + nv + K * nu + na + nv
        if n_terrain:
            terrain = [
                tuple(read(t0 + 4 * c + k) for k in range(4))
                for c in range(ncand)
            ]
        if n_groups:
            # Lazy readers: each mask value is a VMEM load wherever the
            # emitter calls it, so none of the n_wmask rows stays live.
            # The winner eq one-hots are NOT input rows (they were, until
            # 2026-08-20): each group ships ONE winner-index row and the
            # eq masks are single lazy compares (w == j) at their use
            # points — gmax-1 fewer input rows per group (the 55x55
            # preset's eq rows alone were 3,025 of 5,830 aux rows ≈
            # 23.6 MiB of double-buffered input I/O).
            rd = lambda i: (lambda i=i: in_ref[i, 0])
            widx = []
            off = t0 + n_terrain
            for grp in st.pair_comp_groups:
                nmem = len(grp["members"])
                n_runs = len(grp["listed"])
                w_row = rd(off)
                sign_rows = [rd(off + 1 + k) for k in range(n_runs)]
                widx.append(
                    dict(
                        eq=[
                            (
                                lambda j=j, w=w_row: jnp.where(
                                    w() == float(j), 1.0, 0.0
                                )
                            )
                            for j in range(nmem)
                        ],
                        sign={
                            d: sign_rows[k]
                            for d, k in grp["dof_sign_idx"].items()
                        },
                        r2=rd(off + 1 + n_runs),
                        h2=rd(off + 1 + n_runs + 1),
                        invw=rd(off + 1 + n_runs + 2),
                    )
                )
                off += grp["n_rows"]

        if K > 1:
            # K-1 in-kernel steps: the loop body compiles ONCE (fori_loop,
            # not Python unroll), carrying only the dynamics state
            # (q, v, act, warm). Per-iteration ctrl is a where-chain select
            # over the K slices (<<1% of the emit op count). qpos after
            # step k is stored to the trajectory rows at dynamic offset.
            def loop_body(k, carry):
                q_, v_, a_, w_ = carry
                ctrl_k = []
                for i in range(nu):
                    val = ctrl_rows[i]
                    for j in range(1, K - 1):
                        val = jnp.where(k == j, ctrl_rows[j * nu + i], val)
                    ctrl_k.append(val)
                r_ = emit_step(
                    st, list(q_), list(v_), ctrl_k, list(a_), list(w_),
                    terrain, widx,
                )
                for i in range(nq):
                    out_ref[k * nq + i, 0] = r_["qpos"][i]
                return (
                    tuple(r_["qpos"]),
                    tuple(r_["qvel"]),
                    tuple(r_["act"]),
                    tuple(r_["qacc"]),
                )

            carry = jax.lax.fori_loop(
                0,
                K - 1,
                loop_body,
                (tuple(q), tuple(v), tuple(act), tuple(warm)),
            )
            q, v, act, warm = (list(t) for t in carry)
            ctrl = [ctrl_rows[(K - 1) * nu + i] for i in range(nu)]
        else:
            ctrl = ctrl_rows
        r = emit_step(st, q, v, ctrl, act, warm, terrain, widx)
        o = n_traj

        def wr(vals):
            nonlocal o
            for val in vals:
                out_ref[o, 0] = val
                o += 1

        wr(r["qpos"])
        wr(r["qvel"])
        wr(r["act"])
        wr(r["qacc"])
        for b in range(nb):
            wr(list(r["xpos"][b]))
        for b in range(nb):
            wr(list(r["xquat"][b]))
        for s_ in range(nsite):
            wr(list(r["site_xpos"][s_]))
        wr(r["actuator_force"])
        for s_ in range(ns):
            wr(r["sensordata"][s_])

    # Per-candidate local ground planes (h, n) sampled at the previous
    # step's candidate positions (state.xpos is the cached pre-integration
    # FK) — see megastep_supported docstring and engine/terrain.py (which
    # owns the method choice: windowed one-hot matmuls by default — full-
    # grid one-hots measured as ~45% of terrain-world step time in round 2).
    # Exposed separately (sample_planes) so rollouts can amortize it over
    # several steps: candidates move ~1e-3 mm/step vs ~0.25 mm terrain
    # cells, so a K-step-stale sample is far below contact resolution.
    if n_aux:
        _tsampler = None
        if n_terrain:
            from flygym_tpu.engine.terrain import make_plane_sampler

            _tsampler = make_plane_sampler(model)
        _wsampler = None
        _expand_winners = None
        if n_groups:
            from flygym_tpu.engine.contact import make_pair_winner_sampler

            _winner = make_pair_winner_sampler(model)
            # Per-group expansion matrix M = [S | V]: the winner one-hot
            # (B, nmem) times M yields the group's mask-row block
            # [per-listed-DoF sign rows | r2 h2 invw]; the winner INDEX
            # row itself is prepended raw (the kernel's eq masks are lazy
            # in-kernel compares against it, not input rows).
            _gmats = []
            for grp in st.pair_comp_groups:
                nmem = len(grp["members"])
                listed = grp["listed"]  # unique runs, one sign row each
                S = np.zeros((nmem, len(listed)), np.float32)
                for k_, runs in enumerate(listed):
                    for lo, hi in runs:
                        S[lo : hi + 1, k_] = 1.0
                V = np.stack(
                    [grp["r2"], grp["h2"], grp["invw"]], axis=1
                ).astype(np.float32)
                M = np.concatenate([S, V], axis=1)
                _gmats.append((nmem, jnp.asarray(M)))

            def _expand_winners(w):
                """Deterministic (B, n_groups) winner indices -> (B,
                n_wmask) mask-row block. Split from the argmin so
                hardware validation can feed the EXACT same winners to
                the kernel (via terrain_planes) and the pinned-winner
                engine step — two separate XLA compilations of the
                argmin can break a symmetric tie differently at fp-
                reassociation scale (measured 2026-08-20: a same-winner
                check tripped its own gravity-scale flip envelope)."""
                parts = []
                for g, (nmem, M) in enumerate(_gmats):
                    oh = (
                        w[:, g : g + 1]
                        == jnp.arange(nmem, dtype=w.dtype)[None, :]
                    ).astype(jnp.float32)
                    parts.append(w[:, g : g + 1])
                    parts.append(oh @ M)
                return jnp.concatenate(parts, axis=1)  # (B, n_wmask)

            def _wsampler(xpos, xquat):
                # (B, n_groups) float32 winner indices -> mask rows.
                return _expand_winners(_winner(xpos, xquat))

        _keep = st.pair_keep

        def sample_planes(state):
            """(B,)-batched state -> (B, n_aux) aux rows: per-candidate
            ground planes (compressed-row space) then per-group winner
            indices. Opaque to callers — rollouts amortize it as a unit."""
            B = state.qpos.shape[0]
            parts_ = []
            if _tsampler is not None:
                pl = _tsampler(state.xpos, state.xquat)  # (B, model.ncand, 4)
                if _keep is not None:
                    pl = pl[:, _keep]
                parts_.append(pl.reshape(B, n_terrain))
            if _wsampler is not None:
                parts_.append(_wsampler(state.xpos, state.xquat))
            return (
                parts_[0]
                if len(parts_) == 1
                else jnp.concatenate(parts_, axis=1)
            )

    else:
        sample_planes = None
        _expand_winners = None

    # Always 8 sublanes: Mosaic pads spilled values to full (8, 128) tiles,
    # so a narrower block costs the SAME scoped-VMEM stack at half the
    # throughput (measured — see _est_scoped_mb).
    # Block width: 8 sublanes (full VPU vregs) unless only the NARROW
    # 4-sublane block fits the VMEM gate — halving the window
    # allocations at half the throughput; the Mosaic value STACK is
    # sublane-independent (spills pad to full (8, 128) tiles). The 55x55
    # stream kernel measured 131.89 MiB total (112.5 arena + 19.39
    # windows) at 8 sublanes and compiled+ran at 4 (2026-08-20).
    # FLYGYM_TPU_MEGASTEP_SUBLANES forces a width.
    sublanes = _kernel_sublanes(model, k_steps=K)
    block = sublanes * LANE

    # Per-kernel VMEM limit: each model gets exactly the scoped VMEM its
    # value stack + block I/O needs (plus headroom), instead of a global
    # LIBTPU flag sized for the biggest supported model — a limit raised
    # for a two-fly kernel measurably slows the single-fly one.
    est_mb = _est_kernel_mb(model, k_steps=K)
    vmem_limit_bytes = int(min(127.0, est_mb + 8.0) * 2**20)
    # Calibration override: compiling with a too-small limit makes Mosaic
    # report the kernel's ACTUAL scoped-VMEM requirement in the error.
    _ovr = __import__("os").environ.get("FLYGYM_TPU_MEGASTEP_VMEM_MB")
    if _ovr:
        vmem_limit_bytes = int(float(_ovr) * 2**20)

    def _megastep_impl(state, ctrl_seq=None, terrain_planes=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = state.qpos.shape[0]
        dtype = jnp.float32
        if K > 1:
            # ctrl_seq: (K, B, nu) effective controls, one slice per fused
            # step; rows ordered k-major to match the kernel's reads.
            ctrl_part = ctrl_seq.transpose(0, 2, 1).reshape(K * nu, B)
        else:
            ctrl_part = state.ctrl.T
        parts = [
            state.qpos.T.astype(dtype),
            state.qvel.T.astype(dtype),
            ctrl_part.astype(dtype),
            state.act.T.astype(dtype),
            state.qacc.T.astype(dtype),
        ]
        if n_aux:
            pl_b = (
                terrain_planes
                if terrain_planes is not None
                else sample_planes(state)
            )
            parts.append(pl_b.reshape(B, n_aux).T.astype(dtype))
        packed = jnp.concatenate(parts, axis=0)
        packed, B0 = _pad_lanes(packed, block)
        bp = packed.shape[1]
        nblk = bp // block
        if nblk > 2 and sublanes < SUBLANES:
            import warnings

            # The narrow-block rescue is hardware-validated at 1 grid
            # block (55x55 two-fly, B=128, single-buffered windows) and
            # at 2 blocks (3-fly 147-pair, 1024 worlds, double-buffered
            # — both 2026-08-20). Beyond that the window residency is
            # the same 2x, but the model class is unmeasured.
            warnings.warn(
                f"narrow-block mega-kernel at {nblk} grid blocks "
                f"({B0} worlds): validated on hardware up to 2 blocks — "
                "if the compile OOMs, split the rollout into smaller "
                "world chunks.",
                stacklevel=2,
            )
        # Worlds pack as (block, sublane, lane): each per-world value is a
        # (sublanes, LANE) tile inside the kernel — full VPU vregs at 8,
        # fewer for big models whose Mosaic stack would blow scoped VMEM.
        packed = packed.reshape(n_in, nblk, sublanes, LANE)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, nblk, sublanes, LANE), dtype),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(
                    (n_in, 1, sublanes, LANE),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (n_out, 1, sublanes, LANE),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),  # blocks = disjoint worlds
                vmem_limit_bytes=vmem_limit_bytes,
            ),
            interpret=interpret,
        )(packed)
        out = out.reshape(n_out, bp)[:, :B0]
        o = 0

        def take(n, shape):
            nonlocal o
            r = out[o : o + n].T.reshape((B,) + shape)
            o += n
            return r

        traj = take(n_traj, (K - 1, nq)) if n_traj else None  # (B, K-1, nq)
        qpos = take(nq, (nq,))
        qvel = take(nv, (nv,))
        act_n = take(na, (na,))
        qacc = take(nv, (nv,))
        xpos = take(3 * nb, (nb, 3))
        xquat = take(4 * nb, (nb, 4))
        site = take(3 * nsite, (nsite, 3))
        af = take(nu, (nu,))
        sens = take(16 * ns, (ns, 16))
        new_state = State(
            qpos=qpos,
            qvel=qvel,
            ctrl=state.ctrl if K == 1 else ctrl_seq[-1],
            act=act_n,
            time=state.time + K * st.timestep,
            qacc=qacc,
            xpos=xpos,
            xquat=xquat,
            site_xpos=site,
            actuator_force=af,
            contact_sensordata=sens,
        )
        if K == 1:
            return new_state
        # (K, B, nq) per-step qpos trajectory for the caller's scan.
        qpos_traj = jnp.concatenate(
            [traj.transpose(1, 0, 2), qpos[None]], axis=0
        )
        return new_state, qpos_traj

    if K == 1:

        def megastep(state, terrain_planes=None):
            return _megastep_impl(state, None, terrain_planes)

    else:

        def megastep(state, ctrl_seq, terrain_planes=None):
            return _megastep_impl(state, ctrl_seq, terrain_planes)

    # interpret mode stays unjitted: the kernel body unrolls to ~1e5 ops,
    # which the CPU backend would take tens of minutes to compile.
    if interpret or not jit:
        fn = megastep
    else:
        jitted = jax.jit(megastep)

        if K == 1:

            def fn(state, terrain_planes=None):
                return jitted(state, terrain_planes)

        else:

            def fn(state, ctrl_seq, terrain_planes=None):
                return jitted(state, ctrl_seq, terrain_planes)

    # Rollouts use this to amortize the (expensive) terrain-plane sampling
    # over several kernel steps (engine/step.py:rollout_batched).
    fn.sample_planes = sample_planes
    # Hardware validation uses this to feed the kernel the EXACT winner
    # indices the pinned-winner engine step gets (deterministic expansion;
    # no argmin, so no tie-break divergence between compilations). Only
    # valid as terrain_planes for models WITHOUT an hfield (otherwise the
    # terrain rows must be concatenated in front).
    fn.expand_winners = _expand_winners
    fn.k_steps = K
    return fn


def make_megastep_sharded(
    model, mesh, world_axis, state_template, interpret: bool = False,
    k_steps: int = 1,
):
    """Mesh-sharded mega-step: shard_map of the kernel over the world axis.

    Each device runs the Pallas kernel on its world shard — SPMD with zero
    collectives (worlds are independent; the reference's only parallelism
    axis, SURVEY §2.4). Zero-size State leaves (e.g. ``act`` with na=0,
    ``site_xpos`` with nsite=0) are routed AROUND shard_map: XLA marks
    zero-size outputs replicated, which trips shard_map's output-sharding
    assertion, and their contents are degenerate anyway.

    Args:
        model: compiled PhysicsModel.
        mesh: ``jax.sharding.Mesh`` with a ``world_axis`` axis.
        world_axis: mesh axis name to shard worlds over.
        state_template: a batched State (or matching ShapeDtypeStructs) with
            the leading world axis, used to plan the empty-leaf routing.
        interpret: run the kernel through the Pallas interpreter (CPU
            meshes / CI). The result is left unjitted in interpret mode.
        k_steps: K-step fusion (``make_megastep(model, k_steps=K)``) under
            the same shard_map: each device runs K physics steps per kernel
            launch on its shard. For K>1 the returned function has the
            K-kernel signature ``fn(state, ctrl_seq, terrain_planes=None)``
            with ``ctrl_seq`` (K, B, nu) sharded on the WORLD axis (dim 1),
            and returns ``(new_state, qpos_traj)`` with the (K, B, nq)
            trajectory likewise world-sharded on dim 1.
    """
    from jax.sharding import PartitionSpec as P

    K = int(k_steps)
    raw = make_megastep(model, interpret=interpret, jit=False, k_steps=K)
    spec = P(world_axis)
    nu = int(model.nu)

    in_leaves, in_tree = jax.tree.flatten(state_template)
    in_empty = [int(np.prod(l.shape)) == 0 for l in in_leaves]
    B_tpl = in_leaves[0].shape[0]
    if K > 1:
        ctrl_tpl = jax.ShapeDtypeStruct((K, B_tpl, nu), jnp.float32)
        out_state_t = jax.eval_shape(
            lambda s, c: raw(s, c)[0], state_template, ctrl_tpl
        )
    else:
        out_state_t = jax.eval_shape(raw, state_template)
    out_leaves_t, out_tree = jax.tree.flatten(out_state_t)
    out_empty = [int(np.prod(l.shape)) == 0 for l in out_leaves_t]
    ctrl_empty = nu == 0

    def _core(planes, ctrl_seq, *nonempty):
        it = iter(nonempty)
        b_shard = nonempty[0].shape[0]
        full = [
            jnp.zeros((b_shard,) + tuple(l.shape[1:]), l.dtype)
            if e
            else next(it)
            for l, e in zip(in_leaves, in_empty)
        ]
        st = jax.tree.unflatten(in_tree, full)
        if K > 1:
            if ctrl_seq is None:  # nu == 0: rebuild the empty slices
                ctrl_seq = jnp.zeros((K, b_shard, 0), jnp.float32)
            out, traj = raw(st, ctrl_seq, planes)
            extra = (traj,)
        else:
            out = raw(st, planes)
            extra = ()
        return extra + tuple(
            l for l, e in zip(jax.tree.leaves(out), out_empty) if not e
        )

    n_in = sum(1 for e in in_empty if not e)
    n_out = sum(1 for e in out_empty if not e)
    # ctrl_seq (K, B, nu) and qpos_traj (K, B, nq) carry the world axis on
    # dim 1; everything else on dim 0.
    spec_kmaj = P(None, world_axis)
    ctrl_specs = () if (K == 1 or ctrl_empty) else (spec_kmaj,)
    traj_specs = () if K == 1 else (spec_kmaj,)
    sharded_core = jax.shard_map(
        (lambda *ne: _core(None, None, *ne))
        if not ctrl_specs
        else (lambda c, *ne: _core(None, c, *ne)),
        mesh=mesh,
        in_specs=ctrl_specs + (spec,) * n_in,
        out_specs=traj_specs + (spec,) * n_out,
        check_vma=False,
    )
    # Variant with precomputed terrain planes threaded through (sharded over
    # worlds like everything else) — used by rollout_batched's K-step
    # terrain-resampling path.
    sharded_core_planes = jax.shard_map(
        (lambda p, *ne: _core(p, None, *ne))
        if not ctrl_specs
        else (lambda p, c, *ne: _core(p, c, *ne)),
        mesh=mesh,
        in_specs=(spec,) + ctrl_specs + (spec,) * n_in,
        out_specs=traj_specs + (spec,) * n_out,
        check_vma=False,
    )

    def _unpack_state(nonempty_out):
        it = iter(nonempty_out)
        out_leaves = [
            jnp.zeros(t.shape, t.dtype) if e else next(it)
            for t, e in zip(out_leaves_t, out_empty)
        ]
        return jax.tree.unflatten(out_tree, out_leaves)

    if K == 1:

        def megastep_sharded(state, terrain_planes=None):
            leaves = jax.tree.leaves(state)
            nonempty = tuple(l for l, e in zip(leaves, in_empty) if not e)
            if terrain_planes is None:
                nonempty_out = sharded_core(*nonempty)
            else:
                nonempty_out = sharded_core_planes(terrain_planes, *nonempty)
            return _unpack_state(nonempty_out)

    else:

        def megastep_sharded(state, ctrl_seq, terrain_planes=None):
            leaves = jax.tree.leaves(state)
            nonempty = tuple(l for l, e in zip(leaves, in_empty) if not e)
            cargs = () if ctrl_empty else (ctrl_seq,)
            if terrain_planes is None:
                out = sharded_core(*cargs, *nonempty)
            else:
                out = sharded_core_planes(terrain_planes, *cargs, *nonempty)
            new_state = _unpack_state(out[1:])
            # Match the unsharded K-kernel's contract: ctrl after the chunk
            # is the last commanded slice (shard_map sees only padded zeros
            # for empty leaves; rebuild ctrl host-side like the other
            # routed-around leaves).
            import dataclasses

            new_state = dataclasses.replace(
                new_state,
                ctrl=state.ctrl if ctrl_empty else ctrl_seq[-1],
            )
            return new_state, out[0]

    if interpret:
        fn = megastep_sharded
    elif K == 1:
        jitted = jax.jit(megastep_sharded)

        def fn(state, terrain_planes=None):
            return jitted(state, terrain_planes)

    else:
        jitted = jax.jit(megastep_sharded)

        def fn(state, ctrl_seq, terrain_planes=None):
            return jitted(state, ctrl_seq, terrain_planes)

    # Plane sampling is plain jnp OUTSIDE shard_map: under the caller's jit,
    # GSPMD propagates the world sharding through it automatically.
    fn.sample_planes = raw.sample_planes
    fn.k_steps = K
    return fn
