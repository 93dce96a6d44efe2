"""Hardware validation for the two-fly compressed kernel (mask-input rows).

2026-08-20 redesign: the winner eq/sign masks and r2/h2/invw scalars are
functions of the K-chunk-stale winner index only, so they are expanded OUT
of the kernel (sample_planes) into aux input rows the emitter reads lazily
at each use — replacing the in-kernel where-chain rebuilds that Mosaic
spilled at 248.96 MiB (223.82 MiB register spill) on the 55x55 preset,
2026-08-19. This script measures the redesign on real hardware:

1. the 49-pair compressed preset (thorax + tarsal tips, the config the
   docs bench): compile + run at B=128, cross-check one kernel step
   against the vmapped jnp engine, optionally bench 4096x1000;
2. the FULL 55x55 preset: attempt a compile at the 127 MiB ceiling —
   success means the gate can open; a Mosaic out-of-VMEM error reports
   the kernel's ACTUAL scoped-VMEM requirement for estimator
   recalibration (_est_scoped_mb's winner-row coefficient).

Usage: python scripts/dev/validate_twofly_kernel.py [--bench] [--full]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp


def two_fly_world(bodysegs=None):
    from flygym_tpu.anatomy import (
        AxisOrder,
        ContactBodiesPreset,
        JointPreset,
        Skeleton,
    )
    from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
    from flygym_tpu.utils.math import Rotation3D

    if bodysegs is None:  # the FULL 55x55 preset (all segments with
        # contact capsules: legs + thorax + abdomen + head)
        bodysegs = ContactBodiesPreset.LEGS_THORAX_ABDOMEN_HEAD

    def mkfly(name):
        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        return fly

    world = FlatGroundWorld()
    world.add_fly(mkfly("a"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(mkfly("b"), (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
    n = world.add_fly_fly_contacts("a", "b", bodysegs=bodysegs)
    print(f"fly-fly pairs: {n}", flush=True)
    return world


def main():
    bench = "--bench" in sys.argv
    full = "--full" in sys.argv

    jax.config.update(
        "jax_compilation_cache_dir", str(Path.home() / ".cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment
    from flygym_tpu.engine.step import step, rollout_batched
    from flygym_tpu.ops import megastep as ms

    # ---- 1. the 49-pair compressed preset (docs bench config) ----
    segs = ["c_thorax"] + [
        n for n in ALL_SEGMENT_NAMES if n.endswith("tarsus5")
    ]
    world = two_fly_world(bodysegs=[BodySegment(s) for s in segs])
    world._spec.options["pair_compress"] = True
    model, state0 = world.compile()
    print(
        f"49-pair: nv={model.nv} ncand={model.ncand} groups="
        f"{len(model.pair_groups)} mask_rows={ms._pair_mask_rows(model)} "
        f"fused={ms._est_scoped_mb(model):.1f} "
        f"stream={ms._est_stream_mb(model):.1f} "
        f"kernel={ms._est_kernel_mb(model):.1f} MiB "
        f"stream_mode={ms._stream_mode(model)} "
        f"supported={ms.megastep_supported(model)}",
        flush=True,
    )

    B = 128
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0
    )
    # DIVERSIFY the worlds: broadcasting alone makes 128 IDENTICAL
    # copies, so a single contact row resting exactly at its activation
    # edge poisons every world at once (measured twice on 2026-08-20:
    # |dqvel| = 1.31 in a pinned-winner check — the solref stiffness,
    # k ~ 1/(dmax^2 tc^2 dr^2), amplifies Mosaic-vs-XLA fp-reassociation
    # noise in dist into an O(g) activation flip; winner pinning cannot
    # remove it because it is the ROW's on/off edge, not winner choice).
    # Per-world millimeter-scale offsets of the upper fly make the edge
    # set a measurable FRACTION of worlds, gated statistically below.
    nq1 = model.free_joints[1][1]
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    # Tens-of-microns jitter: enough to decorrelate tie-breaking across
    # worlds, small enough that the stack still settles quasi-static
    # (0.15 mm destabilized it into slow sliding: 126/128 worlds showed
    # edge flips with contact-force-scale amplitudes, measured 13:20).
    dx = jax.random.uniform(kx, (B,), minval=-0.02, maxval=0.02)
    dy = jax.random.uniform(ky, (B,), minval=-0.02, maxval=0.02)
    qpos = bstate.qpos.at[:, nq1 + 0].add(dx).at[:, nq1 + 1].add(dy)
    bstate = dataclasses.replace(bstate, qpos=qpos)
    # Settle WELL past quiescence: 1500 steps left rows flickering at
    # the activation edge; 4000 is quasi-static.
    n_settle = 4000
    print(
        f"settling {n_settle} jnp steps at B=128 (fly b lands on a, "
        "per-world xy jitter) ...",
        flush=True,
    )
    nan_ctrl = jnp.full((n_settle, B, model.nu), jnp.nan, jnp.float32)
    t0 = time.time()
    bstate, _ = rollout_batched(model, bstate, nan_ctrl, n_settle)
    np.asarray(bstate.qpos)
    print(f"  settle done in {time.time() - t0:.1f}s", flush=True)

    print("compiling the 49-pair mega-kernel ...", flush=True)
    mega = ms.make_megastep(model)

    # PRIMARY check — kernel vs the ENGINE step fed the SAME winners
    # (step(..., widx=...)): this isolates Mosaic lowering from the
    # winner-selection timing and must agree to fp-reassociation scale.
    # (Jitting the eager emitter itself is NOT viable on hardware: its
    # ~1e5-op XLA graph SIGSEGVs the remote tpu_compile_helper —
    # measured 2026-08-20. The pinned-winner engine step compiles the
    # same graph the settle already used.)
    #
    # The winners are sampled ONCE here and fed to BOTH sides: the
    # kernel gets them as precomputed mask rows (mega.expand_winners ->
    # terrain_planes), the engine as widx. Letting each side run its own
    # argmin is NOT same-winner: two XLA compilations of the sampler can
    # break a symmetric resting-stack tie differently at fp-reassociation
    # scale (measured 2026-08-20: |dqvel| 1.31 = one flipped row's
    # gravity-scale transient, in what was meant to be the pinned check).
    from flygym_tpu.engine.contact import make_pair_winner_sampler

    widx_b = make_pair_winner_sampler(model)(bstate.xpos, bstate.xquat)
    planes_b = mega.expand_winners(widx_b)

    t0 = time.time()
    got = mega(bstate, terrain_planes=planes_b)
    np.asarray(got.qpos)
    print(f"  kernel compile+run in {time.time() - t0:.1f}s", flush=True)

    pin_ref = jax.jit(
        jax.vmap(lambda s, w: step(model, s, widx=w), in_axes=(0, 0))
    )(bstate, widx_b)
    # CONTROL: the SAME pinned-winner engine step under a DIFFERENT XLA
    # compilation (lax.map instead of vmap — different fusion, different
    # fp reassociation). Rows near their activation edge amplify ANY fp
    # noise in dist through the solref stiffness into O(g*dt)+ qvel
    # differences — between two XLA programs just as between XLA and
    # Mosaic. The kernel cannot be held to a tighter standard than the
    # engine holds itself across compilations, so the gate is relative:
    # kernel-vs-engine <= 3x engine-vs-engine (floored at fp scale).
    pin_ctl = jax.jit(
        lambda s, w: jax.lax.map(
            lambda sw: step(model, sw[0], widx=sw[1]), (s, w)
        )
    )(bstate, widx_b)
    ctl_q = np.abs(np.asarray(pin_ctl.qpos) - np.asarray(pin_ref.qpos))
    ctl_v = np.abs(np.asarray(pin_ctl.qvel) - np.asarray(pin_ref.qvel))
    dq_w = np.abs(
        np.asarray(pin_ref.qpos) - np.asarray(got.qpos)
    ).max(axis=1)
    dv_w = np.abs(
        np.asarray(pin_ref.qvel) - np.asarray(got.qvel)
    ).max(axis=1)
    edge = dv_w > 5e-2
    n_edge = int(edge.sum())
    print(
        f"  engine-vs-engine control (vmap vs lax.map): |dqpos| = "
        f"{ctl_q.max():.3e}  |dqvel| = {ctl_v.max():.3e}",
        flush=True,
    )
    print(
        f"  vs SAME-WINNER engine: clean worlds {B - n_edge}/{B} "
        f"|dqpos| = {dq_w[~edge].max() if (~edge).any() else 0:.3e}  "
        f"|dqvel| = {dv_w[~edge].max() if (~edge).any() else 0:.3e}; "
        f"edge worlds {n_edge} max |dqvel| = {dv_w.max():.3e}",
        flush=True,
    )
    gate_q = max(3e-5, 3.0 * float(ctl_q.max()))
    gate_v = max(5e-2, 3.0 * float(ctl_v.max()))
    assert dq_w.max() <= gate_q, (dq_w.max(), gate_q)
    assert dv_w.max() <= gate_v, (dv_w.max(), gate_v)

    # SECONDARY check — kernel vs the jnp engine step, which re-selects
    # winners IN-STEP from fresh FK. On a symmetric resting stack the
    # nearest-member argmin can sit on a tie; when the two paths break it
    # differently the flipped row (un)supports its segment for one step —
    # a gravity-scale qacc difference (g*dt ~ 1 mm/s of qvel, measured
    # 1.18-1.31 across settles). That is the documented K-chunk staleness
    # contract, not a kernel fidelity bound, so the gate here is the
    # one-step transient envelope.
    g = float(np.abs(np.asarray(model.gravity)).max())
    flip_bound = 3.0 * g * float(model.timestep)  # one-winner-flip envelope
    ref = jax.jit(jax.vmap(lambda s: step(model, s)))(bstate)
    deltas = {}
    for k, atol in (
        ("qpos", 3e-4),
        ("qvel", max(flip_bound, gate_v)),
        ("xpos", 5e-4),
    ):
        a, b = np.asarray(getattr(got, k)), np.asarray(getattr(ref, k))
        deltas[k] = (np.abs(a - b).max(), atol)
        print(f"  vs in-step-winner engine: |d{k}| = {deltas[k][0]:.3e} "
              f"(atol {atol})", flush=True)
    for k, (d, atol) in deltas.items():
        assert d <= atol, (k, d)
    print("49-PAIR KERNEL==ENGINE OK (within 3x the engine's own "
          "cross-compilation spread; flips inside the one-step envelope)",
          flush=True)

    if bench:
        from flygym_tpu.batch import BatchSimulation

        n_worlds, n_steps = 4096, 1000
        sim = BatchSimulation(world, n_worlds)
        print(f"bench rollout {n_worlds}x{n_steps} (compile first) ...",
              flush=True)
        sim.rollout(None, n_steps)
        np.asarray(sim.state.qpos[0])
        t0 = time.time()
        sim.rollout(None, n_steps)
        np.asarray(sim.state.qpos[0])
        dtime = time.time() - t0
        rate = n_worlds * n_steps / dtime
        print(
            f"two-fly 49-pair compressed {n_worlds} worlds: {dtime:.2f}s -> "
            f"{rate:,.0f} world-steps/s ({rate * 1e-4:.0f}x realtime)",
            flush=True,
        )

    # ---- 2. the FULL 55x55 preset: measure actual scoped VMEM ----
    if full:
        import os

        world_f = two_fly_world()
        model_f, state_f = world_f.compile()
        print(
            f"55x55: mask_rows={ms._pair_mask_rows(model_f)} "
            f"fused={ms._est_scoped_mb(model_f):.1f} "
            f"stream={ms._est_stream_mb(model_f):.1f} "
            f"kernel={ms._est_kernel_mb(model_f):.1f} MiB "
            f"stream_mode={ms._stream_mode(model_f)} "
            f"supported={ms.megastep_supported(model_f)}",
            flush=True,
        )
        os.environ["FLYGYM_TPU_MEGASTEP_VMEM_MB"] = "127"
        bstate_f = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), state_f
        )
        print("compiling the 55x55 kernel at the 127 MiB ceiling ...",
              flush=True)
        try:
            mega_f = ms.make_megastep(model_f)
            t0 = time.time()
            got_f = mega_f(bstate_f)
            np.asarray(got_f.qpos)
            print(
                f"  55x55 COMPILED AND RAN in {time.time() - t0:.1f}s "
                "— the gate can open",
                flush=True,
            )
            ref_f = jax.jit(jax.vmap(lambda s: step(model_f, s)))(bstate_f)
            d = np.abs(
                np.asarray(got_f.qpos) - np.asarray(ref_f.qpos)
            ).max()
            print(f"  |dqpos| vs jnp = {d:.3e}", flush=True)
        except Exception as e:  # Mosaic reports the actual requirement
            msg = str(e)
            print(f"  55x55 compile FAILED (actual requirement in the "
                  f"error):\n{msg[:2000]}", flush=True)


if __name__ == "__main__":
    main()
