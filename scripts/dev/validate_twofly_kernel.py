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
    only55 = "--only55" in sys.argv  # skip part 1, go straight to 55x55
    if only55:
        full = True

    jax.config.update(
        "jax_compilation_cache_dir", str(Path.home() / ".cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment
    from flygym_tpu.engine.step import step, rollout_batched
    from flygym_tpu.ops import megastep as ms

    if only55:
        _full_5555(ms, step)
        return

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
    # CONTROL 1 — compile variation: the SAME pinned-winner engine step
    # under a DIFFERENT XLA compilation (lax.map instead of vmap).
    # Measures XLA-vs-XLA fp-reassociation noise through the one-step
    # map (measured 9.6e-05 qvel on 2026-08-20 — tiny).
    pin_ctl = jax.jit(
        lambda s, w: jax.lax.map(
            lambda sw: step(model, sw[0], widx=sw[1]), (s, w)
        )
    )(bstate, widx_b)
    ctl_q = np.abs(np.asarray(pin_ctl.qpos) - np.asarray(pin_ref.qpos))
    ctl_v = np.abs(np.asarray(pin_ctl.qvel) - np.asarray(pin_ref.qvel))
    print(
        f"  compile-variation control (vmap vs lax.map): |dqpos| = "
        f"{ctl_q.max():.3e}  |dqvel| = {ctl_v.max():.3e}",
        flush=True,
    )

    # CONTROL 2 — CONDITIONING PROBE. The settled two-fly stack RINGS
    # against its stiff solref contacts (qvel ~1.2 mm/s steady state; it
    # never becomes quiescent), and the one-step map there is
    # ill-conditioned: measured Lipschitz ~4e4 in qvel (2026-08-20 —
    # 1e-7/1e-6/1e-5 relative state noise -> 1.4e-3/3.9e-2/1.36 qvel).
    # Mosaic's approximate div/rsqrt inject ~1e-5 relative noise through
    # the FK->CRBA->LDL->Newton chain, so kernel-vs-engine one-step
    # deltas of O(1) are the STATE'S amplification of fp noise, not
    # kernel error (this retro-explains round 4's "winner-flip
    # envelope" 1.18-1.31 readings — winners were never the cause). The
    # gate is the probe's amplification at the Mosaic noise budget.
    eps = 1e-5
    kq, kv = jax.random.split(jax.random.PRNGKey(42))
    pert = dataclasses.replace(
        bstate,
        qpos=bstate.qpos
        * (1.0 + eps * jax.random.normal(kq, bstate.qpos.shape)),
        qvel=bstate.qvel
        + eps * jax.random.normal(kv, bstate.qvel.shape),
    )
    probe = jax.jit(
        jax.vmap(lambda s, w: step(model, s, widx=w), in_axes=(0, 0))
    )(pert, widx_b)
    amp_q = float(
        np.abs(np.asarray(probe.qpos) - np.asarray(pin_ref.qpos)).max()
    )
    amp_v = float(
        np.abs(np.asarray(probe.qvel) - np.asarray(pin_ref.qvel)).max()
    )
    print(
        f"  conditioning probe ({eps:.0e} state noise): |dqpos| = "
        f"{amp_q:.3e}  |dqvel| = {amp_v:.3e}",
        flush=True,
    )

    dq_w = np.abs(
        np.asarray(pin_ref.qpos) - np.asarray(got.qpos)
    ).max(axis=1)
    dv_w = np.abs(
        np.asarray(pin_ref.qvel) - np.asarray(got.qvel)
    ).max(axis=1)
    print(
        f"  vs SAME-WINNER engine: |dqpos| = {dq_w.max():.3e}  "
        f"|dqvel| = {dv_w.max():.3e}",
        flush=True,
    )
    gate_q = max(3e-5, 3.0 * amp_q)
    gate_v = max(5e-2, 3.0 * amp_v)
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
        # qpos inherits the conditioning envelope through one Euler
        # step (gate_v * dt); xpos (post-step FK of the same qpos)
        # stays at fp scale and measures 1.3e-06.
        ("qpos", max(3e-4, gate_q)),
        ("qvel", max(flip_bound, gate_v)),
        ("xpos", 5e-4),
    ):
        a, b = np.asarray(getattr(got, k)), np.asarray(getattr(ref, k))
        deltas[k] = (np.abs(a - b).max(), atol)
        print(f"  vs in-step-winner engine: |d{k}| = {deltas[k][0]:.3e} "
              f"(atol {atol})", flush=True)
    for k, (d, atol) in deltas.items():
        assert d <= atol, (k, d)

    # TERTIARY — trajectory-level equivalence, the check one-step
    # conditioning cannot fake. The stacked config is MARGINALLY STABLE
    # under this solver: it sustains a contact ring rather than settling
    # (measured 2026-08-20 over 2000 steps: engine ring grows
    # 1.18 -> 15.7 mm/s, kernel 7.1; positions wander ~72 um). So the
    # honest trajectory claims are: both paths stay BOUNDED, in the
    # same configuration neighborhood, with the pile still supported —
    # a real O(1)-per-step kernel error would scatter the stack in a
    # few hundred steps (0.2 s simulated).
    n_dec = 2000
    nanc2 = jnp.full((n_dec, B, model.nu), jnp.nan, jnp.float32)
    t0 = time.time()
    ref_T, _ = rollout_batched(model, bstate, nanc2, n_dec)
    spl = mega.sample_planes

    @jax.jit
    def kernel_rollout(s0):
        def body(s, _):
            return mega(s, terrain_planes=spl(s)), None

        out, _ = jax.lax.scan(body, s0, None, length=n_dec)
        return out

    k_T = kernel_rollout(got)
    dq_T = np.abs(np.asarray(k_T.qpos) - np.asarray(ref_T.qpos)).max()
    v_k = np.abs(np.asarray(k_T.qvel)).max()
    v_r = np.abs(np.asarray(ref_T.qvel)).max()
    zb_k = float(np.asarray(k_T.qpos)[:, nq1 + 2].min())
    zb_r = float(np.asarray(ref_T.qpos)[:, nq1 + 2].min())
    print(
        f"  {n_dec}-step trajectory: |dqpos| = {dq_T:.3e}, ring "
        f"|qvel| kernel/engine = {v_k:.2f}/{v_r:.2f}, top-fly z "
        f"kernel/engine = {zb_k:.2f}/{zb_r:.2f} "
        f"({time.time() - t0:.1f}s)",
        flush=True,
    )
    assert dq_T <= 0.2, dq_T  # same neighborhood (~0.2 mm of wander)
    assert v_k <= max(20.0, 2.0 * v_r), (v_k, v_r)  # bounded ring
    assert zb_k > 1.0 and zb_r > 1.0, (zb_k, zb_r)  # pile supported
    print("49-PAIR KERNEL==ENGINE OK (one-step within the conditioning "
          "envelope; bounded same-neighborhood trajectories over "
          f"{n_dec} steps)", flush=True)

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
        _full_5555(ms, step)


def _full_5555(ms, step):
    import os

    B = 128
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
        # Mosaic's scoped-vmem number is usually near the END of the
        # message; the head is often proxy/compile-helper noise.
        head, tail = msg[:1500], msg[-3000:]
        print(f"  55x55 compile FAILED (actual requirement in the "
              f"error):\n--- head ---\n{head}\n--- tail ---\n{tail}",
              flush=True)


if __name__ == "__main__":
    main()
