"""Multi-fly worlds: two flies in one compiled model, independent control."""

import numpy as np
import pytest

import flygym_tpu
from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import (
    ActuatorType,
    Fly,
    FlatGroundWorld,
    KinematicPosePreset,
)
from flygym_tpu.utils.math import Rotation3D


def _make_fly(name):
    fly = Fly(name=name)
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    dofs = fly.skeleton.get_actuated_dofs_from_preset("legs_active_only")
    fly.add_actuators(
        dofs, ActuatorType.POSITION, kp=50.0,
        neutral_input=KinematicPosePreset.NEUTRAL,
    )
    fly.add_leg_adhesion()
    return fly


@pytest.fixture(scope="module")
def two_fly_sim():
    world = FlatGroundWorld()
    world.add_fly(_make_fly("alice"), (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    world.add_fly(_make_fly("bob"), (10, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return flygym_tpu.Simulation(world)


class TestTwoFlies:
    def test_compiled_dimensions(self, two_fly_sim):
        model = two_fly_sim.model
        assert model.nbody == 1 + 2 * 69
        assert model.nv == 2 * (6 + 66)
        assert model.nu == 2 * 48
        assert model.nsensor_contact == 12
        assert len(model.free_joints) == 2

    def test_independent_readouts(self, two_fly_sim):
        sim = two_fly_sim
        sim.reset()
        pa = sim.get_body_positions("alice")
        pb = sim.get_body_positions("bob")
        assert pa.shape == pb.shape == (69, 3)
        # Bob spawns 10 mm to the right.
        assert np.allclose(pb[:, 0] - pa[:, 0], 10.0, atol=1e-5)

    def test_independent_control(self, two_fly_sim):
        sim = two_fly_sim
        sim.reset()
        sim.set_leg_adhesion_states("alice", np.ones(6))
        sim.set_leg_adhesion_states("bob", np.ones(6))
        neutral_a = sim.get_joint_angles("alice").copy()
        targets = sim.get_joint_angles("bob")[
            [i for i, d in enumerate(
                sim.world.fly_lookup["bob"].get_jointdofs_order())
             ]
        ]
        # Drive only bob's joints away from neutral.
        order_act = sim.world.fly_lookup["bob"].get_actuated_jointdofs_order(
            ActuatorType.POSITION
        )
        sim.set_actuator_inputs("bob", ActuatorType.POSITION,
                                np.full(len(order_act), 0.5, np.float32))
        for _ in range(200):
            sim.step()
        # Alice's joints stay near neutral posture; bob's moved.
        da = np.abs(sim.get_joint_angles("alice") - neutral_a).max()
        order_all = sim.world.fly_lookup["bob"].get_jointdofs_order()
        db = np.abs(sim.get_joint_angles("bob") -
                    sim.get_joint_angles("alice")).max()
        assert db > 0.05  # flies diverged
        assert np.isfinite(sim.get_joint_angles("alice")).all()

    def test_both_settle_with_contacts(self, two_fly_sim):
        sim = two_fly_sim
        sim.reset()
        # Strong adhesion latches all feet (weak adhesion legitimately leaves
        # some legs hovering microns above the ground mid-settle).
        sim.set_leg_adhesion_states("alice", np.full(6, 100.0))
        sim.set_leg_adhesion_states("bob", np.full(6, 100.0))
        sim.warmup(0.15)
        found_a, *_ = sim.get_ground_contact_info("alice")
        found_b, *_ = sim.get_ground_contact_info("bob")
        assert found_a.sum() + found_b.sum() >= 8
        # Both flies standing at the same height (identical independent
        # physics).
        za = sim.get_body_positions("alice")[0, 2]
        zb = sim.get_body_positions("bob")[0, 2]
        assert abs(za - zb) < 0.05


class TestFlyFlyCollision:
    """Capsule-capsule contact rows: two flies physically interact
    (reference multi-fly worlds + explicit contact-pair machinery,
    ``world.py:95-149``)."""

    def _world(self, with_contacts):
        world = FlatGroundWorld()
        world.add_fly(
            _make_fly("below"), (0, 0, 1.2), Rotation3D("quat", (1, 0, 0, 0))
        )
        # Second fly dropped directly onto the first.
        world.add_fly(
            _make_fly("above"), (0, 0, 3.5), Rotation3D("quat", (1, 0, 0, 0))
        )
        if with_contacts:
            n = world.add_fly_fly_contacts(
                "below", "above", bodysegs="legs_thorax_abdomen_head"
            )
            assert n > 0
        return world

    def test_pair_rows_compiled(self):
        model, _ = self._world(True).compile()
        assert model.ncand_pair > 0
        assert model.ncand > model.ncand_pair
        # Pair rows carry a second geom/body; ground rows don't.
        import numpy as np2

        g2 = np2.asarray(model.can_geom2)
        ng = model.ncand - model.ncand_pair
        assert (g2[:ng] == -1).all()
        assert (g2[ng:] >= 0).all()
        # The legs_thorax_abdomen_head pair set (3,025 rows) triggers
        # nearest-neighbor pair compression (one kernel row per geom1
        # group). The full 55-group preset was VMEM-gated off the Mosaic
        # kernel until 2026-08-20 (measured 248.96 MiB fused on v5e,
        # 2026-08-19); the winner-index-row redesign (eq one-hots became
        # lazy in-kernel compares) plus the stream-rescue emitter choice
        # bring the ESTIMATE back under the gate, so it is kernel-
        # supported again — via the streaming emitter, not fused.
        import flygym_tpu.ops.megastep as ms

        assert model.pair_compress
        assert len(model.pair_groups) < model.ncand_pair
        assert ms._est_scoped_mb(model) > ms._VMEM_GATE_MB  # fused gates
        assert ms.megastep_supported(model)  # ...but stream rescues
        assert ms._stream_mode(model)

    def test_flies_collide_vs_pass_through(self):
        """With pair rows the upper fly rests ON the lower one; without, it
        falls straight through to the ground."""
        heights = {}
        for with_contacts in (False, True):
            sim = flygym_tpu.Simulation(self._world(with_contacts))
            sim.set_leg_adhesion_states("below", np.ones(6))
            for _ in range(600):
                sim.step()
            z_above = float(sim.get_body_positions("above")[0, 2])
            z_below = float(sim.get_body_positions("below")[0, 2])
            assert np.isfinite(z_above) and np.isfinite(z_below)
            heights[with_contacts] = (z_above, z_below)
        # Without contacts the two flies interpenetrate at ~equal height;
        # with contacts the upper fly is held clearly above the lower.
        dz_without = heights[False][0] - heights[False][1]
        dz_with = heights[True][0] - heights[True][1]
        assert dz_with > dz_without + 0.5, (
            f"fly-fly contact not holding: dz_with={dz_with:.3f} "
            f"dz_without={dz_without:.3f}"
        )


class TestThreeFlies:
    """N >= 3 flies: the all-pairs contact helper and pair-group integrity
    (reference ``add_fly`` supports arbitrary fly counts per world,
    ``world.py:95-149``; this exercises the repo's pair-group machinery
    past one fly-pair)."""

    def _bare_fly(self, name):
        from flygym_tpu.anatomy import Skeleton

        fly = Fly(name=name)
        fly.add_joints(
            Skeleton(
                axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY
            ),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        return fly

    def _three_fly_world(self, bodysegs):
        world = FlatGroundWorld()
        for i, nm in enumerate(("a", "b", "c")):
            world.add_fly(
                self._bare_fly(nm),
                (0, 0, 1.2 + 1.8 * i),
                Rotation3D("quat", (1, 0, 0, 0)),
            )
        n = world.add_all_fly_fly_contacts(bodysegs=bodysegs)
        return world, n

    def test_all_pairs_helper_counts_and_groups(self):
        from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment

        segs = [BodySegment("c_thorax")] + [
            BodySegment(s)
            for s in ALL_SEGMENT_NAMES
            if s.endswith("tarsus5")
        ]
        world, n = self._three_fly_world(segs)
        # 3 unordered fly pairs x 7x7 segments.
        assert n == 3 * 49
        world._spec.options["pair_compress"] = True
        model, _ = world.compile()
        assert model.ncand_pair == 147
        # One group per geom1 per opposing fly: 7 geom1 x (2 calls with
        # that fly on the geom1 side ... ) = 21 total (7 per fly pair).
        assert len(model.pair_groups) == 21
        assert all(size == 7 for _s, size in model.pair_groups)
        # Group members must come from ONE opposing fly's tree each.
        from flygym_tpu.ops import megastep as ms

        specs, _keep = ms._pair_group_specs(model)
        body_parent = np.asarray(model.body_parent)

        def root(b):
            while b != 0 and int(body_parent[b]) != 0:
                b = int(body_parent[b])
            return b

        for g in specs:
            roots = {root(b2) for _g2, b2 in g["members"]}
            assert len(roots) == 1, roots

    def test_groups_never_merge_across_opposing_flies(self):
        """Consecutive add_fly_fly_contacts calls that start and end on
        the SAME geom1 with the same params must still produce one group
        per opposing fly (the winner masks assume one geom2 tree per
        group)."""
        from flygym_tpu.anatomy import BodySegment

        world, n = self._three_fly_world([BodySegment("c_thorax")])
        assert n == 3  # one pair per fly pair, contiguous, same geom1 runs
        world._spec.options["pair_compress"] = True
        model, _ = world.compile()
        # a-b, a-c, b-c: the a-b and a-c rows share geom1 (a's thorax) and
        # params — without the geom2-root group key they would merge.
        assert len(model.pair_groups) == 3
        assert all(size == 1 for _s, size in model.pair_groups)

    def test_three_fly_pile_settles(self):
        """Drop three flies in a vertical stack: with all-pairs contacts
        they must interact (finite, bounded state; nobody tunnels to the
        center of the earth, nobody blows up) through impact and pile-up
        on the jnp path."""
        import jax
        import jax.numpy as jnp

        from flygym_tpu.anatomy import ALL_SEGMENT_NAMES, BodySegment
        from flygym_tpu.engine.step import rollout

        segs = [BodySegment("c_thorax")] + [
            BodySegment(s)
            for s in ALL_SEGMENT_NAMES
            if s.endswith("tarsus5")
        ]
        world, _n = self._three_fly_world(segs)
        world._spec.options["pair_compress"] = True
        model, state0 = world.compile()
        ctrl = jnp.full((1500, model.nu), jnp.nan, jnp.float32)
        final, _ = rollout(model, state0, ctrl, 1500, record=False)
        qp = np.asarray(final.qpos)
        qv = np.asarray(final.qvel)
        assert np.isfinite(qp).all() and np.isfinite(qv).all()
        z = [float(qp[model.free_joints[i][1] + 2]) for i in range(3)]
        # All three roots above the ground plane and below their spawns.
        assert all(0.2 < zi < 5.0 for zi in z), z
        # Post-impact motion is bounded (no energy blowup).
        assert np.abs(qv).max() < 50.0


class TestConfigApplier:
    def test_yaml_options(self, tmp_path):
        from flygym_tpu.compose.spec import ModelSpec
        from flygym_tpu.utils.config import apply_physics_options

        path = tmp_path / "globals.yaml"
        path.write_text(
            "option:\n"
            "  timestep: 2e-4\n"
            "  gravity: [0, 0, -9000]\n"
            "solver_iterations: 5\n"
            "custom_flag: 7\n"
        )
        spec = ModelSpec("cfg")
        applied = apply_physics_options(spec, path)
        assert spec.options["timestep"] == 2e-4
        assert spec.options["gravity"] == (0, 0, -9000)
        assert spec.options["solver_iterations"] == 5
        assert spec.options["extra"]["custom_flag"] == 7
        assert "timestep" in applied
