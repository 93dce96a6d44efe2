"""Tests for the native (C++) mesh toolchain and its numpy fallback."""

import numpy as np
import pytest

from flygym_tpu.native import capsule_fit, load_stl, mass_properties
from flygym_tpu.native.meshtools import (
    _capsule_fit_numpy,
    _load_stl_numpy,
    _mass_properties_numpy,
    native_available,
)


def make_box_mesh(a=1.0, b=2.0, c=3.0):
    """A closed box mesh (12 triangles) with outward-facing winding."""
    x, y, z = a / 2, b / 2, c / 2
    v = np.array(
        [
            [-x, -y, -z], [x, -y, -z], [x, y, -z], [-x, y, -z],
            [-x, -y, z], [x, -y, z], [x, y, z], [-x, y, z],
        ]
    )
    faces = [
        (0, 2, 1), (0, 3, 2),  # bottom
        (4, 5, 6), (4, 6, 7),  # top
        (0, 1, 5), (0, 5, 4),  # front
        (2, 3, 7), (2, 7, 6),  # back
        (1, 2, 6), (1, 6, 5),  # right
        (3, 0, 4), (3, 4, 7),  # left
    ]
    return np.array([[v[i], v[j], v[k]] for i, j, k in faces])


class TestMassProperties:
    def test_box_analytic(self):
        tris = make_box_mesh(1.0, 2.0, 3.0)
        vol, com, inertia = mass_properties(tris)
        assert vol == pytest.approx(6.0, rel=1e-9)
        assert np.allclose(com, 0.0, atol=1e-9)
        # Box inertia (unit density): m/12 (b^2+c^2) etc with m = vol.
        m = 6.0
        expected = m / 12 * np.array([4 + 9, 1 + 9, 1 + 4])
        assert np.allclose(np.diag(inertia), expected, rtol=1e-9)
        assert np.allclose(inertia - np.diag(np.diag(inertia)), 0, atol=1e-9)

    def test_translation_shifts_com_only(self):
        tris = make_box_mesh() + np.array([1.0, -2.0, 0.5])
        vol, com, inertia = mass_properties(tris)
        assert vol == pytest.approx(6.0, rel=1e-9)
        assert np.allclose(com, [1.0, -2.0, 0.5], atol=1e-9)
        _, _, inertia0 = mass_properties(make_box_mesh())
        assert np.allclose(inertia, inertia0, atol=1e-7)

    def test_negative_scale_mirroring(self):
        tris = make_box_mesh() + np.array([0.0, 1.0, 0.0])
        vol, com, _ = mass_properties(tris, scale=(1.0, -1.0, 1.0))
        assert vol == pytest.approx(6.0, rel=1e-9)
        assert com[1] == pytest.approx(-1.0, abs=1e-9)

    def test_native_matches_numpy(self):
        if not native_available():
            pytest.skip("native library unavailable")
        tris = make_box_mesh(0.7, 1.3, 2.9) + 0.3
        scale = np.array([2.0, 1.0, 0.5])
        out_native = mass_properties(tris, scale)
        out_np = _mass_properties_numpy(
            np.ascontiguousarray(tris), scale
        )
        assert out_native[0] == pytest.approx(out_np[0], rel=1e-12)
        assert np.allclose(out_native[1], out_np[1], atol=1e-12)
        assert np.allclose(out_native[2], out_np[2], atol=1e-12)


class TestCapsuleFit:
    def test_elongated_box_axis(self):
        tris = make_box_mesh(0.4, 0.4, 5.0)
        pos, quat, radius, half = capsule_fit(tris)
        assert np.allclose(pos, 0, atol=1e-9)
        # Axis should be z: quat ~ identity (or z-flip).
        assert abs(abs(quat[0]) - 1) < 1e-6 or abs(quat[1]) > 0.99
        assert radius == pytest.approx(np.hypot(0.2, 0.2), rel=1e-6)
        assert half == pytest.approx(2.5 - radius, rel=1e-6)

    def test_native_matches_numpy(self):
        if not native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        tris = make_box_mesh(1, 1, 4) + rng.normal(scale=0.01, size=(12, 3, 3))
        got = capsule_fit(tris)
        exp = _capsule_fit_numpy(np.ascontiguousarray(tris), np.ones(3))
        assert got[2] == pytest.approx(exp[2], rel=1e-9)
        assert got[3] == pytest.approx(exp[3], rel=1e-9)
        assert np.allclose(got[0], exp[0], atol=1e-9)


class TestSTLRoundtrip:
    def _write_binary_stl(self, path, tris):
        import struct

        with open(path, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", len(tris)))
            for t in tris:
                f.write(struct.pack("<3f", 0, 0, 0))
                for v in t:
                    f.write(struct.pack("<3f", *v))
                f.write(struct.pack("<H", 0))

    def test_binary_roundtrip(self, tmp_path):
        tris = make_box_mesh().astype(np.float32).astype(np.float64)
        path = tmp_path / "box.stl"
        self._write_binary_stl(path, tris)
        loaded = load_stl(path)
        assert loaded.shape == (12, 3, 3)
        assert np.allclose(loaded, tris, atol=1e-6)
        loaded_np = _load_stl_numpy(path)
        assert np.allclose(loaded_np, tris, atol=1e-6)

    def test_ascii_roundtrip(self, tmp_path):
        tris = make_box_mesh()
        lines = ["solid box"]
        for t in tris:
            lines.append("facet normal 0 0 0")
            lines.append("outer loop")
            for v in t:
                lines.append(f"vertex {v[0]} {v[1]} {v[2]}")
            lines.append("endloop")
            lines.append("endfacet")
        lines.append("endsolid box")
        path = tmp_path / "box_ascii.stl"
        path.write_text("\n".join(lines))
        loaded = load_stl(path)
        assert loaded.shape == (12, 3, 3)
        assert np.allclose(loaded, tris, atol=1e-12)


def _write_stl(path, tris):
    import struct

    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


class TestRuntimeMeshGeometry:
    """Compose-time geometry derivation from user STL directories
    (Fly(mesh_basedir=...), the reference's runtime mesh path,
    flygym ``compose/fly.py:507-543``)."""

    def test_derive_box_analytic(self, tmp_path):
        from flygym_tpu.compose.meshes import derive_geometry_from_meshes

        # Box 1x2x3 mm at mesh scale 1e-3 m (so SCALE=1000 restores mm).
        tris = make_box_mesh(1e-3, 2e-3, 3e-3)
        _write_stl(tmp_path / "c_seg.stl", tris)
        _write_stl(tmp_path / "l_seg.stl", tris + np.array([1e-3, 2e-3, 0]))
        rigging = {
            "c_seg": {"mass": 6e-6},
            "l_seg": {"mass": 1e-6},
            "r_seg": {"mass": 1e-6},
        }
        geo = derive_geometry_from_meshes(tmp_path, rigging)
        mi = geo["c_seg"]["mesh_inertia"]
        # Box inertia at mass m: m/12 (b^2+c^2) etc, mm units.
        m = 6e-6
        expected = sorted(m / 12 * np.array([4 + 9, 1 + 9, 1 + 4]))[::-1]
        assert np.allclose(sorted(mi["diag"])[::-1], expected, rtol=1e-3)
        assert np.allclose(mi["ipos"], 0.0, atol=1e-6)
        # Mirrored right segment: com flips across y, volume stays positive.
        li = geo["l_seg"]["mesh_inertia"]
        ri = geo["r_seg"]["mesh_inertia"]
        assert ri["ipos"][0] == pytest.approx(li["ipos"][0], abs=1e-9)
        assert ri["ipos"][1] == pytest.approx(-li["ipos"][1], abs=1e-9)
        assert np.allclose(sorted(ri["diag"]), sorted(li["diag"]), rtol=1e-9)
        # Capsule fit present and sane.
        cap = geo["c_seg"]["capsule"]
        assert cap["size"][0] > 0 and cap["size"][1] >= 0

    def test_fly_from_mesh_basedir_compiles_and_steps(self, tmp_path):
        import jax

        from flygym_tpu.anatomy import JointPreset, Skeleton
        from flygym_tpu.compose import (
            Fly,
            KinematicPosePreset,
            TetheredWorld,
        )
        from flygym_tpu.engine.step import step
        from flygym_tpu.utils.math import Rotation3D

        # One blob mesh reused for every needed source segment (left +
        # center names; right sides mirror from left).
        import json

        from flygym_tpu.compose.fly import DEFAULT_RIGGING_CONFIG_PATH

        rigging = json.loads(DEFAULT_RIGGING_CONFIG_PATH.read_text())
        tris = make_box_mesh(4e-4, 2e-4, 6e-4)
        needed = {
            (f"l{n[1:]}" if n[0] == "r" else n) for n in rigging
        }
        for name in needed:
            _write_stl(tmp_path / f"{name}.stl", tris)

        fly = Fly(name="meshfly", mesh_basedir=tmp_path)
        fly.add_joints(
            Skeleton(axis_order="ypr", joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        world = TetheredWorld()
        world.add_fly(fly, (0, 0, 3.0), Rotation3D("quat", (1, 0, 0, 0)))
        model, state = world.compile()
        assert model.nv == 66
        jstep = jax.jit(step)
        for _ in range(5):
            state = jstep(model, state)
        assert np.isfinite(np.asarray(state.qpos)).all()
