"""Tests for host-side utilities (Tree, Rotation3D).

Modeled on flygym ``tests/core/test_utils.py``.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.fast
from scipy.spatial.transform import Rotation as R

from flygym_tpu.utils.math import Rotation3D, Tree, orderedset


class TestTree:
    def test_valid_tree(self):
        tree = Tree(nodes=["a", "b", "c"], edges=[("a", "b"), ("b", "c")])
        assert list(tree.dfs_edges("a")) == [("a", "b"), ("b", "c")]

    def test_dfs_from_middle(self):
        tree = Tree(nodes=["a", "b", "c"], edges=[("a", "b"), ("b", "c")])
        assert list(tree.dfs_edges("b")) == [("b", "a"), ("b", "c")]

    def test_dfs_child_order_is_insertion_order(self):
        tree = Tree(
            nodes=["root", "x", "y", "z"],
            edges=[("root", "x"), ("root", "y"), ("x", "z")],
        )
        assert list(tree.dfs_edges("root")) == [
            ("root", "x"),
            ("x", "z"),
            ("root", "y"),
        ]

    def test_duplicate_nodes(self):
        with pytest.raises(ValueError):
            Tree(nodes=["a", "a"], edges=[])

    def test_self_loop(self):
        with pytest.raises(ValueError):
            Tree(nodes=["a"], edges=[("a", "a")])

    def test_unknown_node_in_edge(self):
        with pytest.raises(ValueError):
            Tree(nodes=["a"], edges=[("a", "b")])

    def test_parallel_edges(self):
        with pytest.raises(ValueError):
            Tree(nodes=["a", "b"], edges=[("a", "b"), ("b", "a")])

    def test_cycle(self):
        with pytest.raises(ValueError):
            Tree(
                nodes=["a", "b", "c"],
                edges=[("a", "b"), ("b", "c"), ("c", "a")],
            )

    def test_disconnected(self):
        with pytest.raises(ValueError):
            Tree(nodes=["a", "b", "c", "d"], edges=[("a", "b"), ("c", "d")])

    def test_unknown_root(self):
        tree = Tree(nodes=["a", "b"], edges=[("a", "b")])
        with pytest.raises(ValueError):
            list(tree.dfs_edges("zzz"))

    def test_empty_tree(self):
        Tree(nodes=[], edges=[])


def test_orderedset():
    assert orderedset([3, 1, 3, 2, 1]) == [3, 1, 2]


class TestRotation3D:
    def test_valid_formats(self):
        Rotation3D("quat", (1, 0, 0, 0))
        Rotation3D("axisangle", (0, 0, 1, 0.5))
        Rotation3D("xyaxes", (1, 0, 0, 0, 1, 0))
        Rotation3D("zaxis", (0, 0, 1))
        Rotation3D("euler", (0.1, 0.2, 0.3))

    def test_wrong_dims(self):
        with pytest.raises(ValueError):
            Rotation3D("quat", (1, 0, 0))
        with pytest.raises(ValueError):
            Rotation3D("euler", (1, 0, 0, 0))

    def test_bad_format(self):
        with pytest.raises(ValueError):
            Rotation3D("matrix", (1, 0, 0))

    def test_non_numeric(self):
        with pytest.raises(ValueError):
            Rotation3D("zaxis", ("a", "b", "c"))

    def test_as_kwargs(self):
        rot = Rotation3D("quat", (1, 0, 0, 0))
        assert rot.as_kwargs() == {"quat": (1, 0, 0, 0)}

    # --- quaternion conversions, cross-checked against scipy ---

    @staticmethod
    def _assert_quat_equiv(q_wxyz, scipy_rot):
        expected = scipy_rot.as_quat()  # xyzw
        got = np.array([*q_wxyz[1:], q_wxyz[0]])
        # Quaternion double cover: q and -q are the same rotation.
        assert np.allclose(got, expected, atol=1e-9) or np.allclose(
            -got, expected, atol=1e-9
        )

    def test_quat_identity(self):
        q = Rotation3D("quat", (1, 0, 0, 0)).as_quat_wxyz()
        assert np.allclose(q, [1, 0, 0, 0])

    def test_axisangle(self):
        q = Rotation3D("axisangle", (0, 0, 1, 0.7)).as_quat_wxyz()
        self._assert_quat_equiv(q, R.from_rotvec([0, 0, 0.7]))

    def test_euler_xyz_intrinsic(self):
        angles = (0.3, -0.4, 0.9)
        q = Rotation3D("euler", angles).as_quat_wxyz()
        self._assert_quat_equiv(q, R.from_euler("XYZ", angles))

    def test_zaxis(self):
        z = np.array([1.0, 2.0, 2.0]) / 3.0
        q = Rotation3D("zaxis", tuple(z)).as_quat_wxyz()
        rot = R.from_quat([*q[1:], q[0]])
        assert np.allclose(rot.apply([0, 0, 1]), z, atol=1e-9)

    def test_xyaxes(self):
        q = Rotation3D("xyaxes", (1, 0, 0, 0, 0.6, 0.8)).as_quat_wxyz()
        rot = R.from_quat([*q[1:], q[0]])
        assert np.allclose(rot.apply([1, 0, 0]), [1, 0, 0], atol=1e-9)
        assert np.allclose(rot.apply([0, 1, 0]), [0, 0.6, 0.8], atol=1e-9)
