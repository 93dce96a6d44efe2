"""Quaternion / spatial algebra tests, cross-checked against scipy."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from flygym_tpu.engine import maths


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestQuat:
    def test_mul_matches_scipy(self, rng):
        for _ in range(5):
            a, b = _rand_quat(rng), _rand_quat(rng)
            got = np.asarray(maths.quat_mul(a, b))
            ra = R.from_quat([*a[1:], a[0]])
            rb = R.from_quat([*b[1:], b[0]])
            exp = (ra * rb).as_quat()  # xyzw
            exp = np.array([exp[3], *exp[:3]])
            assert np.allclose(got, exp, atol=1e-6) or np.allclose(
                got, -exp, atol=1e-6
            )

    def test_rotate_matches_scipy(self, rng):
        for _ in range(5):
            q, v = _rand_quat(rng), rng.normal(size=3)
            got = np.asarray(maths.quat_rotate(q, v))
            exp = R.from_quat([*q[1:], q[0]]).apply(v)
            assert np.allclose(got, exp, atol=1e-5)

    def test_rotate_inv(self, rng):
        q, v = _rand_quat(rng), rng.normal(size=3)
        out = maths.quat_rotate_inv(q, maths.quat_rotate(q, v))
        assert np.allclose(np.asarray(out), v, atol=1e-5)

    def test_to_mat_matches_scipy(self, rng):
        q = _rand_quat(rng)
        got = np.asarray(maths.quat_to_mat(q))
        exp = R.from_quat([*q[1:], q[0]]).as_matrix()
        assert np.allclose(got, exp, atol=1e-6)

    def test_axis_angle(self):
        q = np.asarray(maths.quat_from_axis_angle(np.array([0.0, 0, 1]), np.pi / 2))
        v = np.asarray(maths.quat_rotate(q, np.array([1.0, 0, 0])))
        assert np.allclose(v, [0, 1, 0], atol=1e-6)

    def test_integrate_constant_omega(self):
        # Integrating omega = (0, 0, pi) for 1 s in 1000 steps = 180 deg turn.
        q = np.array([1.0, 0, 0, 0])
        omega = np.array([0.0, 0, np.pi])
        for _ in range(1000):
            q = maths.quat_integrate(q, omega, 1e-3)
        v = np.asarray(maths.quat_rotate(q, np.array([1.0, 0, 0])))
        assert np.allclose(v, [-1, 0, 0], atol=1e-4)

    def test_integrate_zero_omega_is_identity(self):
        q = np.array([0.5, 0.5, 0.5, 0.5])
        q2 = np.asarray(maths.quat_integrate(q, np.zeros(3), 1e-3))
        assert np.allclose(q2, q, atol=1e-7)


class TestSpatial:
    def test_skew(self, rng):
        a, b = rng.normal(size=3), rng.normal(size=3)
        assert np.allclose(np.asarray(maths.skew(a)) @ b, np.cross(a, b), atol=1e-6)

    def test_motion_cross_vs_matrix(self, rng):
        # m ×̂ is [[wx, 0], [vx, wx]] in (ang, lin) block form.
        m, other = rng.normal(size=6), rng.normal(size=6)
        got = np.asarray(maths.motion_cross(m, other))
        wx = np.asarray(maths.skew(m[:3]))
        vx = np.asarray(maths.skew(m[3:]))
        mat = np.block([[wx, np.zeros((3, 3))], [vx, wx]])
        assert np.allclose(got, mat @ other, atol=1e-5)

    def test_force_cross_is_dual(self, rng):
        # d/dt (m·f) consistency: m1 ×* f is the dual of m1 ×̂.
        m1, m2, f = rng.normal(size=6), rng.normal(size=6), rng.normal(size=6)
        lhs = np.dot(np.asarray(maths.motion_cross(m1, m2)), f)
        rhs = -np.dot(m2, np.asarray(maths.force_cross(m1, f)))
        assert np.allclose(lhs, rhs, atol=1e-5)

    def test_spatial_inertia_point_mass(self):
        # Pure point mass at offset c: force for unit linear acceleration = m.
        mass = np.array(2.0)
        I_rot = np.zeros((3, 3))
        c = np.array([1.0, 0, 0])
        I = np.asarray(maths.spatial_inertia(mass, I_rot, c))
        # linear acceleration (0, 0, 1) → force (0, 0, m), torque m c × a.
        a = np.concatenate([np.zeros(3), [0, 0, 1]])
        f = I @ a
        assert np.allclose(f[3:], [0, 0, 2.0], atol=1e-6)
        assert np.allclose(f[:3], 2.0 * np.cross(c, [0, 0, 1]), atol=1e-6)
