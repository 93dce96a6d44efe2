"""Device-side quaternion and spatial (Plücker) algebra.

Conventions
-----------
- Quaternions are (w, x, y, z), normalized, representing rotations from the
  local frame to the world frame (``v_world = R(q) v_local``).
- Spatial motion vectors are 6D ``(angular, linear)`` in world axes, referenced
  at a caller-chosen reference point. Spatial force vectors are
  ``(torque, force)`` about the same point.

All functions broadcast over leading batch dimensions and operate in the input
dtype (the engine uses float32).
"""

import jax.numpy as jnp

__all__ = [
    "quat_mul",
    "quat_conj",
    "quat_rotate",
    "quat_rotate_inv",
    "quat_from_axis_angle",
    "quat_integrate",
    "quat_to_mat",
    "mat_to_quat",
    "normalize_quat",
    "skew",
    "motion_cross",
    "force_cross",
    "spatial_inertia",
]


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b for (..., 4) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors (..., 3) by quaternions (..., 4): local → world."""
    qw = q[..., :1]
    qv = q[..., 1:]
    # v' = v + 2 qw (qv × v) + 2 qv × (qv × v)
    uv = jnp.cross(qv, v)
    return v + 2.0 * (qw * uv + jnp.cross(qv, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate by the inverse quaternion: world → local."""
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion for a rotation of ``angle`` about unit ``axis``.

    ``axis``: (..., 3); ``angle``: (...,). Returns (..., 4).
    """
    axis = jnp.asarray(axis)
    half = 0.5 * jnp.asarray(angle)[..., None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by a world-frame angular velocity over dt.

    Uses the exact exponential map: q' = exp(ω dt / 2) ⊗ q.
    """
    rot = omega_world * dt
    angle = jnp.linalg.norm(rot, axis=-1)
    # Safe normalize: axis irrelevant when angle ~ 0 (sin(0) = 0).
    axis = rot / jnp.maximum(angle[..., None], 1e-12)
    dq = quat_from_axis_angle(axis, angle)
    return normalize_quat(quat_mul(dq, q))


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) → rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4), w-first.

    Branch-free Shepperd's method: computes all four candidate solutions
    and selects the numerically strongest via ``where`` (jit/vmap-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate from the trace and from each diagonal element.
    qw_t = 0.5 * safe_sqrt(1.0 + tr)
    q_t = jnp.stack(
        [qw_t, (m21 - m12) / (4 * qw_t), (m02 - m20) / (4 * qw_t),
         (m10 - m01) / (4 * qw_t)], axis=-1)
    qx_x = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    q_x = jnp.stack(
        [(m21 - m12) / (4 * qx_x), qx_x, (m01 + m10) / (4 * qx_x),
         (m02 + m20) / (4 * qx_x)], axis=-1)
    qy_y = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    q_y = jnp.stack(
        [(m02 - m20) / (4 * qy_y), (m01 + m10) / (4 * qy_y), qy_y,
         (m12 + m21) / (4 * qy_y)], axis=-1)
    qz_z = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    q_z = jnp.stack(
        [(m10 - m01) / (4 * qz_z), (m02 + m20) / (4 * qz_z),
         (m12 + m21) / (4 * qz_z), qz_z], axis=-1)

    use_t = tr > 0.0
    use_x = (~use_t) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_t) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_t[..., None], q_t,
        jnp.where(use_x[..., None], q_x, jnp.where(use_y[..., None], q_y, q_z)),
    )
    return normalize_quat(q)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of (..., 3) vectors: (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def motion_cross(m: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product m ×̂ other for (..., 6) motion vectors."""
    w, v = m[..., :3], m[..., 3:]
    ow, ov = other[..., :3], other[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ow), jnp.cross(w, ov) + jnp.cross(v, ow)], axis=-1
    )


def force_cross(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product m ×̂* f (motion (..., 6) acting on force)."""
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia(
    mass: jnp.ndarray,
    inertia_world: jnp.ndarray,
    com_offset: jnp.ndarray,
) -> jnp.ndarray:
    """Spatial inertia (..., 6, 6) about a reference point.

    Args:
        mass: (...,) body mass.
        inertia_world: (..., 3, 3) rotational inertia about the com, in world
            axes.
        com_offset: (..., 3) com position relative to the reference point,
            in world axes.

    Featherstone: I = [[Ī + m c× c×ᵀ, m c×], [m c×ᵀ, m·1]].
    """
    c = skew(com_offset)
    ct = jnp.swapaxes(c, -1, -2)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com_offset.dtype), c.shape)
    top_left = inertia_world + m * (c @ ct)
    top_right = m * c
    bottom_left = m * ct
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
