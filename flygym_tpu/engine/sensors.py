"""Sensor reductions: per-leg ground-contact netforce sensors.

Produces the 16-dim layout the reference's contact sensors emit
(``found, force(3), torque(3), pos(3), normal(3), tangent(3)``; decoded in
flygym ``simulation.py:210-243``): forces/torques in the contact frame
(x = normal), positions/normal/tangent in the world frame. With rugged
terrain, each sensor reports the force-weighted mean contact normal.
"""

import jax.numpy as jnp

from flygym_tpu.engine.model import PhysicsModel

__all__ = ["contact_sensor_data"]


def contact_sensor_data(model: PhysicsModel, info) -> jnp.ndarray:
    """Reduce selected contacts into (nsensor_contact, 16) netforce rows."""
    ns = model.nsensor_contact
    if ns == 0 or info is None:
        return jnp.zeros((max(ns, 0), 16), jnp.float32)

    dtype = info.pos.dtype
    # Inactive or unsensored contacts scatter into a scratch slot.
    slot = jnp.where(info.active & (info.sensor >= 0), info.sensor, ns)

    w = jnp.where(info.active & (info.sensor >= 0), 1.0, 0.0)
    count = jnp.zeros((ns + 1,), dtype).at[slot].add(w)
    found = (count[:ns] > 0).astype(dtype)

    force_frame = jnp.zeros((ns + 1, 3), dtype).at[slot].add(
        info.force_frame * w[:, None]
    )

    # Representative position: force-magnitude-weighted mean of contact points.
    fmag = jnp.abs(info.force_frame[:, 0]) * w
    fmag_sum = jnp.zeros((ns + 1,), dtype).at[slot].add(fmag)
    pos_w = jnp.zeros((ns + 1, 3), dtype).at[slot].add(info.pos * fmag[:, None])
    pos_plain = jnp.zeros((ns + 1, 3), dtype).at[slot].add(info.pos * w[:, None])
    pos = jnp.where(
        fmag_sum[:ns, None] > 1e-12,
        pos_w[:ns] / jnp.maximum(fmag_sum[:ns, None], 1e-12),
        pos_plain[:ns] / jnp.maximum(count[:ns, None], 1.0),
    )

    # Representative frame: weighted mean normal, re-orthogonalized tangent.
    normals = info.frame[:, 0]  # (K, 3)
    tangents = info.frame[:, 1]
    n_sum = jnp.zeros((ns + 1, 3), dtype).at[slot].add(normals * w[:, None])
    t_sum = jnp.zeros((ns + 1, 3), dtype).at[slot].add(tangents * w[:, None])
    normal = n_sum[:ns]
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    default_n = jnp.array([0.0, 0.0, 1.0], dtype)
    normal = jnp.where(norm > 1e-9, normal / jnp.maximum(norm, 1e-12), default_n)
    tangent = t_sum[:ns]
    tangent = tangent - jnp.sum(tangent * normal, -1, keepdims=True) * normal
    tnorm = jnp.linalg.norm(tangent, axis=-1, keepdims=True)
    default_t = jnp.array([1.0, 0.0, 0.0], dtype)
    tangent = jnp.where(
        tnorm > 1e-9, tangent / jnp.maximum(tnorm, 1e-12), default_t
    )

    # Net torque about the representative position, in the sensor frame.
    arm = info.pos - pos[jnp.clip(slot, 0, ns - 1)]
    torque_world = jnp.cross(arm, info.force_world) * w[:, None]
    tw = jnp.zeros((ns + 1, 3), dtype).at[slot].add(torque_world)[:ns]
    t2 = jnp.cross(normal, tangent)
    torque_frame = jnp.stack(
        [
            jnp.sum(tw * normal, -1),
            jnp.sum(tw * tangent, -1),
            jnp.sum(tw * t2, -1),
        ],
        axis=-1,
    )

    return jnp.concatenate(
        [
            found[:, None],
            force_frame[:ns],
            torque_frame,
            pos,
            normal,
            tangent,
        ],
        axis=-1,
    )
