"""Sensor reductions: per-leg ground-contact netforce sensors.

Produces the 16-dim layout the reference's contact sensors emit
(``found, force(3), torque(3), pos(3), normal(3), tangent(3)``; decoded in
flygym ``simulation.py:210-243``): forces/torques in the contact frame
(x = normal), positions/normal/tangent in the world frame.
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

    # Net torque about the representative position, in contact-frame coords.
    arm = info.pos - pos[jnp.clip(slot, 0, ns - 1)]
    torque_world = jnp.cross(arm, info.force_world) * w[:, None]
    torque_w = jnp.zeros((ns + 1, 3), dtype).at[slot].add(torque_world)
    torque_frame = torque_w[:ns] @ info.frame.T

    normal = jnp.broadcast_to(info.frame[0], (ns, 3))
    tangent = jnp.broadcast_to(info.frame[1], (ns, 3))

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
