"""Simulation state checkpointing.

The reference's checkpoint/resume story is the MJCF neutral keyframe plus
model XML export (SURVEY.md §5). The TPU build keeps both (compile-time
``qpos0``/``ctrl0``; ``save_xml_with_assets``) and adds what a long-running
batched simulation actually needs: saving/restoring the full dynamic
:class:`~flygym_tpu.engine.model.State` pytree (single or batched) to disk.
"""

from os import PathLike
from pathlib import Path

import jax
import numpy as np

from flygym_tpu.engine.model import State

__all__ = ["save_state", "load_state"]

_FIELDS = (
    "qpos",
    "qvel",
    "ctrl",
    "act",
    "time",
    "qacc",
    "xpos",
    "xquat",
    "site_xpos",
    "actuator_force",
    "contact_sensordata",
)


def save_state(state: State, path: PathLike) -> None:
    """Write a State (optionally world-batched) to a compressed npz file."""
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(path: PathLike) -> State:
    """Load a State previously written by :func:`save_state`."""
    data = np.load(Path(path))
    import jax.numpy as jnp

    return State(**{name: jnp.asarray(data[name]) for name in _FIELDS})


def put_like(state: State, reference: State) -> State:
    """Device-put a loaded state with the shardings of a live reference state
    (for restoring into a mesh-sharded BatchSimulation)."""
    return jax.device_put(
        state, jax.tree.map(lambda x: x.sharding, reference)
    )
