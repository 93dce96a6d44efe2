"""Multi-chip scale-out over TPU meshes.

The fly workload has exactly one axis of parallelism — independent worlds
(the reference's world/batch parallelism, SURVEY.md §2.4; the reference is
explicitly single-GPU, ``warp/utils.py:192-203``). The TPU design shards that
axis over a 1D device mesh with ``jax.sharding``: the physics step contains
no cross-world operations, so SPMD execution needs **zero collectives** on
the hot path — scaling rides ICI bandwidth only for the initial placement.

Model arrays replicate (a few hundred KB); state shards by world. Both are
ordinary ``NamedSharding``s, so the same jitted step runs unchanged from 1
chip to a full pod slice, and multi-slice deployments shard the world axis
over DCN just as well (no gradient all-reduce exists in this domain).

Usage:
    mesh = make_world_mesh()                       # all local devices
    sim = BatchSimulation(world, 8192, mesh=mesh)  # worlds sharded
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_world_mesh", "shard_world_axis", "replicate_model"]


def make_world_mesh(devices=None, axis_name: str = "world") -> Mesh:
    """A 1D mesh over the given devices (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def shard_world_axis(tree, mesh: Mesh, axis_name: str = "world"):
    """Place a world-batched pytree with its leading axis sharded over the
    mesh (every leaf must have the world axis first)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, jax.tree.map(lambda _: sharding, tree))


def replicate_model(model, mesh: Mesh):
    """Replicate a PhysicsModel's arrays on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(model, jax.tree.map(lambda _: sharding, model))
