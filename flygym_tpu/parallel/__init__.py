from flygym_tpu.parallel.mesh import (
    make_world_mesh,
    replicate_model,
    shard_world_axis,
)

__all__ = ["make_world_mesh", "shard_world_axis", "replicate_model"]
