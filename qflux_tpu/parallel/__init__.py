from qflux_tpu.parallel.mesh import MeshConfig, build_mesh, local_batch_size
from qflux_tpu.parallel.partitioning import (
    PartitionRules,
    named_sharding_tree,
    shard_pytree,
    spec_tree_from_rules,
)

__all__ = [
    "MeshConfig",
    "build_mesh",
    "local_batch_size",
    "PartitionRules",
    "named_sharding_tree",
    "shard_pytree",
    "spec_tree_from_rules",
]
