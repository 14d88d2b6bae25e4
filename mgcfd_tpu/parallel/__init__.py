from .partition import partition_mesh, ShardedMeshData
from .sharded import ShardedSolver, make_sharded_cycle_fn, dryrun

__all__ = ["partition_mesh", "ShardedMeshData", "ShardedSolver",
           "make_sharded_cycle_fn", "dryrun"]
