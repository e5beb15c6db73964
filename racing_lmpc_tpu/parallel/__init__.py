"""Multi-chip scaling: mesh construction and scenario-batch sharding."""

from racing_lmpc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_batch_solver,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "sharded_batch_solver"]
