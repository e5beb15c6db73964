"""Multi-chip scaling: mesh construction, scenario-batch sharding, and the
multi-host (`jax.distributed`) runtime."""

from racing_lmpc_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_batch,
    replicate,
    sharded_batch_solver,
    sharded_metrics,
)
from racing_lmpc_tpu.parallel import distributed

__all__ = ["make_mesh", "make_mesh_2d", "shard_batch", "replicate",
           "sharded_batch_solver", "sharded_metrics", "distributed"]
