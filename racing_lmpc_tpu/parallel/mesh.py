"""Mesh and sharding utilities for scenario-parallel LMPC.

The reference has no distributed backend (SURVEY.md section 2.7) — its
parallelism is ROS process concurrency + TBB loops.  The TPU-native
replacement: scenario batches (initial states, track segments, safe-set
variants) are data-parallel over a ``jax.sharding.Mesh``; XLA inserts the
collectives.  One jitted batched solve covers 1 chip, 1 host, and
multi-host identically — only the mesh changes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "batch") -> Any:
    """Shard every leaf along its leading (batch) dimension."""
    sharding = NamedSharding(mesh, P(axis))

    def put(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, sharding)
    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda l: jax.device_put(jnp.asarray(l), sharding), tree)


def sharded_batch_solver(solve_one: Callable, mesh: Mesh, axis: str = "batch"):
    """jit a vmapped per-scenario solver with batch-dim sharding constraints.

    ``solve_one(*args)`` solves a single scenario; the returned callable
    takes leading-batch-dim args (already sharded via ``shard_batch``) and
    keeps outputs sharded along the same axis.
    """
    batched = jax.vmap(solve_one)

    def constrained(*args):
        out = batched(*args)
        spec = NamedSharding(mesh, P(axis))
        return jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, spec)
            if getattr(l, "ndim", 0) > 0 else l, out)
    return jax.jit(constrained)
