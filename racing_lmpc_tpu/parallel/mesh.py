"""Mesh and sharding utilities for scenario-parallel LMPC.

The reference has no distributed backend (SURVEY.md section 2.7) — its
parallelism is ROS process concurrency + TBB loops.  The TPU-native
replacement: scenario batches (initial states, track segments, safe-set
variants) are data-parallel over a ``jax.sharding.Mesh``; XLA inserts the
collectives.  One jitted batched solve covers 1 chip, 1 host, and
multi-host identically — only the mesh changes.
"""

from __future__ import annotations

from functools import lru_cache, partial
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


def make_mesh_2d(devices=None, axes=("host", "batch"),
                 host_size: int | None = None) -> Mesh:
    """2-D ``(host, batch)`` mesh: the production multi-host topology.

    The outer axis maps to hosts (collectives ride DCN), the inner axis to
    the chips of each host (collectives ride ICI).  The scenario batch is
    sharded over BOTH axes — `P(("host", "batch"))` on the leading dim — so
    the same jitted solve covers 1 host and many; only the mesh changes.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if host_size is None:
        # prefer the real host partition when running multi-process;
        # otherwise emulate 2 hosts on an even device count
        host_size = jax.process_count() if jax.process_count() > 1 else (
            2 if n % 2 == 0 and n >= 2 else 1)
    assert n % host_size == 0, (n, host_size)
    # jax.devices() ordering is NOT guaranteed host-contiguous on real
    # multi-host topologies; sort by (process, id) so each mesh row holds
    # one host's chips and the inner-axis collectives actually ride ICI.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices).reshape(host_size, n // host_size), axes)


def _leading_spec(mesh: Mesh, axis) -> P:
    """PartitionSpec sharding the leading dim over the given axis name(s)."""
    return P(tuple(axis) if isinstance(axis, (tuple, list)) else axis)


def shard_batch(tree: Any, mesh: Mesh, axis="batch") -> Any:
    """Shard every leaf along its leading (batch) dimension.

    ``axis`` may be one mesh axis name or a tuple of names (2-D mesh: the
    batch dim is split over host x chip).
    """
    sharding = NamedSharding(mesh, _leading_spec(mesh, axis))

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


def sharded_batch_solver(solve_one: Callable, mesh: Mesh, axis="batch"):
    """jit a vmapped per-scenario solver with batch-dim sharding constraints.

    ``solve_one(*args)`` solves a single scenario; the returned callable
    takes leading-batch-dim args (already sharded via ``shard_batch``) and
    keeps outputs sharded along the same axis (or axes, on a 2-D mesh).
    """
    batched = jax.vmap(solve_one)

    def constrained(*args):
        out = batched(*args)
        spec = NamedSharding(mesh, _leading_spec(mesh, axis))
        return jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, spec)
            if getattr(l, "ndim", 0) > 0 else l, out)
    return jax.jit(constrained)


@lru_cache(maxsize=None)
def _metrics_fn(mesh: Mesh) -> Callable:
    """Build (once per mesh) the jitted cross-shard metrics reduction;
    jit's own trace cache then handles per-shape retraces.  Building the
    shard_map + jit inside each call would miss the trace cache every time
    (~70 ms/call on the 8-device CPU mesh — a per-control-cycle cost)."""
    axes = tuple(mesh.axis_names)
    in_spec = P(axes)

    def _m(s, c):
        n_solved = jax.lax.psum(jnp.sum(s.astype(jnp.float32)), axes)
        n_total = jax.lax.psum(
            jnp.full((), s.shape[0], dtype=jnp.float32), axes)
        # mask BEFORE reducing: for unsolved scenarios `c` is the last IPM
        # iterate's objective (possibly infeasible garbage) and must not
        # undercut a valid solution; all-unsolved reduces to +inf.
        cmin = jax.lax.pmin(
            jnp.min(jnp.where(s, c, jnp.inf), initial=jnp.inf), axes)
        return n_solved / n_total, cmin

    return jax.jit(jax.shard_map(_m, mesh=mesh, in_specs=(in_spec, in_spec),
                                 out_specs=(P(), P())))


def sharded_metrics(solved, cost, mesh: Mesh):
    """Cross-shard fleet metrics via explicit XLA collectives.

    The reference aggregates per-cycle diagnostics inside one process
    (racing_mpc_node.cpp:373-384); the fleet-scale twin reduces across every
    shard of the mesh: ``psum`` for the solved fraction, ``pmin`` for the
    best (minimum) objective over SOLVED scenarios — the collectives ride
    ICI within a host and DCN across hosts.  Returns replicated scalars
    (solved_fraction, min_cost); min_cost is +inf when nothing solved.
    """
    return _metrics_fn(mesh)(solved, cost)
