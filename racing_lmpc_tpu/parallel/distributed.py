"""Multi-host runtime: `jax.distributed` process group + global-mesh helpers.

The reference's "distributed" layer is two ROS2 processes on one machine
exchanging DDS messages (SURVEY.md section 2.7).  The TPU-native equivalent
is the single-controller multi-process JAX runtime: every host runs the same
program, `jax.distributed.initialize` forms the process group, and one
`jax.sharding.Mesh` spans all hosts' devices (ICI within a slice, DCN
across hosts).  The jitted scenario-parallel solve is then *identical* to
the single-host one — XLA inserts the cross-host collectives (psum for the
solved-fraction / cost reductions, all-gathers only where requested).

On CPU (tests, driver dry runs) the same path runs with the gloo collectives
backend and `--xla_force_host_platform_device_count` virtual devices per
process; see tests/test_multihost.py for a live two-process example.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the multi-host process group.

    Call once, before any other JAX API touches devices.  On the CPU
    backend the gloo collectives implementation is selected (the default
    errors out on cross-process collectives).
    """
    # NOTE: must not touch jax.devices()/default_backend() here — that would
    # initialize the backends before the process group exists.
    try:
        platforms = jax.config.read("jax_platforms")
    except Exception:
        platforms = None
    if not platforms:
        # config unset: fall back to the environment, else assume the
        # implicit default backend is CPU unless an accelerator plugin env
        # is present — an unset value does NOT mean a non-CPU backend, and
        # skipping gloo there breaks cross-process collectives.
        platforms = os.environ.get("JAX_PLATFORMS", "")
        if not platforms and not os.environ.get("PJRT_DEVICE") \
                and not os.environ.get("TPU_NAME"):
            platforms = "cpu"
    if platforms and "cpu" in str(platforms):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jaxlibs pick gloo automatically
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over every device of every process (global view)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_batch_global(tree: Any, mesh: Mesh, axis: str = "batch") -> Any:
    """Build globally-sharded arrays on a multi-process mesh.

    Every process passes the same full-size (global) host values — the
    deterministic scenario builders make that cheap — and each process
    materializes only its addressable shards.  (`jax.device_put` to a
    sharding with non-addressable devices is not allowed; this is the
    multi-process twin of `mesh.shard_batch`.)
    """
    def put(leaf):
        arr = np.asarray(leaf)
        spec = P() if arr.ndim == 0 else P(axis)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.tree.map(put, tree)


def process_allgather(tree: Any) -> Any:
    """Gather sharded outputs to full host arrays on every process."""
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda l: np.asarray(multihost_utils.process_allgather(
            l, tiled=True)) if getattr(l, "ndim", 0) > 0 else np.asarray(l),
        tree)
