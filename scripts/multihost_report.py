"""Generate MULTIHOST.json — the recorded scale-out artifact (VERDICT r3 #6).

Three measurements:
1. weak-scaling of the sharded LMPC batch solve over a virtual 1/2/4/8-device
   CPU mesh (`benchmarks.scaling_bench`);
2. the same solve on a 2-D (host, batch) mesh with cross-shard collective
   metrics (psum/pmin);
3. a live two-process `jax.distributed` run (gloo collectives) using the
   tests/multihost_worker.py harness, recording its weak-scale ratio and
   local/global step latencies.

Caveat recorded in the artifact: virtual CPU devices share one host's
cores, so "efficiency" here validates the sharded program + collective
path, not hardware scaling; the >=90% BASELINE.md target is a real-TPU
multi-host criterion to be re-measured on hardware.

Usage: python scripts/multihost_report.py   (writes MULTIHOST.json)
"""

import json
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def two_process_gloo():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    worker = str(REPO / "tests" / "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=840)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"gloo worker failed:\n{out}")
    m = re.search(
        r"MULTIHOST_OK pid=\d+ solved=([\d.]+) checksum=(-?[\d.]+) "
        r"min_cost=(-?[\d.]+) weakscale=([\d.]+) t_local_ms=([\d.]+) "
        r"t_global_ms=([\d.]+)", outs[0])
    assert m, outs[0]
    return {
        "processes": 2,
        "devices_per_process": 2,
        "solved_fraction": float(m.group(1)),
        "weak_scaling_ratio_local_vs_global": float(m.group(4)),
        "t_local_ms": float(m.group(5)),
        "t_global_ms": float(m.group(6)),
    }


def mesh_2d_bench():
    from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch
    from racing_lmpc_tpu.parallel import (
        make_mesh_2d, shard_batch, sharded_batch_solver, sharded_metrics)

    model, track, cfg, mpc, manager = build_barc_lmpc(n_horizon=20, num_ss=48)
    devices = jax.devices()[:8]
    mesh2 = make_mesh_2d(devices, host_size=2)
    axes = ("host", "batch")
    batch = 64
    inp = make_scenario_batch(mpc, track, manager, batch)
    z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((batch,), dtype=bool)
    solver = sharded_batch_solver(mpc._solve_impl, mesh2, axis=axes)
    args = (shard_batch(inp, mesh2, axis=axes),
            shard_batch(z, mesh2, axis=axes),
            shard_batch(valid, mesh2, axis=axes))
    out, _ = solver(*args)
    out.U_optm.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out, _ = solver(*args)
    out.U_optm.block_until_ready()
    t = (time.perf_counter() - t0) / reps
    frac, min_cost = sharded_metrics(out.solved, out.obj, mesh2)
    return {
        "mesh": "(host=2, batch=4)", "batch": batch,
        "batch_latency_ms": round(t * 1e3, 2),
        "solved_fraction_psum": round(float(frac), 4),
        "min_cost_pmin": round(float(min_cost), 4),
    }


def decomposition(batch_per_device: int = 32, reps: int = 3):
    """Decompose the virtual-mesh weak-scaling loss (VERDICT r4 next #6)
    into host CPU core contention vs program-inherent costs.

    Four timed points at the flagship shape (solve only unless noted):
      t_1small: 1 device,  batch B        — per-device baseline
      t_1big:   1 device,  batch 8B       — same silicon, 8x work, NO
                sharding: the contention ceiling any 8-shard run on this
                host can reach
      t_8comp:  8 devices, batch 8B       — sharded, compute only (the
                batch-parallel solve has no cross-device communication)
      t_8coll:  8 devices, batch 8B + psum/pmin metrics — adds the only
                collectives in the serving loop

    Derived:
      naive_weak_scaling_eff   = t_1small / t_8comp   (the number rounds
                                 3-4 reported raw: 19% at 8 devices)
      core_contention_ceiling  = (8B/t_1big) / (8 * B/t_1small): how much
                                 of the 8x ideal this HOST can deliver
                                 with no sharding at all — on real
                                 multi-chip hardware this term is ~1.0
                                 (every device brings its own cores/HBM)
      partition_efficiency     = t_1big / t_8comp: SPMD partitioning cost
                                 at equal work on equal silicon
      collective_fraction      = (t_8coll - t_8comp) / t_8coll
    Predicted real-hardware weak-scaling efficiency = partition_efficiency
    x (1 - collective_fraction): the contention term drops out, the
    batch-sharded solve itself is communication-free, and the per-step
    collectives are two scalars (psum + pmin) riding ICI.
    """
    from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch
    from racing_lmpc_tpu.parallel import (
        make_mesh, shard_batch, sharded_batch_solver, sharded_metrics)

    model, track, cfg, mpc, manager = build_barc_lmpc(n_horizon=20, num_ss=48)
    B = batch_per_device

    def timed(nd, batch, with_metrics):
        mesh = make_mesh(jax.devices()[:nd])
        inp = make_scenario_batch(mpc, track, manager, batch)
        z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
        valid = jnp.zeros((batch,), dtype=bool)
        args = tuple(shard_batch(x, mesh) for x in (inp, z, valid))
        solver = sharded_batch_solver(mpc._solve_impl, mesh)

        def run():
            out, _ = solver(*args)
            if with_metrics:
                frac, mc = sharded_metrics(out.solved, out.obj, mesh)
                return frac.block_until_ready()
            return out.X_optm.block_until_ready()

        run()
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        return (time.perf_counter() - t0) / reps

    t_1small = timed(1, B, False)
    t_1big = timed(1, 8 * B, False)
    t_8comp = timed(8, 8 * B, False)
    t_8coll = timed(8, 8 * B, True)

    core_ceiling = (8 * B / t_1big) / (8 * (B / t_1small))
    part_eff = t_1big / t_8comp
    coll_frac = max(0.0, (t_8coll - t_8comp) / t_8coll)
    return {
        "batch_per_device": B,
        "t_1dev_smallbatch_ms": round(t_1small * 1e3, 2),
        "t_1dev_fullbatch_ms": round(t_1big * 1e3, 2),
        "t_8dev_compute_only_ms": round(t_8comp * 1e3, 2),
        "t_8dev_with_collectives_ms": round(t_8coll * 1e3, 2),
        "naive_weak_scaling_eff_8dev": round(t_1small / t_8comp, 4),
        "core_contention_ceiling_8dev": round(core_ceiling, 4),
        "partition_efficiency_equal_work": round(part_eff, 4),
        "collective_fraction": round(coll_frac, 4),
        "predicted_hw_weak_scaling_eff": round(
            part_eff * (1.0 - coll_frac), 4),
        "note": (
            "core_contention_ceiling is what this 2-core host can deliver "
            "of the 8x ideal WITHOUT any sharding — the dominant loss in "
            "the naive number is host contention, not the program.  The "
            "sharded solve is communication-free (batch-parallel); the "
            "only collectives are two scalars per step."),
    }


def main():
    from racing_lmpc_tpu.benchmarks import scaling_bench
    report = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "target": ">=90% weak-scaling efficiency from 1 host to >=2 hosts "
                  "(BASELINE.md, real multi-host TPU criterion)",
        "caveat": "virtual CPU devices share one host's cores; these runs "
                  "validate the sharded program + collective path (gloo / "
                  "XLA collectives), not hardware ICI/DCN efficiency",
        "flagship_shape": "BARC LMPC N=20, K=48",
        "weak_scaling_virtual_cpu_mesh": scaling_bench(
            device_counts=[1, 2, 4, 8], batch_per_device=32, reps=3),
        "scaling_decomposition": decomposition(),
        "mesh_2d_host_batch": mesh_2d_bench(),
        "two_process_gloo": two_process_gloo(),
    }
    (REPO / "MULTIHOST.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
