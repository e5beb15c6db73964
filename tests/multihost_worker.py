"""Worker for tests/test_multihost.py: one process of a 2-process
`jax.distributed` CPU run (2 virtual devices per process -> 4-device global
mesh).  Solves a sharded LMPC scenario batch, checks it against the local
single-process vmap solve, and prints a checksum both workers must agree on.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from racing_lmpc_tpu.parallel import distributed  # noqa: E402

distributed.initialize(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch  # noqa: E402
from racing_lmpc_tpu.parallel import sharded_batch_solver  # noqa: E402

assert jax.process_count() == nproc
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

model, track, cfg, mpc, manager = build_barc_lmpc(
    n_horizon=5, num_ss=8, num_ss_per_lap=4)
batch = 8
# deterministic: every process builds the same global scenario batch
inp = make_scenario_batch(mpc, track, manager, batch=batch, seed=3)
z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
valid = jnp.zeros((batch,), dtype=bool)

mesh = distributed.global_mesh()
inp_s = distributed.shard_batch_global(inp, mesh)
z_s = distributed.shard_batch_global(z, mesh)
valid_s = distributed.shard_batch_global(valid, mesh)
assert len(inp_s.x_ic.addressable_shards) == 2  # this process's shards only

solver = sharded_batch_solver(mpc._solve_impl, mesh)
out, _ = solver(inp_s, z_s, valid_s)

# cross-host reduction (XLA inserts the psum over DCN/gloo)
solved_frac = float(jnp.mean(out.solved.astype(jnp.float32)))

# explicit-collective metrics path (psum solved fraction, pmin objective)
from racing_lmpc_tpu.parallel import sharded_metrics  # noqa: E402
frac2, min_cost = sharded_metrics(out.solved, out.obj, mesh)
assert abs(float(frac2) - solved_frac) < 1e-6

# ---- weak-scaling efficiency over the live 2-process gloo group ---------
# per-process work is fixed (batch/nproc scenarios on 2 local devices); the
# multi-process run adds only the cross-process collective overhead, so
# efficiency = t_local / t_global (1.0 = perfect).
import time  # noqa: E402
from racing_lmpc_tpu.parallel import make_mesh, shard_batch  # noqa: E402

local_batch = batch // nproc
inp_l = jax.tree.map(lambda a: a[:local_batch], inp)
z_l, valid_l = z[:local_batch], valid[:local_batch]
mesh_l = make_mesh(jax.local_devices())
solver_l = sharded_batch_solver(mpc._solve_impl, mesh_l)
args_l = (shard_batch(inp_l, mesh_l), shard_batch(z_l, mesh_l),
          shard_batch(valid_l, mesh_l))
solver_l(*args_l)[0].U_optm.block_until_ready()  # warm

REPS = 10


def _time(fn, args):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args)[0].U_optm.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


t_local = _time(solver_l, args_l)
t_global = _time(solver, (inp_s, z_s, valid_s))
weakscale = t_local / t_global
# gather the sharded horizon back to every host
U = distributed.process_allgather(out.U_optm)
assert U.shape == (batch, mpc.N - 1, mpc.nu)
assert np.all(np.isfinite(U))

# reference: plain local vmap on this process's default device
out_ref, _ = jax.jit(jax.vmap(mpc._solve_impl))(inp, z, valid)
np.testing.assert_allclose(U, np.asarray(out_ref.U_optm), atol=2e-3)

print(f"MULTIHOST_OK pid={pid} solved={solved_frac:.4f} "
      f"checksum={float(np.sum(U)):.6f} min_cost={float(min_cost):.6f} "
      f"weakscale={weakscale:.4f} t_local_ms={t_local * 1e3:.2f} "
      f"t_global_ms={t_global * 1e3:.2f}", flush=True)
