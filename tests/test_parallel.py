"""Scenario-parallel sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed backend (SURVEY.md section 2.7); the TPU
engine's scale-out axis is data parallelism over scenario batches with
``jax.sharding.Mesh`` + sharding constraints.  These tests pin down that the
sharded program produces the same solutions as the single-device vmap and
that the weak-scaling harness runs end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.benchmarks import (
    build_barc_lmpc, make_scenario_batch, scaling_bench)
from racing_lmpc_tpu.parallel import (
    make_mesh, make_mesh_2d, shard_batch, sharded_batch_solver,
    sharded_metrics)


@pytest.fixture(scope="module")
def problem():
    model, track, cfg, mpc, manager = build_barc_lmpc(n_horizon=8, num_ss=16,
                                                      num_ss_per_lap=8)
    batch = 16
    inp = make_scenario_batch(mpc, track, manager, batch, seed=3)
    z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((batch,), dtype=bool)
    return mpc, inp, z, valid


def test_sharded_solve_matches_vmap(problem):
    mpc, inp, z, valid = problem
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    out_ref, _ = jax.jit(jax.vmap(mpc._solve_impl))(inp, z, valid)

    mesh = make_mesh(jax.devices()[:8])
    inp_s, z_s, valid_s = (shard_batch(x, mesh) for x in (inp, z, valid))
    solver = sharded_batch_solver(mpc._solve_impl, mesh)
    out_sh, _ = solver(inp_s, z_s, valid_s)

    assert float(jnp.mean(out_sh.solved)) == 1.0
    # same program semantics; the partitioned compilation rounds reductions
    # differently, and the cost-flat steering valley (see
    # test_control_match.py) magnifies last-bit differences to ~1e-3 on a
    # few horizon-tail entries
    np.testing.assert_allclose(
        np.asarray(out_sh.U_optm), np.asarray(out_ref.U_optm), atol=2e-3)


def test_sharding_layout(problem):
    mpc, inp, z, valid = problem
    mesh = make_mesh(jax.devices()[:8])
    inp_s = shard_batch(inp, mesh)
    shards = inp_s.x_ic.sharding
    assert shards.is_fully_replicated is False
    assert len(inp_s.x_ic.addressable_shards) == 8


def test_scaling_bench_runs():
    res = scaling_bench(device_counts=[1, 2], batch_per_device=4,
                        n_horizon=6, num_ss=8, reps=1)
    assert [r["devices"] for r in res] == [1, 2]
    assert all(r["solved_fraction"] == 1.0 for r in res)
    assert res[0]["weak_scaling_efficiency"] == 1.0
