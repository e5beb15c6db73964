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


def test_mesh2d_solve_and_metrics(problem):
    """(host, batch) 2-D mesh: sharded solve matches vmap, and the
    explicit-collective metrics reduce to the known values (masked min)."""
    mpc, inp, z, valid = problem
    out_ref, _ = jax.jit(jax.vmap(mpc._solve_impl))(inp, z, valid)

    mesh = make_mesh_2d(jax.devices()[:8], host_size=2)
    assert mesh.devices.shape == (2, 4)
    axes = ("host", "batch")
    inp_s, z_s, valid_s = (shard_batch(x, mesh, axis=axes)
                           for x in (inp, z, valid))
    solver = sharded_batch_solver(mpc._solve_impl, mesh, axis=axes)
    out_sh, _ = solver(inp_s, z_s, valid_s)
    np.testing.assert_allclose(
        np.asarray(out_sh.U_optm), np.asarray(out_ref.U_optm), atol=2e-3)

    # metrics with every scenario solved: frac = 1, min over all objs
    frac, cmin = sharded_metrics(out_sh.solved, out_sh.obj, mesh)
    assert float(frac) == pytest.approx(
        float(jnp.mean(out_sh.solved.astype(jnp.float32))))
    np.testing.assert_allclose(float(cmin), float(jnp.min(out_sh.obj)),
                               rtol=1e-6)

    # masked min: mark the global-min scenario unsolved; the reduction must
    # skip its objective.  All-unsolved reduces to +inf.
    obj = np.asarray(out_sh.obj)
    solved = np.asarray(out_sh.solved).copy()
    solved[np.argmin(obj)] = False
    frac2, cmin2 = sharded_metrics(
        shard_batch(jnp.asarray(solved), mesh, axis=axes),
        shard_batch(jnp.asarray(obj), mesh, axis=axes), mesh)
    assert float(frac2) == pytest.approx(solved.mean())
    np.testing.assert_allclose(float(cmin2), obj[solved].min(), rtol=1e-6)
    _, cmin3 = sharded_metrics(
        shard_batch(jnp.zeros_like(out_sh.solved), mesh, axis=axes),
        shard_batch(jnp.asarray(obj), mesh, axis=axes), mesh)
    assert float(cmin3) == np.inf

    # the builder is cached per mesh: no re-jit on repeated calls
    from racing_lmpc_tpu.parallel.mesh import _metrics_fn
    assert _metrics_fn(mesh) is _metrics_fn(mesh)


def test_scaling_bench_runs():
    res = scaling_bench(device_counts=[1, 2], batch_per_device=4,
                        n_horizon=6, num_ss=8, reps=1)
    assert [r["devices"] for r in res] == [1, 2]
    assert all(r["solved_fraction"] == 1.0 for r in res)
    assert res[0]["weak_scaling_efficiency"] == 1.0
