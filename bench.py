#!/usr/bin/env python
"""Driver benchmark: batched BARC LMPC solves/s per chip (N=20, K=48).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the north-star target of >= 1000 full-horizon LMPC solves/s/chip
(BASELINE.md) inside the reference's 85 ms per-solve budget.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch

    model, track, cfg, mpc, manager = build_barc_lmpc(n_horizon=20, num_ss=48)

    batch = 256
    inp = make_scenario_batch(mpc, track, manager, batch)
    z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((batch,), dtype=bool)

    solve = jax.jit(jax.vmap(mpc._solve_impl))
    # compile + warm up
    out, _ = solve(inp, z, valid)
    out.X_optm.block_until_ready()
    n_ok = int(jnp.sum(out.solved))

    # throughput: pipelined dispatch (production serving = continuous
    # stream), one sync at the end
    reps = 20
    t_all = time.perf_counter()
    for _ in range(reps):
        out, _ = solve(inp, z, valid)
    out.X_optm.block_until_ready()
    elapsed = time.perf_counter() - t_all

    # latency: per-batch sync (includes the host<->device round trip)
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = solve(inp, z, valid)
        out.X_optm.block_until_ready()
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1e3

    solves_per_s = batch * reps / elapsed
    result = {
        "metric": "barc_lmpc_solves_per_s_per_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
        "extra": {
            "batch": batch,
            "batch_latency_ms_p50": round(float(np.median(lat_ms)), 2),
            "batch_latency_ms_p99": round(float(lat_ms[-1]), 2),
            "per_solve_ms_amortized": round(
                float(np.median(lat_ms)) / batch, 4),
            "solved_fraction": round(n_ok / batch, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
