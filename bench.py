#!/usr/bin/env python
"""Driver benchmark: batched BARC LMPC solves/s per chip (N=20, K=48).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the north-star target of >= 1000 full-horizon LMPC solves/s/chip
(BASELINE.md) inside the reference's 85 ms per-solve budget.  The ``extra``
block carries the real-time-path numbers the reference's budgets are about
(racing_mpc_node.cpp:373-380: 25 ms loop, 85 ms cap):

- ``batch{1,8,256}_onchip_ms``: per-solve ON-CHIP latency at small batch,
  measured as a jitted chain of SEQUENTIAL dependent solves (each step's
  x_ic is the previous solution's 1-step prediction, so XLA cannot overlap
  them) — the honest receding-horizon number, free of host/tunnel overhead;
- ``batch256_latency_ms_p50/p99``: host-observed round-trip batch latency
  (includes transfer; on a tunneled TPU this is dominated by the tunnel);
- ``ss_query_ms``: host safe-set k-NN + padding cost per control cycle
  (runs on the host CPU alongside the device solve in the control loop);
- ``flops_per_solve`` / ``mfu_vs_bf16_peak``: XLA cost-analysis FLOPs of
  one solve and the model-FLOP utilization of the batch-256 pipeline
  against the chip's dense bf16 peak (v5e: 197 TFLOP/s; the IPM runs
  f32-accumulated matmuls, so this is a conservative denominator).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the batched IPM program takes ~2 min to build
# through the remote TPU compiler; with the cache warm, bench start-up
# drops to seconds and repeated driver runs measure steady-state numbers.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

_PEAK_FLOPS = {
    # dense bf16 peak per chip
    "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
    "v4": 275e12, "v6 lite": 918e12, "v6e": 918e12,
}


def _peak_for(device_str: str) -> float:
    for k, v in _PEAK_FLOPS.items():
        if k in device_str.lower():
            return v
    return 197e12


def shipped_rt_latencies(chain: int = 8, reps: int = 3) -> dict:
    """Batch-1 on-chip per-cycle latency of every shipped launch scenario's
    full controller step (control/loop.py _rti_step: shift + track
    interpolation + solve, incl. the scenario's sqp_relin_steps), as a
    jitted chain of dependent receding-horizon cycles.  Budgets:
    the reference caps every solve at 85 ms (max_cpu_time) and runs loops
    at 40 Hz (BARC, 25 ms) / 10 Hz (Putnam launches, 100 ms)."""
    import jax.numpy as jnp
    from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation

    budgets = {
        "barc_lmpc": 25.0, "barc_tracking_mpc": 25.0,
        "putnam_short_lmpc": 100.0, "putnam_short_tracking_mpc": 100.0,
        "putnam_config_a_tracking_mpc": 100.0,
    }
    out = {}
    for name, loop_ms in budgets.items():
        cs = CoSimulation(_SCENARIOS[name])
        cs.step()                      # bootstrap + first cycle
        ctrl = cs.controller
        st = ctrl.state
        ss_x, ss_j = ctrl._query_safe_set(st.last_X[-1])
        lim = jnp.asarray(ctrl.speed_limit, jnp.float32)
        sc = jnp.asarray(ctrl.speed_scale, jnp.float32)

        def chain_steps(state, x0, u0, ss_x=ss_x, ss_j=ss_j, ctrl=ctrl,
                        lim=lim, sc=sc):
            def body(carry, _):
                s, x, u = carry
                s2, info = ctrl._rti_step(x, u, s, ss_x, ss_j, lim, sc)
                return (s2, s2.last_X[1], info.u_apply), info.output.obj
            (_, _, _), objs = jax.lax.scan(
                body, (state, x0, u0), None, length=chain)
            return objs

        f = jax.jit(chain_steps)
        x0 = st.last_X[0]
        u0 = jnp.zeros((ctrl.mpc.nu,), dtype=jnp.float32)
        f(st, x0, u0).block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(st, x0, u0).block_until_ready()
            ts.append((time.perf_counter() - t0) / chain)
        ms = float(np.median(ts) * 1e3)
        out[name] = {
            "batch1_cycle_onchip_ms": round(ms, 2),
            "n": ctrl.mpc.N, "k": ctrl.mpc.K,
            "sqp_relin_steps": max(1, ctrl.config.sqp_relin_steps),
            "loop_period_ms": loop_ms,
            "solve_cap_ms": 85.0,
            "within_cap": bool(ms <= 85.0),
            "within_loop_period": bool(ms <= loop_ms),
        }
    return out


def main():
    from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch

    model, track, cfg, mpc, manager = build_barc_lmpc(n_horizon=20, num_ss=48)

    batch = 256
    inp = make_scenario_batch(mpc, track, manager, batch)
    z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((batch,), dtype=bool)

    solve = jax.jit(jax.vmap(mpc._solve_impl))
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
    solves_per_s = batch * reps / elapsed

    # host-observed batch latency (per-batch sync incl. transfer/tunnel)
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = solve(inp, z, valid)
        out.X_optm.block_until_ready()
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1e3

    # ---- on-chip sequential (real-time) latency at batch 1 / 8 ----------
    # chain CHAIN dependent solves inside one jit: step k+1 starts from
    # step k's 1-step prediction (the receding-horizon dependency), so the
    # measured time / CHAIN is the true per-cycle on-chip latency.
    CHAIN = 10

    def chain_solves(inp_b, z_b, valid_b):
        def body(carry, _):
            inp_c, z_c = carry
            out_c, z_n = jax.vmap(mpc._solve_impl)(inp_c, z_c, valid_b)
            inp_n = inp_c._replace(x_ic=out_c.X_optm[:, 1])
            return (inp_n, z_n), out_c.obj
        (inp_f, _), objs = jax.lax.scan(body, (inp_b, z_b), None, length=CHAIN)
        return objs

    onchip = {}
    for b in (1, 8):
        inp_b = jax.tree.map(lambda a: a[:b], inp)
        z_b, valid_b = z[:b], valid[:b]
        f = jax.jit(chain_solves)
        f(inp_b, z_b, valid_b).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            f(inp_b, z_b, valid_b).block_until_ready()
            ts.append((time.perf_counter() - t0) / CHAIN)
        onchip[b] = float(np.median(ts) * 1e3)

    # ---- batch sweep (N=20): throughput vs batch -------------------------
    batch_sweep = {}
    for b in (512, 1024):
        inp_b = make_scenario_batch(mpc, track, manager, b)
        z_b = jnp.zeros((b, mpc.layout.n), dtype=jnp.float32)
        v_b = jnp.zeros((b,), dtype=bool)
        out_b, _ = solve(inp_b, z_b, v_b)
        out_b.X_optm.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out_b, _ = solve(inp_b, z_b, v_b)
        out_b.X_optm.block_until_ready()
        batch_sweep[b] = round(b * 10 / (time.perf_counter() - t0), 1)

    # ---- flagship shipped config: N=40, K=96 (barc_lmpc.param.yaml) ------
    model40, track40, cfg40, mpc40, manager40 = build_barc_lmpc(
        n_horizon=40, num_ss=96, num_ss_per_lap=32)
    B40 = 128
    inp40 = make_scenario_batch(mpc40, track40, manager40, B40)
    z40 = jnp.zeros((B40, mpc40.layout.n), dtype=jnp.float32)
    v40 = jnp.zeros((B40,), dtype=bool)
    solve40 = jax.jit(jax.vmap(mpc40._solve_impl))
    out40, _ = solve40(inp40, z40, v40)
    out40.X_optm.block_until_ready()
    lat40 = []
    for _ in range(10):
        t0 = time.perf_counter()
        out40, _ = solve40(inp40, z40, v40)
        out40.X_optm.block_until_ready()
        lat40.append(time.perf_counter() - t0)
    lat40 = np.sort(np.asarray(lat40)) * 1e3
    n40_solves_per_s = round(B40 / (np.median(lat40) / 1e3), 1)

    # ---- shipped-config real-time latencies (VERDICT r4 next #5) --------
    # Every launch scenario's FULL per-cycle controller compute (shift +
    # reference interpolation + QP solve(+SQP re-linearizations where the
    # scenario ships them)), batch-1, as an on-chip chain of dependent
    # receding-horizon cycles (cycle k+1 starts from cycle k's 1-step
    # prediction) — compared against the reference's 85 ms per-solve cap
    # (max_cpu_time, every shipped *_mpc.param.yaml) and each scenario's
    # loop period.
    shipped_rt = shipped_rt_latencies()

    # ---- host safe-set query cost per control cycle ----------------------
    x_term = np.asarray(inp.X_ref[0, -1])
    manager.query_padded(x_term, mpc.K, cfg.num_ss_pts_per_lap)  # warm
    t0 = time.perf_counter()
    SSR = 50
    for _ in range(SSR):
        manager.query_padded(x_term, mpc.K, cfg.num_ss_pts_per_lap)
    ss_query_ms = (time.perf_counter() - t0) / SSR * 1e3

    # ---- FLOPs / MFU ------------------------------------------------------
    try:
        cost = solve.lower(inp, z, valid).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_batch = float(cost.get("flops", 0.0))
    except Exception:
        flops_batch = 0.0
    flops_per_solve = flops_batch / batch if flops_batch else 0.0
    device = str(jax.devices()[0])
    mfu = (flops_per_solve * solves_per_s / _peak_for(device)
           if flops_per_solve else 0.0)

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
            "batch1_onchip_ms": round(onchip[1], 3),
            "batch8_onchip_ms_per_solve": round(onchip[8] / 8, 4),
            "batch1_latency_ms": round(onchip[1], 3),
            "rt_budget_ms": 25.0,
            "ss_query_ms": round(ss_query_ms, 3),
            "solved_fraction": round(n_ok / batch, 4),
            "flops_per_solve": round(flops_per_solve, 0),
            "mfu_vs_bf16_peak": round(mfu, 4),
            # roofline note: the QP is tiny (n~87, m~200 per instance) and
            # the solve is HBM-/latency-bound, not MXU-bound — ~40 MFLOP
            # over ~40 sequential Newton/zoom stages of (B, 87, 87)
            # factor/backsolve matmuls.  MFU vs dense bf16 peak is
            # accordingly tiny; the relevant budget is the reference's
            # 25 ms loop / 85 ms cap, met by orders of magnitude.
            "batch_sweep_solves_per_s": batch_sweep,
            "shipped_rt_latencies": shipped_rt,
            "flagship_n40_k96_batch128_solves_per_s": n40_solves_per_s,
            "flagship_n40_k96_batch128_latency_ms_p50": round(
                float(np.median(lat40)), 2),
            "flagship_n40_k96_solved_fraction": round(
                float(jnp.mean(out40.solved)), 4),
            "qp_zoom_rounds": cfg.qp_zoom_rounds,
            "device": device,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
