"""PARETO.json — the recorded accuracy/throughput trade (VERDICT r4 next #4).

Combines:
- per-config ACCURACY on the pinned acceptance instances
  (scripts/ground_accuracy.py --engine --grid ... -> a grid
  .engine_runs.json), checked per-instance against the OSQP-grounded
  gates in ACCURACY.json;
- per-config THROUGHPUT measured on the real TPU chip with the bench
  harness (batched N=20 BARC LMPC solves/s + batch-1 receding-horizon
  chain latency).

Usage:
  # 1. accuracy grid (CPU ok):
  python scripts/ground_accuracy.py --engine --grid '[{...}, ...]'
  cp scripts/.engine_runs.json /tmp/engine_grid.json
  # 2. throughput sweep + merge (needs the TPU):
  python scripts/pareto_bench.py /tmp/engine_grid.json
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def throughput_for(overrides, batch=256, reps=10):
    import jax
    import jax.numpy as jnp
    from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch

    model, track, cfg, mpc, manager = build_barc_lmpc(
        n_horizon=20, num_ss=48, **overrides)
    inp = make_scenario_batch(mpc, track, manager, batch)
    z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((batch,), dtype=bool)
    solve = jax.jit(jax.vmap(mpc._solve_impl))
    out, _ = solve(inp, z, valid)
    out.X_optm.block_until_ready()
    # per-rep sync: on the tunneled device a tail-sync-only loop was
    # observed to return bogusly fast once (3.5e6 "solves/s"); the per-rep
    # block costs one tunnel RTT against ~100 ms batches and cannot lie
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = solve(inp, z, valid)
        out.X_optm.block_until_ready()
        ts.append(time.perf_counter() - t0)
    sps = batch / float(np.median(ts))

    # batch-1 receding-horizon chain (the real-time path)
    CHAIN = 10

    def chain(inp_b, z_b, valid_b):
        def body(carry, _):
            inp_c, z_c = carry
            out_c, z_n = jax.vmap(mpc._solve_impl)(inp_c, z_c, valid_b)
            return (inp_c._replace(x_ic=out_c.X_optm[:, 1]), z_n), out_c.obj
        (_, _), objs = jax.lax.scan(body, (inp_b, z_b), None, length=CHAIN)
        return objs

    inp1 = jax.tree.map(lambda a: a[:1], inp)
    f = jax.jit(chain)
    f(inp1, z[:1], valid[:1]).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        f(inp1, z[:1], valid[:1]).block_until_ready()
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(sps), float(np.median(ts) * 1e3), float(np.mean(out.solved))


def main():
    grid_file = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_grid.json"
    grid = json.loads(Path(grid_file).read_text())
    acc = json.loads((ROOT / "ACCURACY.json").read_text())["per_instance"]

    points = []
    for key, res in grid.items():
        overrides = json.loads(key)
        worst = max(v["applied_steer_err"] for v in res.values())
        fails = [t for t, v in res.items()
                 if v["applied_steer_err"] >= acc[t]["applied_steer_gate"]]
        print(f"measuring throughput for {key} ...", flush=True)
        sps, b1_ms, frac = throughput_for(overrides)
        pt = {
            "overrides": overrides,
            "worst_applied_steer_err": worst,
            "gate_failures": fails,
            "passes_all_pinned_gates": not fails,
            "solves_per_s_batch256_N20": round(sps, 1),
            "batch1_chain_ms": round(b1_ms, 3),
            "solved_fraction": round(frac, 4),
        }
        points.append(pt)
        print(f"  {key}: {sps:.0f} solves/s, b1 {b1_ms:.1f} ms, "
              f"worst {worst:.2e}, gate_fail={len(fails)}", flush=True)

    doc = {
        "description": (
            "Accuracy/throughput Pareto of the QP engine on the pinned "
            "acceptance instances (accuracy; gates = ACCURACY.json, "
            "grounded in the reference's own OSQP-class scatter) and the "
            "real TPU chip (throughput; batched N=20 BARC LMPC + batch-1 "
            "receding-horizon chain).  The shipped default is the "
            "cheapest config that passes every pinned gate with margin."),
        "shipped_default": {"qp_ip_iters": 14, "qp_zoom_iters": 14,
                            "qp_zoom_rounds": 4},
        "rationale": (
            "zoom_rounds<=2 and every cheaper knob setting (zoom_iters "
            "10/8, ip_iters 12/10) violate at least one pinned "
            "per-instance gate; zoom_rounds=3 is the minimum passing "
            "depth and the while-loop ladder's early exit makes the "
            "rounds_cap=4 default cost the same as 3 at runtime (the "
            "batch stops at the deepest round any instance still "
            "needs).  The knee is where we sit: more throughput is only "
            "available by giving up gate-passing accuracy."),
        "device": None,
        "points": points,
    }
    import jax
    doc["device"] = str(jax.devices()[0])
    (ROOT / "PARETO.json").write_text(json.dumps(doc, indent=1))
    print("wrote PARETO.json")


if __name__ == "__main__":
    main()
