"""Accuracy/cost sweep for the QP solver knobs vs the f64 reference oracle.

Captures the exact per-cycle MPCInput instances used by
tests/test_reference_match.py (BARC tracking + deviated, BARC LMPC, Putnam
tracking), solves each once with the certified f64 oracle, then evaluates a
grid of (qp_ip_iters, qp_zoom_rounds, qp_zoom_iters, qp_refine_rounds)
configurations of the engine and reports, per config:

  - max applied-steer relative error (u[0], u[1]) over every instance
  - max full-horizon steer / lon relative errors
  - a Newton-iteration cost proxy (ip_iters + zoom_rounds*zoom_iters
    + refine_rounds)

Usage:  python scripts/acc_sweep.py [--quick]
Oracle solutions are cached in scripts/.acc_cache.pkl (keyed by scenario,
instance and capture config) so repeated sweeps only pay the engine solves.
"""

import argparse
import os
import pickle
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
_cache_dir = str(Path(__file__).resolve().parent.parent / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation  # noqa: E402
from racing_lmpc_tpu.mpc.reference_qp import (  # noqa: E402
    build_reference_qp, solve_dense_qp_f64)

# capture config matches tests/test_reference_match.py::_ACC
_CAPTURE_CFG = {"qp_zoom_rounds": 3}

_SCEN = [
    ("barc_tracking_mpc", 20, (6, 18, 30), True),   # deviated variant too
    ("barc_lmpc", 20, (6, 16, 28), False),
    ("putnam_short_tracking_mpc", 30, (8, 20), False),
]

CACHE = Path(__file__).resolve().parent / ".acc_cache.pkl"


def capture_all():
    """(scenario -> list of (inp, zw)) captured with the accuracy config."""
    caps = {}
    for name, n, at, deviate in _SCEN:
        cs = CoSimulation(_SCENARIOS[name], n_override=n,
                          mpc_overrides=dict(_CAPTURE_CFG))
        ctrl = cs.controller
        items = []
        for i in range(max(at) + 1):
            if i in at and ctrl.state is not None:
                msg = cs.vehicle_state_msg()
                x = jnp.asarray(
                    [msg.p.s, msg.p.x_tran, msg.p.e_psi,
                     msg.v.v_long, msg.v.v_tran, msg.w.w_psi],
                    dtype=jnp.float32)
                ss_x, ss_j = ctrl._query_safe_set(ctrl.state.last_X[-1])
                inp, zw, _ = ctrl.build_step_input(
                    x, cs._u_prev, ctrl.state, ss_x, ss_j,
                    jnp.asarray(ctrl.speed_limit, jnp.float32),
                    jnp.asarray(ctrl.speed_scale, jnp.float32))
                items.append((jax.tree.map(np.asarray, inp),
                              np.asarray(zw)))
            cs.step()
        if deviate:
            extra = []
            for inp, zw in items:
                inp2 = jax.tree.map(np.copy, inp)
                x2 = np.array(inp2.x_ic)
                x2[1] += 0.18
                inp2 = inp2._replace(x_ic=jnp.asarray(x2))
                extra.append((jax.tree.map(np.asarray, inp2), zw))
            items += extra
        caps[name] = items
        print(f"captured {name}: {len(items)} instances", flush=True)
    return caps


def oracles_for(caps):
    """scenario -> list of (U_star, qp) oracle optima (U only, np.f64)."""
    out = {}
    for name, n, at, dev in _SCEN:
        cs = CoSimulation(_SCENARIOS[name], n_override=n,
                          mpc_overrides=dict(_CAPTURE_CFG))
        mpc = cs.controller.mpc
        lst = []
        for k, (inp, zw) in enumerate(caps[name]):
            t0 = time.time()
            qp = build_reference_qp(mpc.model, mpc.config, inp)
            z_star, y_star = solve_dense_qp_f64(qp)
            lst.append(np.asarray(qp.controls(z_star), np.float64))
            print(f"oracle {name}[{k}]: {time.time()-t0:.1f}s", flush=True)
        out[name] = lst
    return out


def evaluate(caps, oracles, overrides):
    """Max relative errors of the engine under `overrides` vs the oracle."""
    res = {}
    for name, n, at, dev in _SCEN:
        cs = CoSimulation(_SCENARIOS[name], n_override=n,
                          mpc_overrides={**_CAPTURE_CFG, **overrides})
        mpc = cs.controller.mpc
        su = np.asarray(mpc.scale_u)
        errs = []
        for k, ((inp, zw), U_star) in enumerate(zip(caps[name], oracles[name])):
            out, _ = mpc._solve_jit(
                jax.tree.map(jnp.asarray, inp), jnp.asarray(zw),
                jnp.asarray(True))
            rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
            errs.append((rel[:2, 1].max(), rel[:, 1].max(), rel[:, 0].max()))
            if os.environ.get("ACC_VERBOSE"):
                print(f"    {name}[{k}] applied={errs[-1][0]:.3e} "
                      f"tail={errs[-1][1]:.3e}", flush=True)
        e = np.asarray(errs)
        res[name] = dict(applied_steer=float(e[:, 0].max()),
                         steer_tail=float(e[:, 1].max()),
                         lon=float(e[:, 2].max()))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="",
                    help="semicolon-separated dicts, e.g. "
                         "'{\"qp_zoom_rounds\":3};{\"qp_refine_rounds\":2}'")
    args = ap.parse_args()

    if CACHE.exists():
        caps, oracles = pickle.loads(CACHE.read_bytes())
        print("loaded capture/oracle cache", flush=True)
    else:
        caps = capture_all()
        oracles = oracles_for(caps)
        CACHE.write_bytes(pickle.dumps((caps, oracles)))

    if args.configs:
        grid = [eval(c) for c in args.configs.split(";")]
    else:
        grid = [
            {"qp_zoom_rounds": 2},                              # prod default
            {"qp_zoom_rounds": 3},                              # accuracy mode
            {"qp_zoom_rounds": 2, "qp_refine_rounds": 2},
            {"qp_zoom_rounds": 1, "qp_refine_rounds": 2},
        ]
    for cfg in grid:
        t0 = time.time()
        res = evaluate(caps, oracles, cfg)
        cost = (cfg.get("qp_ip_iters", 14)
                + cfg.get("qp_zoom_rounds", 2)
                * (cfg.get("qp_zoom_iters", 0) or cfg.get("qp_ip_iters", 14))
                + cfg.get("qp_refine_rounds", 0))
        worst = max(v["applied_steer"] for v in res.values())
        print(f"\n=== {cfg}  (cost~{cost} iters, wall {time.time()-t0:.0f}s)")
        for k, v in res.items():
            print(f"  {k:28s} applied={v['applied_steer']:.2e} "
                  f"tail={v['steer_tail']:.2e} lon={v['lon']:.2e}")
        print(f"  WORST applied steer: {worst:.2e}")


if __name__ == "__main__":
    main()
