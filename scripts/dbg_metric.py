"""Validate a valley-aware candidate-selection metric.

For each captured instance x realization, produce the ladder's candidate
iterates, then compute an f64 projected-gradient metric
    metric(x) = || P x + q + A' y_ls(x) ||_inf  +  BIG * viol(x)
with y_ls the least-squares dual supported on near-active rows.  If
argmin-metric reliably picks a candidate with applied-steer error <= 3e-4,
the metric works and gets implemented in-engine (compensated f32).
"""
import os, pickle, sys
from pathlib import Path
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp

from dbg_pipe import (caps, oracles, mpc_for, pipe_fn, INSTANCES, N_OV,
                      QPSolution)


def metric_f64(x_un, data, eq_rows, tol=1e-4):
    """f64 projected-gradient metric on the UNSCALED engine QP data."""
    P = np.asarray(data.P, np.float64)
    q = np.asarray(data.q, np.float64)
    A = np.asarray(data.A, np.float64)
    lo = np.asarray(data.l, np.float64)
    up = np.asarray(data.u, np.float64)
    x = np.asarray(x_un, np.float64)
    g = P @ x + q
    Ax = A @ x
    # row scales for near-activity test
    rs = 1.0 + np.abs(Ax)
    is_eq = np.zeros(len(lo), bool)
    if eq_rows is not None:
        is_eq[np.asarray(eq_rows)] = True
    near_u = np.isfinite(up) & (up - Ax < tol * rs)
    near_l = np.isfinite(lo) & (Ax - lo < tol * rs)
    sel = near_u | near_l | is_eq
    As = A[sel]
    if As.shape[0]:
        y_s, *_ = np.linalg.lstsq(As.T, -g, rcond=None)
        rd = g + As.T @ y_s
    else:
        rd = g
    viol = max(np.max(Ax - up, initial=0.0), np.max(lo - Ax, initial=0.0))
    # normalize dual residual by gradient scale
    return np.max(np.abs(rd)) / max(1.0, np.max(np.abs(g))), viol


def main():
    ridge, zooms = 1e-6, [1.0, None, None]
    picked_errs, final_errs, best_errs = [], [], []
    for name, idx in INSTANCES:
        mpc = mpc_for(name)
        inp, zw = caps[name][idx]
        U_star = oracles[name][idx]
        su = np.asarray(mpc.scale_u)
        inp_j = jax.tree.map(jnp.asarray, inp)
        with jax.default_matmul_precision("highest"):
            for real in ("eager", "jit"):
                build = jax.jit(mpc._build_qp) if real == "jit" else mpc._build_qp
                data, aux = build(inp_j)
                outs = pipe_fn(name, ridge, zooms)(data)

                def err_x(x_un):
                    sol = QPSolution(x=x_un, y=None, z=None, r_prim=0.,
                                     r_dual=0., obj=0., rp_rel=0., rd_rel=0.)
                    out = mpc._extract(sol, data, aux)
                    rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
                    return rel[:2, 1].max()

                errs = [err_x(o) for o in outs]
                mets = [metric_f64(o, data, mpc.eq_rows) for o in outs]
                pick = int(np.argmin([m[0] + 1e3 * m[1] for m in mets]))
                picked_errs.append(errs[pick])
                final_errs.append(errs[-1])
                best_errs.append(min(errs))
                flag = " <-- BAD" if errs[pick] > 3e-4 else ""
                print(f"{name}[{idx}]/{real}: errs=" +
                      "/".join(f"{e:.1e}" for e in errs) +
                      f" mets=" + "/".join(f"{m[0]:.1e}" for m in mets) +
                      f" pick={pick} err={errs[pick]:.2e}{flag}", flush=True)
    print(f"\nWORST picked: {max(picked_errs):.3e}  "
          f"WORST final-round: {max(final_errs):.3e}  "
          f"WORST oracle-best: {max(best_errs):.3e}")


if __name__ == "__main__":
    main()
