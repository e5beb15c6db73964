"""Prototype: compensated stationary refinement on the active-set KKT.

Target: drive the applied-steer error vs the f64 oracle to <= 3e-4 from an
IPM(+zoom) iterate, using ONE moderate-rho factorization + T compensated
residual-correction iterations (no f64 anywhere).
"""
import os, pickle, sys
from pathlib import Path
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation
from racing_lmpc_tpu.mpc.qp import QPData, QPSolution, ruiz_equilibrate
from racing_lmpc_tpu.mpc.ipm import (
    _ipm_core, _condensed_solver_factory, _struct_matvecs, _RIDGE_REL)
from racing_lmpc_tpu.ops.compensated import (
    matvec_compensated, two_sum)

caps, oracles = pickle.loads(
    (Path(__file__).parent / ".acc_cache.pkl").read_bytes())

NAME = sys.argv[1] if len(sys.argv) > 1 else "barc_tracking_mpc"
IDX = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ZOOMS = int(sys.argv[3]) if len(sys.argv) > 3 else 1
N_OV = {"barc_tracking_mpc": 20, "barc_lmpc": 20,
        "putnam_short_tracking_mpc": 30}[NAME]

cs = CoSimulation(_SCENARIOS[NAME], n_override=N_OV,
                  mpc_overrides={"qp_zoom_rounds": 3})
mpc = cs.controller.mpc
inp, zw = caps[NAME][IDX]
U_star = oracles[NAME][IDX]
su = np.asarray(mpc.scale_u)

with jax.default_matmul_precision("highest"):
    data, aux = mpc._build_qp(jax.tree.map(jnp.asarray, inp))
    data = data._replace(P=0.5 * (data.P + data.P.T))
    sdata0, (D, E, c) = ruiz_equilibrate(data)
    n = sdata0.P.shape[0]
    trace_n = jnp.trace(sdata0.P) / n
    sdata = sdata0._replace(
        P=sdata0.P + (_RIDGE_REL * trace_n) * jnp.eye(n, dtype=sdata0.P.dtype))
    eq_rows, struct = mpc.eq_rows, mpc.qp_struct
    xs, ys = _ipm_core(sdata, iters=14, delta=1e-7, eq_rows=eq_rows,
                       struct=struct)
    P0, q0, A0, l0, u0 = sdata0
    m0 = A0.shape[0]
    delta = 1e-7

    def comp_grad(x):
        """(A x) and (P0 x + q0) in double-word."""
        f_h, f_l = matvec_compensated(A0, x)
        g_h, g_l = matvec_compensated(P0, x)
        g_h, e1 = two_sum(g_h, q0)
        return (f_h, f_l), (g_h, g_l + e1)

    def steer_err(x_scaled):
        sol = QPSolution(x=x_scaled * D, y=jnp.zeros_like(E), z=None,
                         r_prim=0., r_dual=0., obj=0., rp_rel=0., rd_rel=0.)
        out = mpc._extract(sol, data, aux)
        rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
        return rel[:2, 1].max(), rel[:, 1].max()

    a, t = steer_err(xs)
    print(f"{NAME}[{IDX}] after IPM: applied={a:.3e} tail={t:.3e}")

    # optional zoom rounds first (bring the iterate close + good duals)
    zoom = jnp.asarray(1.0, jnp.float32)
    for rnd in range(ZOOMS):
        (f_h, f_l), (g_h, g_l) = comp_grad(xs)
        l_r = (l0 - f_h) - f_l
        u_r = (u0 - f_h) - f_l
        rq = g_h + g_l
        C = jnp.asarray(100.0, jnp.float32)
        lz = jnp.maximum(zoom * l_r, jnp.where(jnp.isfinite(l_r), -C, -jnp.inf))
        uz = jnp.minimum(zoom * u_r, jnp.where(jnp.isfinite(u_r), C, jnp.inf))
        # keep equalities exact: rows with l==u must stay equal
        is_eq_row = jnp.zeros(A0.shape[0], bool).at[jnp.asarray(eq_rows)].set(True)
        lz = jnp.where(is_eq_row, zoom * u_r, lz)
        uz = jnp.where(is_eq_row, zoom * u_r, uz)
        rdata = QPData(P=P0, q=zoom * rq, A=A0, l=lz, u=uz)
        xe, ye = _ipm_core(rdata, iters=14, delta=delta,
                           eq_rows=eq_rows, struct=struct)
        xs = xs + xe / zoom
        ys = ye / zoom
        e_norm = float(jnp.max(jnp.abs(xe)) / zoom)
        zoom = jnp.clip(jnp.asarray(1.0 / max(1e-2 * e_norm, 1e-6)), 1.0, 1e6)
        a, t = steer_err(xs)
        print(f"zoom {rnd}: applied={a:.3e} tail={t:.3e}")

    # ---- semi-smooth active-set refinement with sign self-correction ----
    is_eq = np.zeros(m0, bool); is_eq[np.asarray(eq_rows)] = True
    is_eq = jnp.asarray(is_eq)
    fin_l = jnp.isfinite(l0) & ~is_eq
    fin_u = jnp.isfinite(u0) & ~is_eq
    rho_m = jnp.asarray(1e2, jnp.float32)
    lift = jnp.asarray(1e-4, jnp.float32)
    make_solver = _condensed_solver_factory(
        P0, A0, eq_rows, struct, 1e-7, lift)
    Amv, ATmv = _struct_matvecs(A0, struct, eq_rows, n, m0, jnp.float32)

    xbest = xs
    w = jnp.where(is_eq, ys, 0.0)
    drop_u = jnp.zeros(m0, bool); drop_l = jnp.zeros(m0, bool)
    NEAR = 3e-3
    for outer in range(4):
        (f_h, f_l), (g_h, g_l) = comp_grad(xbest)
        l_r = (l0 - f_h) - f_l
        u_r = (u0 - f_h) - f_l
        act_u = fin_u & (u_r < NEAR) & ~drop_u
        act_l = fin_l & (l_r > -NEAR) & ~drop_l
        both = act_u & act_l
        pick_u = jnp.abs(u_r) <= jnp.abs(l_r)
        act_u = jnp.where(both, pick_u, act_u)
        act_l = jnp.where(both, ~pick_u, act_l)
        active = act_u | act_l
        sel = active | is_eq
        solve = make_solver(jnp.where(active, rho_m, 0.0), lift)
        e = jnp.zeros(n, jnp.float32)
        w = jnp.where(sel, w, 0.0)
        for t_i in range(25):
            xc = xbest + e
            (fc_h, fc_l), (gc_h, gc_l) = comp_grad(xc)
            aw_h, aw_l = matvec_compensated(A0.T, jnp.where(sel, w, 0.0))
            s1 = -((gc_h + aw_h) + (gc_l + aw_l))
            s2 = jnp.where(act_l, (l0 - fc_h) - fc_l,
                           jnp.where(act_u | is_eq, (u0 - fc_h) - fc_l, 0.0))
            de, dy_eq = solve(s1 + ATmv(jnp.where(active, rho_m * s2, 0.0)),
                              jnp.where(is_eq, s2, 0.0))
            dy_a = rho_m * (Amv(de) - s2)
            e = e + de
            w = jnp.where(active, w + dy_a, jnp.where(is_eq, w + dy_eq, 0.0))
        # sign correction: upper-bound rows need w >= 0, lower rows w <= 0
        bad_u = act_u & (w < -1e-6)
        bad_l = act_l & (w > 1e-6)
        drop_u = drop_u | bad_u
        drop_l = drop_l | bad_l
        ok = bool(jnp.all(jnp.isfinite(e)))
        cand = xbest + e
        a2, t2 = steer_err(cand)
        (fc_h, fc_l), (gc_h, gc_l) = comp_grad(cand)
        viol = float(jnp.sum(jnp.abs(jnp.where(fin_u, jnp.maximum((fc_h - u0) + fc_l, 0), 0)))
                     + jnp.sum(jnp.abs(jnp.where(fin_l, jnp.maximum((l0 - fc_h) - fc_l, 0), 0))))
        print(f"outer {outer}: n_act={int(active.sum())} dropped={int((drop_u|drop_l).sum())} "
              f"ok={ok} applied={a2:.3e} tail={t2:.3e} viol={viol:.2e}")
        if ok and not bool((bad_u | bad_l).any()):
            xbest = cand
            break
        if ok and outer == 3:
            xbest = cand
    a2, t2 = steer_err(xbest)
    print(f"final AL: applied={a2:.3e} tail={t2:.3e}")
