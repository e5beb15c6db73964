"""Debug the active-set penalty refinement on one captured instance."""
import os, pickle, sys
from pathlib import Path
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
_cache = str(Path(__file__).resolve().parent.parent / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation
from racing_lmpc_tpu.mpc.qp import QPData, ruiz_equilibrate
from racing_lmpc_tpu.mpc import ipm
from racing_lmpc_tpu.mpc.ipm import (
    _ipm_core, _condensed_solver_factory, _struct_matvecs, _RIDGE_REL)
from racing_lmpc_tpu.ops.compensated import (
    dot_compensated, matvec_compensated, two_sum)

caps, oracles = pickle.loads(
    (Path(__file__).parent / ".acc_cache.pkl").read_bytes())

name = "barc_tracking_mpc"
cs = CoSimulation(_SCENARIOS[name], n_override=20,
                  mpc_overrides={"qp_zoom_rounds": 3})
mpc = cs.controller.mpc
inp, zw = caps[name][3]     # a deviated instance (index 6+3=9 is dev[0])
U_star = oracles[name][3]
su = np.asarray(mpc.scale_u)

with jax.default_matmul_precision("highest"):
    data, aux = mpc._build_qp(jax.tree.map(jnp.asarray, inp))
    data = data._replace(P=0.5 * (data.P + data.P.T))
    sdata0, (D, E, c) = ruiz_equilibrate(data)
    n = sdata0.P.shape[0]
    trace_n = jnp.trace(sdata0.P) / n
    I_n = jnp.eye(n, dtype=sdata0.P.dtype)
    sdata = sdata0._replace(P=sdata0.P + (_RIDGE_REL * trace_n) * I_n)
    eq_rows, struct = mpc.eq_rows, mpc.qp_struct
    xs, ys = _ipm_core(sdata, iters=14, delta=1e-7, eq_rows=eq_rows,
                       struct=struct)

    P0, q0, A0, l0, u0 = sdata0

    def comp_pieces(x):
        f_h, f_l = matvec_compensated(A0, x)
        rq_h, rq_l = matvec_compensated(P0, x)
        rq_h, e1 = two_sum(rq_h, q0)
        return f_h, f_l, rq_h, rq_l + e1

    PEN = 30.0 * (1.0 + jnp.max(jnp.abs(jnp.nan_to_num(ys))))

    def phi_of(x, pieces):
        f_h, f_l, rq_h, rq_l = pieces
        oh1, ol1 = dot_compensated(x, rq_h)
        oh2, ol2 = dot_compensated(x, rq_l)
        oh3, ol3 = dot_compensated(q0, x)
        obj = 0.5 * (oh1 + ol1 + oh2 + ol2 + oh3 + ol3)
        f = f_h + f_l
        viol = jnp.max(jnp.abs(f - jnp.clip(f, l0, u0)))
        return obj + PEN * viol, viol

    pieces = comp_pieces(xs)
    phi1, viol1 = phi_of(xs, pieces)
    print(f"after IPM: phi={float(phi1):.8f} viol={float(viol1):.3e}")

    # err vs oracle before refine
    def steer_err(x_scaled):
        x_un = x_scaled * D
        from racing_lmpc_tpu.mpc.qp import QPSolution
        sol = QPSolution(x=x_un, y=jnp.zeros_like(E), z=None, r_prim=0.,
                         r_dual=0., obj=0., rp_rel=0., rd_rel=0.)
        out = mpc._extract(sol, data, aux)
        rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
        return rel[:2, 1].max()

    print("applied steer err after IPM:", steer_err(xs))

    # ---- one refine round with prints
    m0 = A0.shape[0]
    delta = 1e-7
    make_solver_r = _condensed_solver_factory(
        P0, A0, eq_rows, struct, delta, jnp.asarray(1e-6, P0.dtype))
    _, ATmv_r = _struct_matvecs(A0, struct, eq_rows, n, m0, P0.dtype)
    is_eq_r = jnp.zeros(m0, dtype=bool).at[eq_rows].set(True)
    fin_l0 = jnp.isfinite(l0) & ~is_eq_r
    fin_u0 = jnp.isfinite(u0) & ~is_eq_r
    rho = jnp.asarray(1e5, P0.dtype)
    for rnd in range(3):
        f_h, f_l, rq_h, rq_l = pieces
        l_r = (l0 - f_h) - f_l
        u_r = (u0 - f_h) - f_l
        rq = rq_h + rq_l
        ymax = jnp.maximum(jnp.max(jnp.abs(jnp.nan_to_num(ys))), 1.0)
        near_u = u_r < 1e-2 * (1.0 + jnp.abs(jnp.where(fin_u0, u0, 0.0)))
        near_l = l_r > -1e-2 * (1.0 + jnp.abs(jnp.where(fin_l0, l0, 0.0)))
        act_u = fin_u0 & near_u & ((ys > 1e-6 * ymax)
                          | (u_r < 1e-6 * (1.0 + jnp.abs(jnp.where(fin_u0, u0, 0.0)))))
        act_l = fin_l0 & near_l & ((ys < -1e-6 * ymax)
                          | (l_r > -1e-6 * (1.0 + jnp.abs(jnp.where(fin_l0, l0, 0.0)))))
        both = act_u & act_l
        pick_u = jnp.abs(u_r) <= jnp.abs(l_r)
        act_u = jnp.where(both, pick_u, act_u)
        act_l = jnp.where(both, ~pick_u, act_l)
        active = act_u | act_l
        b_act = jnp.where(act_l, l_r, jnp.where(act_u, u_r, 0.0))
        D_pol = jnp.where(active, rho, 0.0)
        r1 = -rq + ATmv_r(D_pol * b_act)
        r2 = jnp.where(is_eq_r, u_r, 0.0)
        for lift in (3e-2, 1e-1, 3e-1, 1.0):
            e_t, dy_t = make_solver_r(D_pol, jnp.asarray(lift, P0.dtype))(r1, r2)
            # KKT residual of the penalty system
            Dc = jnp.minimum(D_pol, 1e6)
            H = P0 + lift * jnp.eye(n, P0.shape[0]) + (A0.T * Dc) @ A0
            res = jnp.max(jnp.abs(H @ e_t + A0[eq_rows].T @ dy_t[eq_rows] - r1))
            print(f"  lift={lift:.0e}: |e|={float(jnp.max(jnp.abs(e_t))):.3e} "
                  f"kkt_res={float(res):.3e} "
                  f"steer={steer_err(xs + e_t):.3e}")
        e, dy = make_solver_r(D_pol, jnp.asarray(1e-6, P0.dtype))(r1, r2)
        ok = bool(jnp.all(jnp.isfinite(e)) & jnp.all(jnp.isfinite(dy)))
        xs2 = xs + e
        pieces2 = comp_pieces(xs2)
        phi2, viol2 = phi_of(xs2, pieces2)
        print(f"round {rnd}: n_active={int(active.sum())} ok={ok} "
              f"|e|={float(jnp.max(jnp.abs(e))):.3e} "
              f"phi2={float(phi2):.8f} (phi1={float(phi1):.8f}) "
              f"viol2={float(viol2):.3e} better={bool(phi2 < phi1)} "
              f"steer_err2={steer_err(xs2) if ok else float('nan'):.3e}")
        if ok and phi2 < phi1:
            xs, pieces, phi1 = xs2, pieces2, phi2

    # deeper: is the penalty H even finite/PD?
    Dc = jnp.minimum(D_pol, 1e6)
    H = np.asarray(P0 + 1e-3 * jnp.eye(n) + (A0.T * Dc) @ A0, np.float64)
    print("H finite:", np.all(np.isfinite(H)), "sym err:", np.max(np.abs(H - H.T)))
    w = np.linalg.eigvalsh(0.5 * (H + H.T))
    print("eig range:", w.min(), w.max())
    print("b_act range:", float(jnp.min(b_act)), float(jnp.max(b_act)))
    print("r1 finite:", bool(jnp.all(jnp.isfinite(r1))),
          "max:", float(jnp.max(jnp.abs(r1))))
    print("r2 finite:", bool(jnp.all(jnp.isfinite(r2))),
          "max:", float(jnp.max(jnp.abs(jnp.where(is_eq_r, r2, 0.0)))))
    # where is the NaN introduced? replicate the factorization
    from racing_lmpc_tpu.ops.pallas_linalg import chol_lower, tri_inv_lower
    s = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(jnp.asarray(H, jnp.float32)), 1e-30))
    Hs = jnp.asarray(H, jnp.float32) * s[:, None] * s[None, :]
    L = chol_lower(Hs)
    print("L finite:", bool(jnp.all(jnp.isfinite(L))))
    Li = tri_inv_lower(L) * s[None, :]
    print("Li finite:", bool(jnp.all(jnp.isfinite(Li))))
    Ae = A0[eq_rows]
    T = Li @ Ae.T
    S_sc = T.T @ T + delta * jnp.eye(Ae.shape[0])
    Ls = chol_lower(S_sc)
    print("T finite:", bool(jnp.all(jnp.isfinite(T))),
          "S diag min:", float(jnp.min(jnp.diagonal(S_sc))),
          "Ls finite:", bool(jnp.all(jnp.isfinite(Ls))))
