"""Trace the zoom ladder round by round on captured instances."""
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
from racing_lmpc_tpu.mpc.ipm import _ipm_core, _RIDGE_REL
from racing_lmpc_tpu.ops.compensated import (
    dot_compensated, matvec_compensated, two_sum)

caps, oracles = pickle.loads(
    (Path(__file__).parent / ".acc_cache.pkl").read_bytes())

NAME = sys.argv[1] if len(sys.argv) > 1 else "barc_tracking_mpc"
IDX = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_OV = {"barc_tracking_mpc": 20, "barc_lmpc": 20,
        "putnam_short_tracking_mpc": 30}[NAME]
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 6

cs = CoSimulation(_SCENARIOS[NAME], n_override=N_OV,
                  mpc_overrides={"qp_zoom_rounds": 3})
mpc = cs.controller.mpc
inp, zw = caps[NAME][IDX]
U_star = oracles[NAME][IDX]
su = np.asarray(mpc.scale_u)

with jax.default_matmul_precision("highest"):
    if os.environ.get("DBGJIT"):
        data, aux = jax.jit(mpc._build_qp)(jax.tree.map(jnp.asarray, inp))
    else:
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
        h, l = oh1, ol1
        for b in (oh2, ol2, oh3, ol3):
            h, e = two_sum(h, b)
            l = l + e
        h, l = 0.5 * h, 0.5 * l
        f = f_h + f_l
        viol = jnp.sum(jnp.abs(f - jnp.clip(f, l0, u0)))
        h, e = two_sum(h, PEN * viol)
        return (h, l + e), viol

    def steer_err(x_scaled):
        sol = QPSolution(x=x_scaled * D, y=jnp.zeros_like(E), z=None,
                         r_prim=0., r_dual=0., obj=0., rp_rel=0., rd_rel=0.)
        out = mpc._extract(sol, data, aux)
        rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
        return rel[:2, 1].max(), rel[:, 1].max()

    pieces = comp_pieces(xs)
    phi1, v1 = phi_of(xs, pieces)
    a, t = steer_err(xs)
    print(f"{NAME}[{IDX}] after IPM: applied={a:.3e} tail={t:.3e}")

    zoom = jnp.asarray(1.0, dtype=sdata.P.dtype)
    for rnd in range(ROUNDS):
        f_h, f_l, rq_h, rq_l = pieces
        l_r = (l0 - f_h) - f_l
        u_r = (u0 - f_h) - f_l
        rq = rq_h + rq_l
        C_TR = jnp.asarray(100.0, jnp.float32)
        is_eq_row = jnp.zeros(A0.shape[0], bool).at[jnp.asarray(eq_rows)].set(True)
        lz = jnp.maximum(zoom * l_r, jnp.where(jnp.isfinite(l0), -C_TR, -jnp.inf))
        uz = jnp.minimum(zoom * u_r, jnp.where(jnp.isfinite(u0), C_TR, jnp.inf))
        lz = jnp.where(is_eq_row, zoom * u_r, lz)
        uz = jnp.where(is_eq_row, zoom * u_r, uz)
        rdata = QPData(P=P0, q=zoom * rq, A=A0, l=lz, u=uz)
        xe, ye = _ipm_core(rdata, iters=14, delta=1e-7,
                           eq_rows=eq_rows, struct=struct)
        step_ok = bool(jnp.all(jnp.isfinite(xe)) & jnp.all(jnp.isfinite(ye)))
        xs2 = xs + xe / zoom
        ys2 = ye / zoom
        pieces2 = comp_pieces(xs2)
        phi2, v2 = phi_of(xs2, pieces2)
        def dw_lt(a, b):
            return bool((a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1])))
        better = step_ok and dw_lt(phi2, phi1)
        a2, t2 = steer_err(xs2)
        e_norm = float(jnp.max(jnp.abs(xe)) / zoom)
        print(f"round {rnd}: zoom={float(zoom):.1e} ok={step_ok} "
              f"|xe|={float(jnp.max(jnp.abs(xe))):.3e} e_norm={e_norm:.3e} "
              f"dphi={float(phi2[0]-phi1[0]) + float(phi2[1]-phi1[1]):+.3e} v1={float(v1):.2e} v2={float(v2):.2e} PEN={float(PEN):.1e} better={better} "
              f"applied={a2:.3e} tail={t2:.3e}")
        if better:
            xs, ys, pieces, phi1 = xs2, ys2, pieces2, phi2
            zoom_next = 1.0 / max(1e-2 * e_norm, 1e-6)
            zoom = jnp.clip(jnp.asarray(zoom_next, sdata.P.dtype), 1.0, 1e6)
        else:
            zoom = jnp.clip(zoom * 30.0, 1.0, 1e6)
    a, t = steer_err(xs)
    print(f"final: applied={a:.3e} tail={t:.3e}")
