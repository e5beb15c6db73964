"""Pipeline variants (ridge, zoom schedule, acceptance) on captured instances.

Usage: python scripts/dbg_pipe.py [instance_spec ...]
Evaluates each variant on every instance x {eager, jit} data realization.
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
from racing_lmpc_tpu.mpc.ipm import _ipm_core
from racing_lmpc_tpu.ops.compensated import matvec_compensated, two_sum

caps, oracles = pickle.loads(
    (Path(__file__).parent / ".acc_cache.pkl").read_bytes())

N_OV = {"barc_tracking_mpc": 20, "barc_lmpc": 20,
        "putnam_short_tracking_mpc": 30}

_MPC = {}
def mpc_for(name):
    if name not in _MPC:
        cs = CoSimulation(_SCENARIOS[name], n_override=N_OV[name],
                          mpc_overrides={"qp_zoom_rounds": 3})
        _MPC[name] = cs.controller.mpc
    return _MPC[name]


_PIPE_CACHE = {}

def pipe_fn(name, ridge_rel, zooms, mode="clip100", sub_iters=14):
    """Jitted (data -> xs list) pipeline for this scenario/variant."""
    key = (name, ridge_rel, tuple(zooms), mode, sub_iters)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]
    mpc = mpc_for(name)
    eq_rows, struct = mpc.eq_rows, mpc.qp_struct

    def fn(data):
        data = data._replace(P=0.5 * (data.P + data.P.T))
        sdata0, (D, E, c) = ruiz_equilibrate(data)
        n = sdata0.P.shape[0]
        trace_n = jnp.trace(sdata0.P) / n
        sdata = sdata0._replace(
            P=sdata0.P + (ridge_rel * trace_n) * jnp.eye(n, dtype=jnp.float32))
        xs, ys = _ipm_core(sdata, iters=14, delta=1e-7, eq_rows=eq_rows,
                           struct=struct)
        P0, q0, A0, l0, u0 = sdata0

        def comp_pieces(x):
            f_h, f_l = matvec_compensated(A0, x)
            rq_h, rq_l = matvec_compensated(P0, x)
            rq_h, e1 = two_sum(rq_h, q0)
            return f_h, f_l, rq_h, rq_l + e1

        is_eq = jnp.zeros(A0.shape[0], bool)
        if eq_rows is not None:
            is_eq = is_eq.at[jnp.asarray(eq_rows)].set(True)
        C_TR = jnp.asarray(100.0, jnp.float32)
        outs = [xs]
        prev_e = None
        for zi in zooms:
            f_h, f_l, rq_h, rq_l = comp_pieces(xs)
            l_r = (l0 - f_h) - f_l
            u_r = (u0 - f_h) - f_l
            rq = rq_h + rq_l
            if zi is None:
                zoom = (jnp.asarray(1.0, jnp.float32) if prev_e is None else
                        jnp.clip(1.0 / jnp.maximum(1e-2 * prev_e, 1e-6),
                                 1.0, 1e6))
            else:
                zoom = jnp.asarray(zi, jnp.float32)
            if mode.startswith("clip"):
                C_TR = jnp.asarray(float(mode[4:].split("_")[0]), jnp.float32)
                lz = jnp.maximum(zoom * l_r,
                                 jnp.where(jnp.isfinite(l0), -C_TR, -jnp.inf))
                uz = jnp.minimum(zoom * u_r,
                                 jnp.where(jnp.isfinite(u0), C_TR, jnp.inf))
                lz = jnp.where(is_eq, zoom * u_r, lz)
                uz = jnp.where(is_eq, zoom * u_r, uz)
                rdata = QPData(P=P0, q=zoom * rq, A=A0, l=lz, u=uz)
                De = jnp.ones_like(q0)
            else:
                # geometry-preserving re-equilibration of the magnified
                # residual problem (Ruiz shifts the barrier by constants,
                # so the subproblem's central path targets the SAME
                # analytic center as the original's)
                rdata, (De, Ee, ce) = ruiz_equilibrate(
                    QPData(P=P0, q=zoom * rq, A=A0,
                           l=zoom * l_r, u=zoom * u_r))
            xe_s, ye_s = _ipm_core(rdata, iters=sub_iters, delta=1e-7,
                                   eq_rows=eq_rows, struct=struct,
                                   do_polish="nopol" not in mode)
            xe = De * xe_s
            ok = jnp.all(jnp.isfinite(xe))
            xs = jnp.where(ok, xs + xe / zoom, xs)
            prev_e = jnp.max(jnp.abs(xe)) / zoom
            outs.append(xs)
        return [o * D for o in outs]

    import functools
    _PIPE_CACHE[key] = jax.jit(fn)
    return _PIPE_CACHE[key]


def run_pipe(name, idx, realization, ridge_rel, zooms, accept, mode="clip100", sub_iters=14):
    """zooms: list of zoom factors (None = adaptive from prev e_norm).
    accept: 'phi' | 'always'.  Returns applied steer err."""
    mpc = mpc_for(name)
    inp, zw = caps[name][idx]
    U_star = oracles[name][idx]
    su = np.asarray(mpc.scale_u)
    inp_j = jax.tree.map(jnp.asarray, inp)
    with jax.default_matmul_precision("highest"):
        build = jax.jit(mpc._build_qp) if realization == "jit" else mpc._build_qp
        data, aux = build(inp_j)
        outs = pipe_fn(name, ridge_rel, zooms)(data)
        def err_x(x_un):
            sol = QPSolution(x=x_un, y=None, z=None, r_prim=0.,
                             r_dual=0., obj=0., rp_rel=0., rd_rel=0.)
            out = mpc._extract(sol, data, aux)
            rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
            return rel[:2, 1].max()
        return [err_x(o) for o in outs]


INSTANCES = [("barc_tracking_mpc", i) for i in range(6)] + \
            [("barc_lmpc", i) for i in range(3)] + \
            [("putnam_short_tracking_mpc", i) for i in range(2)]

VARIANTS = [
    ("it30 z[1,ad,ad]",  1e-6, [1.0, None, None], "clip100", 30),
    ("it50 z[1,ad]",     1e-6, [1.0, None],       "clip100", 50),
]

if __name__ == "__main__":
    only = sys.argv[1:] or None
    for vname, ridge, zooms, mode, sub_iters in VARIANTS:
        worst = 0.0
        lines = []
        for name, idx in INSTANCES:
            if only and name not in only:
                continue
            for real in ("eager", "jit"):
                e = run_pipe(name, idx, real, ridge, zooms, "always", mode, sub_iters)
                worst = max(worst, e[-1])
                lines.append(f"    {name}[{idx}]/{real}: " +
                             " -> ".join(f"{x:.2e}" for x in e))
        print(f"== {vname}: WORST={worst:.3e}")
        for ln in lines:
            print(ln)
        sys.stdout.flush()
