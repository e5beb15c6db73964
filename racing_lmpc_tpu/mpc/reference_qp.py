"""Float64 transcription of the reference controller's exact QP (golden oracle).

The reference assembles a parametric CasADi ``Opti("conic")`` problem once and
hands it to OSQP-with-polish at float64 (racing_mpc.cpp:31-543).  This module
rebuilds that problem **verbatim over the sparse variables** — the scaled
X (nx, N), U (nu, N-1), dU (nu, N-1), the scalar boundary slack, the convex
combination lambda and the convex-hull slack vector — in float64 numpy, and
solves it to KKT residuals ~1e-10 with an independent dense Mehrotra
predictor-corrector method (plus an optional scipy ``trust-constr``
cross-check).  It is the acceptance oracle for the BASELINE "control match
<= 1e-3 vs the reference controller" criterion: unlike the engine's condensed
QP, nothing here is eliminated, pre-stabilized or re-ordered, so a condensing
bug in the engine cannot hide.

Transcribed constraint-for-constraint from /root/reference:

- variables + fixed diagonal scaling        racing_mpc.cpp:36-45
- soft track boundary, scalar slack         racing_mpc.cpp:524-543
- tracking cost (incl. the CasADi U_(i-1)
  negative-index quirk, whose u/du effort
  sum is index-set-equal to a plain sum)    racing_mpc.cpp:442-477
- LMPC cost: ss_costs . lambda, hull slack
  vector with diagonal quadratic penalty    racing_mpc.cpp:479-522
- model linear rows (single-track simplified
  lon bound, steering box, dui rate rows)   single_track_planar_model.cpp:113-158
- primal x/u boxes on stages 0..N-2 (the
  terminal state is NOT boxed)              racing_mpc.cpp:147-148
- linearized dynamics rows  x_{i+1} = A x_i + B u_i + g  with (A, B, g)
  evaluated at (X_ref_i, U_ref_i) in f64    racing_mpc.cpp:168-187
- control-rate coupling u_{i-1} + du_i t_i = u_i, u_{-1} = u_ic
                                            racing_mpc.cpp:189-197
- initial state equality                    racing_mpc.cpp:199-201
- X_ref abscissa wrap into the current
  period before everything else             racing_mpc.cpp:219-223

The Jacobians come from the same JAX model as the engine but evaluated under
``jax.enable_x64`` on float64 inputs, i.e. at the precision the
reference's CasADi SX graphs run at.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax

__all__ = ["ReferenceQP", "build_reference_qp", "solve_dense_qp_f64",
           "kkt_residuals"]


@dataclass
class RefLayout:
    nx: int
    nu: int
    N: int
    K: int
    has_bslack: bool
    has_hull_slack: bool
    learning: bool

    def __post_init__(self):
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        self.x_off = 0
        self.u_off = N * nx
        self.du_off = self.u_off + (N - 1) * nu
        off = self.du_off + (N - 1) * nu
        self.sb_off = off
        off += 1 if self.has_bslack else 0
        self.lam_off = off
        off += K if self.learning else 0
        self.hs_off = off
        off += nx if self.has_hull_slack else 0
        self.n = off

    def ix(self, i):
        return self.x_off + i * self.nx

    def iu(self, i):
        return self.u_off + i * self.nu

    def idu(self, i):
        return self.du_off + i * self.nu


@dataclass
class ReferenceQP:
    """Dense f64 QP in OSQP form: min 1/2 z'Pz + q'z  s.t.  l <= Az <= u."""
    P: np.ndarray
    q: np.ndarray
    A: np.ndarray
    l: np.ndarray
    u: np.ndarray
    layout: RefLayout
    scale_x: np.ndarray
    scale_u: np.ndarray

    def controls(self, z: np.ndarray) -> np.ndarray:
        """Unscaled U (N-1, nu) from a solution vector."""
        L = self.layout
        return (z[L.u_off:L.du_off].reshape(L.N - 1, L.nu)
                * self.scale_u[None, :])

    def states(self, z: np.ndarray) -> np.ndarray:
        L = self.layout
        return (z[:L.u_off].reshape(L.N, L.nx) * self.scale_x[None, :])

    def objective(self, z: np.ndarray) -> float:
        return float(0.5 * z @ (self.P @ z) + self.q @ z)


def _f64_model_data(model, X_ref, U_ref, curvatures, T_ref):
    """(A_i, B_i, g_i) stage Jacobians at float64 through the JAX model."""
    with jax.enable_x64(True):
        def jac(x, u, k, t):
            return model.discrete_dynamics_jacobian(x, u, k, t)
        As, Bs, gs = jax.vmap(jac)(
            np.asarray(X_ref[:-1], np.float64), np.asarray(U_ref, np.float64),
            np.asarray(curvatures[:-1], np.float64),
            np.asarray(T_ref, np.float64))
        return (np.asarray(As, np.float64), np.asarray(Bs, np.float64),
                np.asarray(gs, np.float64))


def _align_abscissa(s1, s2, length):
    """Wrap s1 into [s2 - L/2, s2 + L/2) (lmpc_utils/utils.hpp:61-80)."""
    return s1 - length * np.floor((s1 - s2) / length + 0.5)


def build_reference_qp(model, cfg, inp, margin: float | None = None,
                       dA=None, dB=None, dC=None) -> ReferenceQP:
    """Assemble the reference QP at float64 from an MPCInput-like object.

    ``cfg`` is the engine's RacingMPCConfig (same parameter names as the
    reference YAML).  ``inp`` fields are converted to f64 numpy.  ``margin``
    defaults to cfg.margin + b/2 exactly as racing_mpc.cpp:533.
    ``dA/dB/dC`` optionally apply the same error-dynamics correction the
    engine receives (additive on every stage linearization).
    """
    nx, nu, N = model.nx, model.nu, cfg.n
    K = cfg.num_ss_pts if cfg.learning else 0
    g = lambda a: np.asarray(a, np.float64)
    x_ic, u_ic = g(inp.x_ic), g(inp.u_ic)
    X_ref, U_ref = g(inp.X_ref).copy(), g(inp.U_ref)
    T_ref = g(inp.T_ref)
    curvatures = g(inp.curvatures)
    total_length = float(np.asarray(inp.total_length))
    # abscissa wrap into the vehicle's current period (racing_mpc.cpp:219-223)
    X_ref[:, 0] = _align_abscissa(X_ref[:, 0], x_ic[0], total_length)

    hull_w = np.asarray(cfg.convex_hull_slack, np.float64)
    has_hull_slack = bool(cfg.learning and hull_w.size and hull_w.sum() > 0)
    has_bslack = bool(cfg.q_boundary > 0.0)
    L = RefLayout(nx=nx, nu=nu, N=N, K=K, has_bslack=has_bslack,
                  has_hull_slack=has_hull_slack, learning=bool(cfg.learning))

    # fixed diagonal scaling (racing_mpc.cpp:36-37); mirror the engine's
    # per-model override hook so both see the same variable scaling
    so = model.state_scales()
    scale_x = (np.asarray(so, np.float64) if so is not None
               else np.array([2000.0, 10.0, 0.1, 80.0, 2.0, 2.0])[:nx])
    scale_u = (np.array([10.0, 0.3]) if nu == 2
               else np.array([10.0, 10.0, 0.3]))

    As, Bs, gs = _f64_model_data(model, X_ref, U_ref, curvatures, T_ref)
    if dA is not None:
        As = As + g(dA)[None]
        Bs = Bs + g(dB)[None]
        gs = gs + g(dC)[None, :]

    P = np.zeros((L.n, L.n))
    q = np.zeros(L.n)
    rows_A, rows_l, rows_u = [], [], []

    def add_row(cols_vals, lo, hi):
        r = np.zeros(L.n)
        for c, v in cols_vals:
            r[c] += v
        rows_A.append(r)
        rows_l.append(lo)
        rows_u.append(hi)

    sx, su = scale_x, scale_u

    # ---- costs ----------------------------------------------------------
    R = np.asarray(cfg.R(nu), np.float64)
    R_d = np.asarray(cfg.R_d(nu), np.float64)
    for i in range(N - 1):
        # u' R u and du' R_d du on the scaled variables (P convention 1/2 z'Pz)
        iu, idu = L.iu(i), L.idu(i)
        P[iu:iu + nu, iu:iu + nu] += 2.0 * (su[:, None] * R * su[None, :])
        P[idu:idu + nu, idu:idu + nu] += 2.0 * (su[:, None] * R_d * su[None, :])

    if cfg.learning:
        ss_x = g(inp.ss_x)            # (K, nx)
        ss_j = g(inp.ss_j)            # (K,) relative cost-to-go
        q[L.lam_off:L.lam_off + K] += ss_j
        if has_hull_slack:
            hs = L.hs_off
            P[hs:hs + nx, hs:hs + nx] += 2.0 * np.diag(hull_w)
    else:
        vel_ref = g(inp.vel_ref)
        ci = model.cost_state_indices()
        for i in range(N):
            term = i == N - 1
            w10 = 10.0 if term else 1.0
            ix = L.ix(i)
            cI, hI, vI = ci["contour"], ci["heading"], ci["vel"]
            P[ix + cI, ix + cI] += 2.0 * cfg.q_contour * w10 * sx[cI] ** 2
            P[ix + hI, ix + hI] += 2.0 * cfg.q_heading * w10 * sx[hI] ** 2
            P[ix + vI, ix + vI] += 2.0 * cfg.q_vel * w10 * sx[vI] ** 2
            q[ix + vI] += -2.0 * cfg.q_vel * w10 * vel_ref[i] * sx[vI]
            if not term:
                if ci["vy"] is not None:
                    yI = ci["vy"]
                    P[ix + yI, ix + yI] += 2.0 * cfg.q_vy * sx[yI] ** 2
                if ci["vyaw"] is not None:
                    wI = ci["vyaw"]
                    P[ix + wI, ix + wI] += 2.0 * cfg.q_vyaw * sx[wI] ** 2

    if has_bslack:
        P[L.sb_off, L.sb_off] += 2.0 * cfg.q_boundary

    # ---- track boundary (racing_mpc.cpp:524-543) ------------------------
    m_eff = (cfg.margin + model.base_config.chassis.b / 2.0
             if margin is None else margin)
    bl, br = g(inp.bound_left), g(inp.bound_right)
    ci_contour = model.cost_state_indices()["contour"]
    for i in range(N):
        py_col = L.ix(i) + ci_contour
        if has_bslack:
            add_row([(py_col, sx[ci_contour]), (L.sb_off, -1.0)],
                    -np.inf, bl[i] - m_eff)
            add_row([(py_col, sx[ci_contour]), (L.sb_off, 1.0)],
                    br[i] + m_eff, np.inf)
        else:
            add_row([(py_col, sx[ci_contour])], br[i] + m_eff, bl[i] - m_eff)
    if has_bslack:
        add_row([(L.sb_off, 1.0)], 0.0, np.inf)

    # ---- model linear rows + primal boxes, stages 0..N-2 ----------------
    bounds = model.control_bounds()
    x_min = np.asarray(cfg.x_min, np.float64) if len(cfg.x_min) == nx \
        else np.full(nx, -np.inf)
    x_max = np.asarray(cfg.x_max, np.float64) if len(cfg.x_max) == nx \
        else np.full(nx, np.inf)
    u_min = np.asarray(cfg.u_min, np.float64) if len(cfg.u_min) == nu \
        else np.full(nu, -np.inf)
    u_max = np.asarray(cfg.u_max, np.float64) if len(cfg.u_max) == nu \
        else np.full(nu, np.inf)
    for i in range(N - 1):
        iu, idu, ix = L.iu(i), L.idu(i), L.ix(i)
        # model control bounds (add_nlp_constraints "x" branch linear subset)
        for j in range(nu):
            add_row([(iu + j, su[j])], bounds.u_lb[j], bounds.u_ub[j])
        # model rate rows (add_nlp_constraints "dui" branch)
        for j in range(nu):
            add_row([(idu + j, su[j])], bounds.du_lb[j], bounds.du_ub[j])
        # primal boxes (racing_mpc.cpp:147-148) — stages 0..N-2 only
        for j in range(nx):
            if np.isfinite(x_min[j]) or np.isfinite(x_max[j]):
                add_row([(ix + j, sx[j])], x_min[j], x_max[j])
        for j in range(nu):
            if np.isfinite(u_min[j]) or np.isfinite(u_max[j]):
                add_row([(iu + j, su[j])], u_min[j], u_max[j])

    # ---- dynamics + rate coupling equalities -----------------------------
    for i in range(N - 1):
        ix, ix1, iu, idu = L.ix(i), L.ix(i + 1), L.iu(i), L.idu(i)
        for r in range(nx):
            cols = [(ix1 + r, sx[r])]
            cols += [(ix + c, -As[i][r, c] * sx[c]) for c in range(nx)]
            cols += [(iu + c, -Bs[i][r, c] * su[c]) for c in range(nu)]
            add_row(cols, gs[i][r], gs[i][r])
        # u_{i-1} + du_i t_i = u_i  (u_{-1} = u_ic)
        for j in range(nu):
            cols = [(iu + j, -su[j]), (idu + j, T_ref[i] * su[j])]
            if i == 0:
                add_row(cols, -u_ic[j], -u_ic[j])
            else:
                cols.append((L.iu(i - 1) + j, su[j]))
                add_row(cols, 0.0, 0.0)

    # ---- initial state equality (racing_mpc.cpp:199-201) -----------------
    for j in range(nx):
        add_row([(L.ix(0) + j, sx[j])], x_ic[j], x_ic[j])

    # ---- LMPC simplex + hull (racing_mpc.cpp:479-522) ---------------------
    if cfg.learning:
        for kk in range(K):
            add_row([(L.lam_off + kk, 1.0)], 0.0, np.inf)
        add_row([(L.lam_off + kk, 1.0) for kk in range(K)], 1.0, 1.0)
        ixN = L.ix(N - 1)
        for r in range(nx):
            cols = [(ixN + r, sx[r])]
            cols += [(L.lam_off + kk, -ss_x[kk, r]) for kk in range(K)]
            if has_hull_slack:
                cols.append((L.hs_off + r, -1.0))
            add_row(cols, 0.0, 0.0)

    A = np.vstack(rows_A)
    return ReferenceQP(P=P, q=q, A=A, l=np.asarray(rows_l),
                       u=np.asarray(rows_u), layout=L,
                       scale_x=sx, scale_u=su)


# ---------------------------------------------------------------------------
# Independent dense f64 solver (Mehrotra predictor-corrector) + KKT check.
# Written against the textbook recipe over the SPARSE formulation above; it
# shares no code or structure with the engine's jitted condensed IPM
# (mpc/ipm.py), which is the point: agreement between the two certifies the
# engine's condensing + f32 pipeline end to end.
# ---------------------------------------------------------------------------

def kkt_residuals(qp: ReferenceQP, z: np.ndarray, y: np.ndarray):
    """(primal, dual, complementarity) max-norm residuals at (z, y).

    ``y`` follows the OSQP convention: positive on active upper bounds.
    """
    Az = qp.A @ z
    rp = np.max(np.abs(Az - np.clip(Az, qp.l, qp.u)))
    rd = np.max(np.abs(qp.P @ z + qp.q + qp.A.T @ y))
    is_eq = np.isfinite(qp.l) & np.isfinite(qp.u) & (qp.u - qp.l < 1e-12)
    comp_u = np.maximum(y, 0.0) * np.where(
        np.isfinite(qp.u) & ~is_eq, np.abs(qp.u - Az), 0.0)
    comp_l = np.maximum(-y, 0.0) * np.where(
        np.isfinite(qp.l) & ~is_eq, np.abs(Az - qp.l), 0.0)
    rc = np.max(np.where(is_eq, 0.0, comp_u + comp_l)) if len(y) else 0.0
    return rp, rd, rc


def _ruiz_f64(P, q, A, l, u, rounds: int = 20):
    """Modified Ruiz equilibration (f64, numpy).  Returns scaled data plus
    (d, e) diagonal scalings with z = d * z_scaled, y = e * y_scaled."""
    n, m = len(q), len(l)
    d = np.ones(n)
    e = np.ones(m)
    Ps, qs, As = P.copy(), q.copy(), A.copy()
    ls, us = l.copy(), u.copy()
    for _ in range(rounds):
        col = np.sqrt(np.maximum(
            np.max(np.abs(Ps), axis=0),
            np.max(np.abs(As), axis=0) if m else 0.0))
        col = np.where(col < 1e-10, 1.0, col)
        row = (np.sqrt(np.max(np.abs(As), axis=1)) if m else np.ones(0))
        row = np.where(row < 1e-10, 1.0, row)
        Ps /= col[:, None]
        Ps /= col[None, :]
        qs /= col
        As /= row[:, None]
        As /= col[None, :]
        ls = ls / row
        us = us / row
        d /= col
        e /= row
    return Ps, qs, As, ls, us, d, e


def solve_dense_qp_f64(qp: ReferenceQP, iters: int = 80, tol: float = 1e-10,
                       verify: bool = True, scale: bool = True):
    """Dense f64 Mehrotra predictor-corrector on l <= Az <= u form.

    Returns (z, y).  Raises if the verified KKT residuals (checked on the
    ORIGINAL, unscaled data) exceed 1e-7 — the oracle must be certifiably
    converged or it is useless.
    """
    if scale:
        Ps, qs, As, ls, us, d_sc, e_sc = _ruiz_f64(qp.P, qp.q, qp.A, qp.l, qp.u)
        lay = qp.layout
        sqp = ReferenceQP(P=Ps, q=qs, A=As, l=ls, u=us, layout=lay,
                          scale_x=qp.scale_x, scale_u=qp.scale_u)
        zs, ys = solve_dense_qp_f64(sqp, iters=iters, tol=tol,
                                    verify=False, scale=False)
        z, y = d_sc * zs, e_sc * ys
        if verify:
            rp, rd, rc = kkt_residuals(qp, z, y)
            ref = max(1.0, float(np.max(np.abs(qp.q))))
            if max(rp, rd / ref, rc) > 1e-7:
                raise RuntimeError(
                    f"oracle did not certify: rp={rp:.2e} rd={rd:.2e} "
                    f"rc={rc:.2e}")
        return z, y
    P, q, A, l, u = qp.P, qp.q, qp.A, qp.l, qp.u
    n, m = len(q), len(l)
    is_eq = np.isfinite(l) & np.isfinite(u) & (u - l < 1e-12)
    has_l = np.isfinite(l) & ~is_eq
    has_u = np.isfinite(u) & ~is_eq
    b_eq = np.where(is_eq, u, 0.0)
    E = A[is_eq]
    me = E.shape[0]
    nb = max(int(has_l.sum() + has_u.sum()), 1)

    z = np.zeros(n)
    f = A @ z
    s_l = np.where(has_l, np.maximum(f - l, 1.0), 1.0)
    s_u = np.where(has_u, np.maximum(u - f, 1.0), 1.0)
    zl = has_l.astype(float)
    zu = has_u.astype(float)
    ye = np.zeros(me)
    # best-iterate safeguard: past the f64 central-path floor a Newton step
    # can corrupt a fully-converged iterate (observed: rd 2e-13 at it 15,
    # 5e-1 at it 35 on the engine's condensed QPs); return the lowest-merit
    # iterate, not the last one.
    best = (z.copy(), zl.copy(), zu.copy(), ye.copy())
    best_merit = np.inf

    def solve_kkt(D, r1, r2):
        H = P + (A.T * D) @ A
        KKT = np.block([[H, E.T], [E, -1e-12 * np.eye(me)]])
        rhs = np.concatenate([r1, r2])
        sol = np.linalg.solve(KKT, rhs)
        # one round of f64 iterative refinement
        res = rhs - KKT @ sol
        sol += np.linalg.solve(KKT, res)
        return sol[:n], sol[n:]

    for _ in range(iters):
        f = A @ z
        r_d = P @ z + q + A.T @ (np.where(has_u, zu, 0.0)
                                 - np.where(has_l, zl, 0.0))
        if me:
            r_d += E.T @ ye
        r_eq = (E @ z - b_eq[is_eq]) if me else np.zeros(0)
        r_sl = np.where(has_l, f - l - s_l, 0.0)
        r_su = np.where(has_u, u - f - s_u, 0.0)
        mu = (np.sum(s_l * zl * has_l) + np.sum(s_u * zu * has_u)) / nb
        rp = np.max(np.abs(f - np.clip(f, l, u)))
        merit = max(np.max(np.abs(r_d)), rp, mu)
        if merit < best_merit:
            best_merit = merit
            best = (z.copy(), zl.copy(), zu.copy(), ye.copy())
        if merit < tol:
            break

        d_l = np.where(has_l, zl / np.maximum(s_l, 1e-300), 0.0)
        d_u = np.where(has_u, zu / np.maximum(s_u, 1e-300), 0.0)
        D = d_l + d_u

        def newton(sig_mu, cx_l, cx_u):
            comp_l = np.where(has_l, s_l * zl - sig_mu + cx_l, 0.0)
            comp_u = np.where(has_u, s_u * zu - sig_mu + cx_u, 0.0)
            w = (np.where(has_l, comp_l / np.maximum(s_l, 1e-300), 0.0)
                 - np.where(has_u, comp_u / np.maximum(s_u, 1e-300), 0.0)
                 + d_l * r_sl - d_u * r_su)
            dz, dy = solve_kkt(D, -(r_d + A.T @ w), -r_eq)
            df = A @ dz
            dsl = np.where(has_l, df + r_sl, 0.0)
            dsu = np.where(has_u, -df + r_su, 0.0)
            dzl = np.where(has_l, -(comp_l + zl * dsl) / np.maximum(s_l, 1e-300), 0.0)
            dzu = np.where(has_u, -(comp_u + zu * dsu) / np.maximum(s_u, 1e-300), 0.0)
            return dz, dy, dsl, dsu, dzl, dzu

        def max_step(v, dv, mask):
            neg = mask & (dv < 0)
            if not np.any(neg):
                return 1.0
            return min(1.0, 0.995 * np.min(-v[neg] / dv[neg]))

        dz, dy, dsl, dsu, dzl, dzu = newton(0.0, 0.0, 0.0)
        a = min(max_step(s_l, dsl, has_l), max_step(s_u, dsu, has_u),
                max_step(zl, dzl, has_l), max_step(zu, dzu, has_u))
        mu_aff = (np.sum((s_l + a * dsl) * (zl + a * dzl) * has_l)
                  + np.sum((s_u + a * dsu) * (zu + a * dzu) * has_u)) / nb
        sigma = np.clip((mu_aff / max(mu, 1e-300)) ** 3, 0.0, 1.0)
        dz, dy, dsl, dsu, dzl, dzu = newton(sigma * mu, dsl * dzl, dsu * dzu)
        a = min(max_step(s_l, dsl, has_l), max_step(s_u, dsu, has_u),
                max_step(zl, dzl, has_l), max_step(zu, dzu, has_u))
        z += a * dz
        ye = ye + a * dy if me else ye
        s_l = np.where(has_l, s_l + a * dsl, s_l)
        s_u = np.where(has_u, s_u + a * dsu, s_u)
        zl = np.where(has_l, zl + a * dzl, zl)
        zu = np.where(has_u, zu + a * dzu, zu)

    z, zl, zu, ye = best
    y = np.where(has_u, zu, 0.0) - np.where(has_l, zl, 0.0)
    if me:
        y[is_eq] = ye
    if verify:
        rp, rd, rc = kkt_residuals(qp, z, y)
        scale = max(1.0, np.max(np.abs(qp.q)))
        if max(rp, rd / scale, rc) > 1e-7:
            raise RuntimeError(
                f"oracle did not certify: rp={rp:.2e} rd={rd:.2e} rc={rc:.2e}")
    return z, y
