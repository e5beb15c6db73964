"""Racing MPC: batched real-time-iteration tracking MPC and safe-set LMPC.

Parity target: ``racing_mpc/src/racing_mpc.cpp`` — the production solver of
the reference.  The reference assembles a parametric CasADi ``Opti`` problem
once (variables X, U, dU with fixed diagonal scaling, racing_mpc.cpp:36-55)
and per step either hands the linearized problem to OSQP
(``full_dynamics=false``, :85-103,168-187) or the exact nonlinear problem to
IPOPT (:67-84).  TPU-native redesign — **condensed** RTI:

- per-stage linearizations (``vmap`` of the model's discrete Jacobian over
  the horizon) are *condensed once per solve*: states are eliminated through
  the affine dynamics  x_{i+1} = A_i x_i + B_i u_i + g_i  (an unrolled chain
  of (nx, nx) matmuls), control rates through  du_i = (u_i - u_{i-1}) / t_i,
  and the convex-hull slack through its defining equality.  What remains is
  a small dense QP over  w = [u, sigma_boundary, lambda]  (~87 vars for the
  BARC N=20 LMPC) in which EVERY variable carries real curvature (R, R_d,
  q_boundary, hull weights, barriers) — unlike the sparse KKT, whose "free"
  state/stage pivots force pivoted factorizations that are 500x slower than
  Cholesky on TPU (pivoted-LU custom calls, profiled at 31 of 56 ms/IPM
  iteration).  The single remaining equality (sum lambda = 1, plus the hull
  rows when the hull is hard) is handled by a tiny Schur complement.
- the QP is solved by the batched fixed-iteration Mehrotra IPM (``mpc.ipm``,
  Cholesky + Schur, pivot-free) or the OSQP-style ADMM (``mpc.qp``); a whole
  scenario batch solves as one ``vmap``-ed call on the MXU;
- the IPOPT bootstrap becomes an SQP loop (``solve_sqp``): re-linearize at
  the iterate and re-solve the same QP — same kernel, more iterations;
- safe-set bookkeeping (recorder / query) lives in ``safeset`` and the
  control loop; the solver takes the padded (K, nx) safe-set batch as a
  plain input, mirroring the fixed-K padding of racing_mpc.cpp:263-277.

Constraint/cost structure replicated from the reference (all rows now over
the condensed variables):
  - soft track boundary with shared scalar slack (build_boundary_constraint,
    racing_mpc.cpp:524-543), margin includes half vehicle width;
  - per-stage model control/rate bounds (model.control_bounds — the QP-path
    subset of add_nlp_constraints);
  - primal state/control boxes (:147-148) — state boxes become dense rows
    through the state-sensitivity matrix;
  - time-varying affine dynamics (:168-187) — exactly eliminated;
  - control-rate coupling u_{i-1} + du_i t_i = u_i with u_{-1} = u_ic
    (:189-197) — exactly eliminated;
  - initial-state equality (:199-201) — absorbed into the condensing
    offset f_0 = x_ic;
  - tracking cost on (contour, heading, vel, vy, vyaw) + u'Ru + du'R_d du,
    terminal x10 (build_tracking_cost, :442-477);
  - LMPC: convex-combination lambda over the safe set, terminal convex-hull
    constraint with quadratic slack (slack eliminated into the cost),
    cost ss_costs . lambda (build_lmpc_cost, :479-522).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import RacingMPCConfig
from racing_lmpc_tpu.models.base import BaseXIndex, VehicleModel
from racing_lmpc_tpu.mpc.qp import QPData, QPSolution, solve_qp
from racing_lmpc_tpu.mpc.ipm import solve_qp_ip
from racing_lmpc_tpu.ops.math import align_abscissa
from racing_lmpc_tpu.ops.pallas_linalg import solve_small

# fixed diagonal variable scaling (racing_mpc.cpp:36-37); states are
# eliminated by the condensing, so only the control scaling is applied to
# decision variables — scale_x is kept for warm-start compatibility.
_SCALE_X6 = np.array([2000.0, 10.0, 0.1, 80.0, 2.0, 2.0])
_SCALE_U2 = np.array([10.0, 0.3])
_SCALE_U3 = np.array([10.0, 10.0, 0.3])


class MPCInput(NamedTuple):
    """Per-solve parameters (the reference's opti parameters, racing_mpc.cpp:46-55)."""
    x_ic: Array          # (nx,)
    u_ic: Array          # (nu,)
    X_ref: Array         # (N, nx)
    U_ref: Array         # (N-1, nu)
    T_ref: Array         # (N-1,)
    bound_left: Array    # (N,)
    bound_right: Array   # (N,)
    total_length: Array  # ()
    curvatures: Array    # (N,)
    vel_ref: Array       # (N,)
    ss_x: Array          # (K, nx)  padded safe-set states (zeros if unused)
    ss_j: Array          # (K,)     padded relative cost-to-go
    # optional error-dynamics corrections from the safe-set regression
    # (paper's headline feature; SafeSetManager.query_regression): additive
    # (dA, dB, dC) on the stage linearization, locally constant over the
    # horizon (one RegQuery per control step, safe_set.hpp:57-76)
    dA: Array | None = None    # (nx, nx)
    dB: Array | None = None    # (nx, nu)
    dC: Array | None = None    # (nx,)


class MPCOutput(NamedTuple):
    X_optm: Array        # (N, nx)
    U_optm: Array        # (N-1, nu)
    dU_optm: Array       # (N-1, nu)
    convex_combi: Array  # (K,)
    boundary_slack: Array
    r_prim: Array
    r_dual: Array
    obj: Array
    solved: Array        # bool: residuals under tolerance


@dataclass
class _Layout:
    """Static index layout of the condensed decision vector / rows.

    Variables:  w = [ubar ((N-1) nu, scaled), sb (1 if soft boundary),
    lambda (K if learning)].  States and control rates are affine in w.
    """
    nx: int
    nu: int
    N: int
    K: int
    has_bslack: bool
    has_hull_slack: bool      # hull slack eliminated into the cost
    learning: bool
    n_nl: int = 0             # nonlinear model-constraint rows per stage
    has_xslack: bool = False  # elastic state boxes (q_state_slack > 0)
    n: int = 0
    m: int = 0

    def __post_init__(self):
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        self.nuu = (N - 1) * nu          # stacked scaled controls
        self.u0_off = 0
        off = self.nuu
        self.sb_off = off
        off += 1 if self.has_bslack else 0
        self.sxb_off = off
        off += 1 if self.has_xslack else 0
        self.lam_off = off
        off += K if self.learning else 0
        self.n = off

        # constraint rows.  The reference adds separate model control-bound
        # and config u-box rows over the SAME variables (racing_mpc.cpp:148 +
        # add_nlp_constraints); as exact duplicates they make every active-set
        # KKT singular (and double the barrier rows), so they are merged here
        # into one row block with elementwise-tightened bounds — an
        # optimum-preserving transformation.  x boxes cover stages 1..N-2:
        # the reference boxes stages 0..N-2 (racing_mpc.cpp:126,147) — stage 0
        # is pinned to x_ic by the initial-state equality and the TERMINAL
        # state is deliberately NOT boxed.
        r = 0
        self.r_bound_up = r; r += N
        self.r_bound_lo = r; r += N
        if self.has_bslack:
            self.r_sb = r; r += 1
        self.r_u_bnd = r; r += (N - 1) * nu      # model bounds ∩ u box
        self.r_du_bnd = r; r += (N - 1) * nu
        # state boxes on stages 1..N-2: one two-sided block when hard; two
        # one-sided blocks sharing the elastic slack column when soft
        self.r_x_box = r; r += (N - 2) * nx
        if self.has_xslack:
            self.r_x_box_lo = r; r += (N - 2) * nx
        if self.has_xslack:
            self.r_sxb = r; r += 1               # slack >= 0
        # nonlinear model constraints (power, drive/brake exclusivity,
        # friction ellipse, v >= 0 — model.nl_constraints), linearized at
        # the RTI reference each solve (racing_mpc.cpp:126-145 wires
        # add_nlp_constraints into every stage of BOTH solver paths)
        self.r_nl = r; r += (N - 1) * self.n_nl
        if self.learning:
            self.r_lam_pos = r; r += K
            self.r_lam_sum = r; r += 1
            if not self.has_hull_slack:
                self.r_hull = r; r += nx
        self.m = r

    def iu(self, i):
        return self.u0_off + i * self.nu


def _nl_linearize(model, X: Array, U: Array, Ks: Array):
    """(g, dg/dx, dg/du) of model.nl_constraints at every stage reference."""
    def one(x, u, k):
        g = model.nl_constraints(x, u, k)
        Gx = jax.jacfwd(lambda xx: model.nl_constraints(xx, u, k))(x)
        Gu = jax.jacfwd(lambda uu: model.nl_constraints(x, uu, k))(u)
        return g, Gx, Gu
    return jax.vmap(one)(X, U, Ks)


class RacingMPC:
    """Build-once / solve-many MPC, mirroring the reference's Opti lifecycle."""

    def __init__(self, config: RacingMPCConfig, model: VehicleModel):
        self.config = config
        self.model = model
        nx, nu, N = model.nx, model.nu, config.n
        self.nx, self.nu, self.N = nx, nu, N
        self.K = config.num_ss_pts if config.learning else 0

        hull_w = np.asarray(config.convex_hull_slack, dtype=np.float64)
        self.has_hull_slack = bool(config.learning and hull_w.size and hull_w.sum() > 0)
        self.has_bslack = bool(config.q_boundary > 0.0)
        self.has_xslack = bool(config.q_state_slack > 0.0)
        self.layout = _Layout(
            nx=nx, nu=nu, N=N, K=self.K,
            has_bslack=self.has_bslack,
            has_hull_slack=self.has_hull_slack,
            learning=bool(config.learning),
            n_nl=int(model.n_nl),
            has_xslack=self.has_xslack)

        # fixed diagonal scaling (racing_mpc.cpp:36-37); models whose state
        # order differs from the base layout provide their own permutation
        scale_override = model.state_scales()
        self.scale_x = (np.asarray(scale_override)
                        if scale_override is not None
                        else np.asarray(_SCALE_X6[:nx] if nx <= 6
                                        else np.ones(nx)))
        self.scale_u = np.asarray(_SCALE_U2 if nu == 2 else _SCALE_U3[:nu])
        self.hull_w = hull_w if self.has_hull_slack else np.zeros(nx)

        # stage cost index map: which MODEL-state component carries which
        # weight.  The reference evaluates the cost on `to_base_state(x)`
        # inside the NLP (racing_mpc.cpp:442-477); in the condensed QP the
        # cost is quadratic in the model state, so each model declares where
        # contour/heading/velocity live in ITS layout (double-track orders
        # (.., VYAW, SLIP, V), not (.., VX, VY, VYAW)).
        ci = model.cost_state_indices()
        self.idx_contour = ci["contour"]
        self.idx_heading = ci["heading"]
        self.idx_vel = ci["vel"]
        self.idx_vy = ci["vy"]
        self.idx_vyaw = ci["vyaw"]

        self.R = config.R(nu)
        self.R_d = config.R_d(nu)
        self.bounds = model.control_bounds()
        self.margin = config.margin + model.base_config.chassis.b / 2.0

        # remaining equality rows after condensing: the lambda simplex (and
        # the hull rows when the hull constraint is hard).  Tiny static set
        # -> tiny Schur complement in the Cholesky IPM.
        L = self.layout
        eq = []
        if config.learning:
            eq.append(np.array([L.r_lam_sum]))
            if not self.has_hull_slack:
                eq.append(np.arange(L.r_hull, L.r_hull + nx))
        self.eq_rows = jnp.asarray(
            np.concatenate(eq) if eq else np.zeros((0,), dtype=np.int64))

        # Static sparsity structure of A for the IPM's normal-equations
        # product (ipm.py): every barrier row before r_lam_pos touches only
        # the leading v/slack columns; the lambda-positivity rows are
        # one-hot; everything after is an equality row (barrier weight 0).
        # Cuts the (m, n) x (n, n) A'DA product to (m_dense, nc) x (nc, nc).
        nc_dense = (L.nuu + (1 if self.has_bslack else 0)
                    + (1 if self.has_xslack else 0))
        m_dense = L.r_lam_pos if config.learning else L.m
        if config.learning:
            diag_rows = np.arange(L.r_lam_pos, L.r_lam_pos + self.K)
            diag_cols = L.lam_off + np.arange(self.K)
        else:
            diag_rows = np.zeros((0,), dtype=np.int64)
            diag_cols = np.zeros((0,), dtype=np.int64)
        assert m_dense + len(diag_rows) + len(np.asarray(self.eq_rows)) == L.m
        self.qp_struct = (np.arange(m_dense), nc_dense,
                          diag_rows, diag_cols)

        # static tracking weight table (N, nx): 2*w entries; terminal x10
        Wv = np.zeros((N, nx))
        if not config.learning:
            for i in range(N):
                term = i == N - 1
                Wv[i, self.idx_contour] = config.q_contour * (10.0 if term else 1.0)
                Wv[i, self.idx_heading] = config.q_heading * (10.0 if term else 1.0)
                Wv[i, self.idx_vel] = config.q_vel * (10.0 if term else 1.0)
                if not term:
                    if self.idx_vy is not None:
                        Wv[i, self.idx_vy] = config.q_vy
                    if self.idx_vyaw is not None:
                        Wv[i, self.idx_vyaw] = config.q_vyaw
        self._Wv = Wv

        self._solve_jit = jax.jit(self._solve_impl)
        self._solve_batch_jit = jax.jit(jax.vmap(self._solve_impl))

    # ------------------------------------------------------------------
    def _condense(self, inp: MPCInput):
        """Feedback-pre-stabilized state/rate elimination.

        Plain condensing multiplies the stage Jacobians ``A_i`` down the
        horizon; for the single-track model below ~1.2 m/s the linearized
        yaw channel is per-step UNSTABLE (|eig| ~ 10 per 25 ms step), so the
        chain products reach ~1e9 and the condensed Hessian ~1e18 — far
        beyond f32 (and marginal even in f64).  The standard cure is to
        reparametrize the controls with a stabilizing time-varying feedback

            ubar_i = v_i - K_i (x_i - xref_i)

        (K_i from one backward LQR/Riccati scan over the same linearization)
        so every chain product uses the closed-loop ``A_i - B_i K_i``, whose
        spectral radius the Riccati gain pulls inside the unit circle.  The
        QP is solved for v; controls/states stay affine in v.

        Returns (F, f, MU, mu0):
        - unscaled states:         X_i    = F[i] @ v + f[i]     (nx, nvv)
        - stacked scaled controls: ubar   = MU @ v + mu0        (nvv, nvv)
        with v the stacked decision controls (same scaling as ubar).
        """
        L = self.layout
        nx, nu, N = self.nx, self.nu, self.N
        dtype = inp.x_ic.dtype
        su = jnp.asarray(self.scale_u, dtype=dtype)

        As, Bs, gs = jax.vmap(self.model.discrete_dynamics_jacobian)(
            inp.X_ref[:-1], inp.U_ref, inp.curvatures[:-1], inp.T_ref)
        if inp.dA is not None:
            # data-driven error-dynamics correction: the corrected model is
            # f'(x, u) = f(x, u) + dA x + dB u + dC, whose linearization at
            # the reference is (A + dA, B + dB, g + dC) — the affine
            # remainder g' = f'(ref) - A' xref - B' uref collapses to g + dC.
            As = As + inp.dA[None]
            Bs = Bs + inp.dB[None]
            gs = gs + inp.dC[None, :]
        Bs_s = Bs * su[None, None, :]            # absorb control scale

        # backward Riccati for the pre-stabilizing gains (scaled controls,
        # states weighted by the fixed diagonal scaling racing_mpc.cpp:36)
        sx = jnp.asarray(self.scale_x, dtype=dtype)
        Q_lqr = jnp.diag(1.0 / sx ** 2)
        I_nu = jnp.eye(nu, dtype=dtype)

        def riccati(Pn, AB):
            Ai, Bi = AB
            BtP = Bi.T @ Pn
            # closed-form nu x nu solve: linalg.solve's pivoted-LU custom
            # call costs ~2.8 ms per batch inside this scan (profiled)
            Ki = solve_small(I_nu + BtP @ Bi, BtP @ Ai)
            Acl = Ai - Bi @ Ki
            Pi = Q_lqr + Ai.T @ Pn @ Acl
            return 0.5 * (Pi + Pi.T), Ki

        _, Ks = jax.lax.scan(riccati, Q_lqr, (As, Bs_s), reverse=True)

        Fs = [jnp.zeros((nx, L.nuu), dtype=dtype)]
        fs = [inp.x_ic]
        MUs, mu0s = [], []
        for i in range(N - 1):
            # ubar_i = v_i - K_i (x_i - xref_i)
            MUi = (-Ks[i] @ Fs[i]).at[:, i * nu:(i + 1) * nu].add(I_nu)
            mu0i = -Ks[i] @ (fs[i] - inp.X_ref[i])
            MUs.append(MUi)
            mu0s.append(mu0i)
            Acl = As[i] - Bs_s[i] @ Ks[i]
            Fi = Acl @ Fs[i]
            Fi = Fi.at[:, i * nu:(i + 1) * nu].add(Bs_s[i])
            Fs.append(Fi)
            # x+ = A x + B ubar + g with ubar_i = (e_i - K_i F_i) v + mu0_i:
            # offset recursion is A f + B mu0 + g == Acl f + B K xref + g
            fs.append(As[i] @ fs[i] + Bs_s[i] @ mu0i + gs[i])
        F = jnp.stack(Fs)                        # (N, nx, nvv)
        f = jnp.stack(fs)                        # (N, nx)
        MU = jnp.concatenate(MUs, axis=0)        # (nvv, nvv) block rows
        mu0 = jnp.concatenate(mu0s, axis=0)      # (nvv,)
        return F, f, MU, mu0

    def _rate_map(self, inp: MPCInput, MU: Array, mu0: Array):
        """Scaled rate map through the feedback map: dubar = Gm @ v + gm
        with dubar_i = (ubar_i - ubar_{i-1}) / t_i, ubar_{-1} = u_ic / su."""
        nu = self.nu
        dtype = inp.x_ic.dtype
        su = jnp.asarray(self.scale_u, dtype=dtype)
        diag = jnp.repeat(1.0 / inp.T_ref, nu)               # (nvv,)
        Gd = jnp.diag(diag) - jnp.diag(diag[nu:], -nu)
        gd0 = jnp.zeros((self.layout.nuu,), dtype=dtype).at[:nu].set(
            -(inp.u_ic / su) * diag[:nu])
        return Gd @ MU, Gd @ mu0 + gd0

    # ------------------------------------------------------------------
    def _build_qp(self, inp: MPCInput):
        """Condensed QP assembly.  Returns (QPData, aux) with aux the
        affine maps needed to recover X/dU from the solution."""
        L = self.layout
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        dtype = inp.x_ic.dtype
        su = jnp.asarray(self.scale_u, dtype=dtype)
        cfg = self.config

        # wrap reference abscissae into the vehicle's current period
        # (racing_mpc.cpp:219-223)
        inp = inp._replace(X_ref=inp.X_ref.at[:, 0].set(align_abscissa(
            inp.X_ref[:, 0], jnp.full((N,), inp.x_ic[0], dtype=dtype),
            jnp.full((N,), inp.total_length, dtype=dtype))))

        F, f, MU, mu0 = self._condense(inp)
        Gm, gm = self._rate_map(inp, MU, mu0)
        nuu = L.nuu

        P = jnp.zeros((L.n, L.n), dtype=dtype)
        q = jnp.zeros((L.n,), dtype=dtype)
        A = jnp.zeros((L.m, L.n), dtype=dtype)
        lo = jnp.full((L.m,), -jnp.inf, dtype=dtype)
        up = jnp.full((L.m,), jnp.inf, dtype=dtype)
        ar = np.arange

        # ---- cost ------------------------------------------------------
        # control effort: sum_i ubar' (su R su) ubar with ubar = MU v + mu0
        # (P convention: 1/2 w'Pw)
        Ru = 2.0 * jnp.asarray(
            self.scale_u[:, None] * self.R * self.scale_u[None, :], dtype=dtype)
        Ru_blk = jax.scipy.linalg.block_diag(*([Ru] * (N - 1)))
        P = P.at[:nuu, :nuu].add(MU.T @ (Ru_blk @ MU))
        q = q.at[:nuu].add(MU.T @ (Ru_blk @ mu0))
        # rate effort through the rate map: dubar = Gm v + gm
        Rdu = 2.0 * jnp.asarray(
            self.scale_u[:, None] * self.R_d * self.scale_u[None, :], dtype=dtype)
        Rdu_blk = jax.scipy.linalg.block_diag(*([Rdu] * (N - 1)))
        P = P.at[:nuu, :nuu].add(Gm.T @ (Rdu_blk @ Gm))
        q = q.at[:nuu].add(Gm.T @ (Rdu_blk @ gm))

        if cfg.learning:
            # LMPC cost: ss_costs . lambda (build_lmpc_cost, :504)
            q = q.at[L.lam_off + ar(K)].add(inp.ss_j)
            # hull slack eliminated: cost sum_a hw_a (X_N,a - [SS lam]_a)^2
            if self.has_hull_slack:
                hw = jnp.asarray(self.hull_w, dtype=dtype)
                E = jnp.zeros((nx, L.n), dtype=dtype)
                E = E.at[:, :nuu].set(F[N - 1])
                E = E.at[:, L.lam_off:L.lam_off + K].set(-inp.ss_x.T)
                P = P + 2.0 * (E.T * hw[None, :]) @ E
                q = q + 2.0 * E.T @ (hw * f[N - 1])
        else:
            # tracking stage cost (build_tracking_cost, :442-477) over the
            # eliminated states: cost = sum w_ij (X_ij - ref_ij)^2
            Wv = jnp.asarray(self._Wv, dtype=dtype)          # (N, nx)
            Ref = jnp.zeros((N, nx), dtype=dtype).at[:, self.idx_vel].set(
                inp.vel_ref)
            Fm = F.reshape(N * nx, nuu)
            fv = f.reshape(N * nx)
            wv = Wv.reshape(N * nx)
            P = P.at[:nuu, :nuu].add(2.0 * (Fm.T * wv[None, :]) @ Fm)
            q = q.at[:nuu].add(2.0 * Fm.T @ (wv * (fv - Ref.reshape(-1))))

        if self.has_bslack:
            P = P.at[L.sb_off, L.sb_off].add(2.0 * cfg.q_boundary)
        if self.has_xslack:
            P = P.at[L.sxb_off, L.sxb_off].add(2.0 * cfg.q_state_slack)

        # ---- track boundary (build_boundary_constraint, :524-543) -------
        F_py = F[:, self.idx_contour, :]                     # (N, nuu)
        f_py = f[:, self.idx_contour]
        rows_up = L.r_bound_up + ar(N)
        rows_lo = L.r_bound_lo + ar(N)
        A = A.at[rows_up, :nuu].set(F_py)
        A = A.at[rows_lo, :nuu].set(F_py)
        if self.has_bslack:
            A = A.at[rows_up, L.sb_off].set(-1.0)   # PY - sb <= left - margin
            A = A.at[rows_lo, L.sb_off].set(1.0)    # PY + sb >= right + margin
            A = A.at[L.r_sb, L.sb_off].set(1.0)
            lo = lo.at[L.r_sb].set(0.0)
        up = up.at[rows_up].set(inp.bound_left - self.margin - f_py)
        lo = lo.at[rows_lo].set(inp.bound_right + self.margin - f_py)

        # ---- per-stage control & rate bounds (model QP constraints) -----
        # control rows: su * ubar = su * (MU v + mu0).  Bounds are the
        # elementwise intersection of the model's add_nlp_constraints bounds
        # and the config u box (racing_mpc.cpp:148) — identical rows merged
        # so the QP has no duplicate constraints (see _Layout).
        u_min = np.asarray(cfg.u_min if len(cfg.u_min) == nu else [-np.inf] * nu)
        u_max = np.asarray(cfg.u_max if len(cfg.u_max) == nu else [np.inf] * nu)
        u_lb_all = np.maximum(np.asarray(self.bounds.u_lb), u_min)
        u_ub_all = np.minimum(np.asarray(self.bounds.u_ub), u_max)
        ub_rows = L.r_u_bnd + ar(nuu)
        su_t = jnp.tile(su, N - 1)
        A = A.at[ub_rows[:, None], ar(nuu)[None, :]].set(su_t[:, None] * MU)
        lo = lo.at[ub_rows].set(
            jnp.tile(jnp.asarray(u_lb_all, dtype=dtype), N - 1)
            - su_t * mu0)
        up = up.at[ub_rows].set(
            jnp.tile(jnp.asarray(u_ub_all, dtype=dtype), N - 1)
            - su_t * mu0)
        # rate rows: su * dubar = su * (Gm v + gm)
        dub_rows = L.r_du_bnd + ar(nuu)
        A = A.at[dub_rows[:, None], ar(nuu)[None, :]].set(su_t[:, None] * Gm)
        lo = lo.at[dub_rows].set(
            jnp.tile(jnp.asarray(self.bounds.du_lb, dtype=dtype), N - 1)
            - su_t * gm)
        up = up.at[dub_rows].set(
            jnp.tile(jnp.asarray(self.bounds.du_ub, dtype=dtype), N - 1)
            - su_t * gm)

        # ---- primal state boxes (racing_mpc.cpp:147) ---------------------
        # stages 1..N-2 through the sensitivity rows (stage 0 is x_ic, the
        # terminal state is unboxed — reference boxes i = 0..N-2 only).
        # With q_state_slack > 0 the boxes are ELASTIC: two one-sided row
        # blocks share one nonnegative slack (the boundary-slack pattern,
        # racing_mpc.cpp:524-543), so a transiently unreachable box costs
        # q_state_slack * slack^2 instead of making the QP infeasible.
        nxb = (N - 2) * nx
        xb_rows = L.r_x_box + ar(nxb)
        Fx_rows = F[1:N - 1].reshape(nxb, nuu)
        A = A.at[L.r_x_box:L.r_x_box + nxb, :nuu].set(Fx_rows)
        x_min = np.asarray(cfg.x_min if len(cfg.x_min) == nx else [-np.inf] * nx)
        x_max = np.asarray(cfg.x_max if len(cfg.x_max) == nx else [np.inf] * nx)
        fx = f[1:N - 1].reshape(-1)
        xmin_t = jnp.tile(jnp.asarray(x_min, dtype=dtype), N - 2) - fx
        xmax_t = jnp.tile(jnp.asarray(x_max, dtype=dtype), N - 2) - fx
        if self.has_xslack:
            # upper block: F v - slack <= xmax - f
            A = A.at[xb_rows, L.sxb_off].set(-1.0)
            up = up.at[xb_rows].set(xmax_t)
            # lower block: F v + slack >= xmin - f
            xl_rows = L.r_x_box_lo + ar(nxb)
            A = A.at[L.r_x_box_lo:L.r_x_box_lo + nxb, :nuu].set(Fx_rows)
            A = A.at[xl_rows, L.sxb_off].set(1.0)
            lo = lo.at[xl_rows].set(xmin_t)
            A = A.at[L.r_sxb, L.sxb_off].set(1.0)
            lo = lo.at[L.r_sxb].set(0.0)
        else:
            lo = lo.at[xb_rows].set(xmin_t)
            up = up.at[xb_rows].set(xmax_t)

        # ---- nonlinear model constraints, linearized at the RTI reference
        # (power v*fd <= P_max, (fd*fb)^2 <= 1, friction ellipse, v >= 0 —
        # model.nl_constraints; racing_mpc.cpp:126-145 /
        # kinematic_bicycle_model.cpp:99-104 /
        # double_track_planar_model.cpp:106-126).  Rows over the condensed
        # variables:  g_i + Gx (x_i - xr_i) + Gu (u_i - ur_i) <= 0  with
        # x_i = F_i v + f_i and u_i = su * (MU v + mu0)_i.  solve_sqp
        # re-linearizes them at every iterate like the dynamics rows.
        n_nl = L.n_nl
        if n_nl:
            g0, Gx, Gu = _nl_linearize(
                self.model, inp.X_ref[:-1], inp.U_ref,
                inp.curvatures[:-1])                  # (N-1, n_nl[, ...])
            MU_blk = MU.reshape(N - 1, nu, L.nuu)
            mu0_blk = mu0.reshape(N - 1, nu)
            Gu_s = Gu * su[None, None, :]             # d/d(ubar)
            rows = (jnp.einsum('scx,sxv->scv', Gx, F[:-1])
                    + jnp.einsum('scu,suv->scv', Gu_s, MU_blk))
            rhs = (-g0
                   + jnp.einsum('scx,sx->sc', Gx, inp.X_ref[:-1] - f[:-1])
                   + jnp.einsum('scu,su->sc', Gu,
                                inp.U_ref - su[None, :] * mu0_blk))
            nl_rows = L.r_nl + ar((N - 1) * n_nl)
            rows2 = rows.reshape((N - 1) * n_nl, L.nuu)
            A = A.at[nl_rows[:, None], ar(L.nuu)[None, :]].set(rows2)
            # a vanishing linearization (e.g. drive/brake exclusivity at
            # fd = fb = 0 has zero gradient) leaves an (all-)zero row whose
            # equilibration blows up and wrecks the whole solve; such rows
            # are locally vacuous (g0 < 0 at the reference) -> deactivate
            rn = jnp.max(jnp.abs(rows2), axis=1)
            up = up.at[nl_rows].set(
                jnp.where(rn > 1e-6, rhs.reshape(-1), jnp.inf))

        # ---- LMPC lambda simplex + (hard) hull (build_lmpc_cost) --------
        if cfg.learning:
            lam_cols = L.lam_off + ar(K)
            lp_rows = L.r_lam_pos + ar(K)
            A = A.at[lp_rows, lam_cols].set(1.0)
            lo = lo.at[lp_rows].set(0.0)
            A = A.at[L.r_lam_sum, lam_cols].set(1.0)
            lo = lo.at[L.r_lam_sum].set(1.0)
            up = up.at[L.r_lam_sum].set(1.0)
            if not self.has_hull_slack:
                hull_rows = L.r_hull + ar(nx)
                A = A.at[L.r_hull:L.r_hull + nx, :nuu].set(F[N - 1])
                A = A.at[hull_rows[:, None], lam_cols[None, :]].set(-inp.ss_x.T)
                lo = lo.at[hull_rows].set(-f[N - 1])
                up = up.at[hull_rows].set(-f[N - 1])

        return QPData(P=P, q=q, A=A, l=lo, u=up), (F, f, MU, mu0, Gm, gm)

    # ------------------------------------------------------------------
    def _solve_impl(self, inp: MPCInput, z_warm: Array, warm_valid: Array
                    ) -> tuple[MPCOutput, Array]:
        # Full-f32 matmul accumulation throughout: TPU's default bf16-class
        # matmul truncation corrupts the condensed chain products/Hessian
        # enough to leave ~30% of scenario QPs unconverged (verified: the
        # same instances solve to 5e-4 in f32 on CPU).
        with jax.default_matmul_precision("highest"):
            return self._solve_impl_inner(inp, z_warm, warm_valid)

    def _solve_impl_inner(self, inp: MPCInput, z_warm: Array, warm_valid: Array
                          ) -> tuple[MPCOutput, Array]:
        data, aux = self._build_qp(inp)
        cfg = self.config
        if cfg.qp_method == "ipm":
            # interior point restarts from the central path; the warm start
            # is not used (its value is in the shifted X_ref linearization).
            sol = solve_qp_ip(data, iters=cfg.qp_ip_iters, eq_rows=self.eq_rows,
                              struct=self.qp_struct,
                              zoom_rounds=cfg.qp_zoom_rounds,
                              zoom_iters=cfg.qp_zoom_iters or None)
        else:
            # warm_start_vector packs scaled controls ubar; the decision
            # variable under feedback-pre-stabilized condensing is v with
            # ubar = MU v + mu0, so map the pack through MU^-1 (MU is
            # block-unit-lower-triangular: ubar_i = v_i - K_i x_i(v_{<i})).
            # Without this the seed is wrong exactly where the gains are
            # large — the low-speed operating points pre-stabilization
            # exists for.
            from racing_lmpc_tpu.ops.pallas_linalg import tri_inv_lower
            _, _, MU, mu0, _, _ = aux
            L = self.layout
            v0 = tri_inv_lower(MU) @ (z_warm[:L.nuu] - mu0)
            x0 = jnp.where(warm_valid, z_warm.at[:L.nuu].set(v0),
                           jnp.zeros_like(z_warm))
            sol = solve_qp(
                data, iters=cfg.qp_iters, rho=cfg.qp_rho, sigma=cfg.qp_sigma,
                alpha=cfg.qp_alpha, do_polish=cfg.qp_polish, x0=x0)
        out = self._extract(sol, data, aux)
        # the returned warm-start vector carries SCALED CONTROLS (ubar =
        # U/su) in the leading block — the same space warm_start_vector
        # packs — so feeding it back to solve() is consistent regardless of
        # the per-solve pre-stabilization gains baked into v
        su = jnp.asarray(self.scale_u, dtype=sol.x.dtype)
        z_ret = sol.x.at[:self.layout.nuu].set((out.U_optm / su).ravel())
        return out, z_ret

    def _extract(self, sol: QPSolution, data: QPData, aux) -> MPCOutput:
        L = self.layout
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        dtype = sol.x.dtype
        su = jnp.asarray(self.scale_u, dtype=dtype)
        F, f, MU, mu0, Gm, gm = aux
        v = sol.x[:L.nuu]
        X = f + jnp.einsum('nij,j->ni', F, v)
        U = (MU @ v + mu0).reshape(N - 1, nu) * su
        dU = (Gm @ v + gm).reshape(N - 1, nu) * su
        lam = (sol.x[L.lam_off:L.lam_off + K] if self.config.learning
               else jnp.zeros((0,), dtype=dtype))
        sb = sol.x[L.sb_off] if self.has_bslack else jnp.asarray(0.0, dtype=dtype)
        # OSQP-style scaled relative termination test (see scaled_residuals)
        tol = self.config.tol
        solved = (sol.rp_rel < tol) & (sol.rd_rel < tol)
        return MPCOutput(
            X_optm=X, U_optm=U, dU_optm=dU, convex_combi=lam,
            boundary_slack=sb, r_prim=sol.r_prim, r_dual=sol.r_dual,
            obj=sol.obj, solved=solved)

    # ------------------------------------------------------------------
    def validate_struct(self, inp: MPCInput) -> None:
        """Debug check: the built A matches the sparsity ``qp_struct``
        promises to the IPM (ipm.py exploits it WITHOUT validating the
        matrix content — only index contiguity is checked there, so a
        layout change that breaks the pattern would silently corrupt the
        structured matvecs).  Called from tests; cheap enough to call from
        any new layout's integration test."""
        data, _ = self._build_qp(inp)
        A = np.asarray(data.A)
        dr, nc, dgr, dgc = self.qp_struct
        md = len(np.asarray(dr))
        if not np.allclose(A[:md, nc:], 0.0):
            raise AssertionError("qp_struct violated: dense rows touch "
                                 f"columns >= nc={nc}")
        dgr, dgc = np.asarray(dgr), np.asarray(dgc)
        if len(dgr):
            lam_rows = A[dgr].copy()
            lam_rows[np.arange(len(dgr)), dgc] = 0.0
            if not np.allclose(lam_rows, 0.0):
                raise AssertionError("qp_struct violated: lambda rows are "
                                     "not one-hot")

    def solve(self, inp: MPCInput, z_warm: Array | None = None) -> tuple[MPCOutput, Array]:
        """One RTI solve.  Returns (output, warm-start vector for the next
        call — scaled controls ubar in the leading block, matching
        warm_start_vector's packing)."""
        if z_warm is None:
            z_warm = jnp.zeros((self.layout.n,), dtype=inp.x_ic.dtype)
            valid = jnp.asarray(False)
        else:
            valid = jnp.asarray(True)
        return self._solve_jit(inp, z_warm, valid)

    def solve_batch(self, inp: MPCInput, z_warm: Array, warm_valid: Array):
        """vmapped solve over a leading batch dimension on every input."""
        return self._solve_batch_jit(inp, z_warm, warm_valid)

    def solve_sqp(self, inp: MPCInput, iters: int = 5) -> tuple[MPCOutput, Array]:
        """SQP loop replacing the reference's IPOPT full-dynamics bootstrap
        (racing_mpc_node.cpp:210-235): re-linearize at the current iterate and
        re-solve.  At a fixed point the linearized dynamics rows hold exactly,
        i.e. the nonlinear dynamics constraint is satisfied.

        The relinearization point is the *nonlinear rollout* of the optimized
        controls from x_ic (not the raw QP state trajectory): the rollout is
        dynamically consistent by construction, which damps the oscillation a
        naive state-iterate SQP exhibits on the stiff yaw channel.
        """
        def rollout(U):
            def body(x, uk):
                u, k, t = uk
                xn = self.model.discrete_dynamics(x, u, k, t)
                return xn, xn
            _, Xs = jax.lax.scan(
                body, inp.x_ic, (U, inp.curvatures[:-1], inp.T_ref))
            return jnp.concatenate([inp.x_ic[None], Xs], axis=0)

        out, z = self.solve(inp)
        U = out.U_optm
        for _ in range(iters - 1):
            X_roll = rollout(U)
            inp = inp._replace(X_ref=X_roll, U_ref=U)
            out, z = self._solve_jit(inp, z, jnp.asarray(True))
            # damped control update: full steps chatter on the stiff yaw
            # channel when steering saturates; alpha=0.5 converges geometrically
            U = U + 0.5 * (out.U_optm - U)
        # report the damped iterate with its (dynamics-consistent) rollout
        out = out._replace(U_optm=U, X_optm=rollout(U))
        return out, z

    # ------------------------------------------------------------------
    def warm_start_vector(self, X: Array, U: Array, dU: Array,
                          lam: Array | None = None) -> Array:
        """Pack (unscaled) trajectories into the condensed decision vector
        for warm starting (the reference's X/U/dU_optm_ref path,
        racing_mpc.cpp:293-311).  X and dU are implied by U in the condensed
        form and are accepted for API compatibility."""
        L = self.layout
        dtype = U.dtype
        su = jnp.asarray(self.scale_u, dtype=dtype)
        z = jnp.zeros((L.n,), dtype=dtype)
        z = z.at[:L.nuu].set((U / su).ravel())
        if lam is not None and self.config.learning and lam.shape[0] == self.K:
            z = z.at[L.lam_off:L.lam_off + self.K].set(lam)
        elif self.config.learning:
            z = z.at[L.lam_off:L.lam_off + self.K].set(1.0 / self.K)
        return z

    def create_warm_start(self, P0: Array, Yaws: Array, Radii: Array,
                          current_vel: float, target_vel: float):
        """Physics-based initial reference (racing_mpc.cpp:374-430):
        linspace speeds, F = m a forces, pure-pursuit steering.

        Returns (X_ref, U_ref, T_ref) in the model's full-control layout.
        """
        N = self.N
        nx, nu = self.nx, self.nu
        # fail loudly at the call site instead of seeding the QP with
        # inf/NaN (the reference throws range_error, racing_mpc.cpp:391-396)
        if not current_vel > 0.0:
            raise ValueError(f"current_vel must be positive, got {current_vel}")
        if not target_vel > 0.0:
            raise ValueError(f"target_vel must be positive, got {target_vel}")
        m_total = self.model.base_config.chassis.total_mass
        wheel_base = self.model.base_config.chassis.wheel_base
        X_ref = np.zeros((N, nx))
        X_ref[:, 0:2] = np.asarray(P0)
        X_ref[:, 2] = np.asarray(Yaws)
        vels = np.linspace(current_vel, target_vel, N)
        X_ref[:, self.idx_vel] = vels
        if self.idx_vyaw is not None:
            X_ref[:, self.idx_vyaw] = vels / np.asarray(Radii)
        U_ref = np.zeros((N - 1, nu))
        T_ref = np.zeros(N - 1)
        for i in range(N - 1):
            d = float(np.hypot(*(np.asarray(P0)[i] - np.asarray(P0)[i + 1])))
            if not d > 0.0:
                raise ValueError(f"coincident warm-start waypoints at {i}")
            a = (vels[i + 1] ** 2 - vels[i] ** 2) / (2 * d)
            fo = m_total * a
            steer = float(np.arctan(wheel_base / np.asarray(Radii)[i]))
            if nu == 2:
                U_ref[i] = [fo / 1000.0, steer]
            else:
                U_ref[i] = [max(fo, 0.0), min(fo, 0.0), steer]
            T_ref[i] = d / vels[i]
        return (jnp.asarray(X_ref), jnp.asarray(U_ref), jnp.asarray(T_ref))
