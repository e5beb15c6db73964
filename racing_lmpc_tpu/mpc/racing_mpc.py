"""Racing MPC: batched real-time-iteration tracking MPC and safe-set LMPC.

Parity target: ``racing_mpc/src/racing_mpc.cpp`` — the production solver of
the reference.  The reference assembles a parametric CasADi ``Opti`` problem
once (variables X, U, dU with fixed diagonal scaling, racing_mpc.cpp:36-55)
and per step either hands the linearized problem to OSQP
(``full_dynamics=false``, :85-103,168-187) or the exact nonlinear problem to
IPOPT (:67-84).  TPU-native redesign:

- the QP is assembled **inside jit** from per-stage linearizations
  (``vmap`` of the model's discrete Jacobian over the horizon) into dense
  (P, q, A, l, u) with statically precomputed scatter indices;
- the QP is solved by the batched ADMM+polish solver (``mpc.qp``), so a
  whole scenario batch solves as one ``vmap``-ed call on the MXU;
- the IPOPT bootstrap becomes an SQP loop (``solve_sqp``): re-linearize at
  the iterate and re-solve the same QP — same kernel, more iterations;
- safe-set bookkeeping (recorder / query) lives in ``safeset`` and the
  control loop; the solver takes the padded (K, nx) safe-set batch as a
  plain input, mirroring the fixed-K padding of racing_mpc.cpp:263-277.

Constraint/cost structure replicated from the reference:
  - soft track boundary with shared scalar slack (build_boundary_constraint,
    racing_mpc.cpp:524-543), margin includes half vehicle width;
  - per-stage model control/rate bounds (model.control_bounds — the QP-path
    subset of add_nlp_constraints);
  - primal state/control boxes (:147-148);
  - time-varying affine dynamics rows x+ = A x + B u + g (:168-187);
  - control-rate coupling u_{i-1} + du_i t_i = u_i with u_{-1} = u_ic
    (:189-197);
  - initial-state equality (:199-201);
  - tracking cost on (contour, heading, vel, vy, vyaw) + u'Ru + du'R_d du,
    terminal x10 (build_tracking_cost, :442-477);
  - LMPC: convex-combination lambda over the safe set, terminal convex-hull
    constraint with quadratic slack, cost ss_costs . lambda
    (build_lmpc_cost, :479-522).
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

# fixed diagonal variable scaling (racing_mpc.cpp:36-37)
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
    """Static index layout of the stacked decision vector / constraint rows."""
    nx: int
    nu: int
    N: int
    K: int
    has_bslack: bool
    has_hull_slack: bool
    learning: bool
    n: int = 0
    m: int = 0

    def __post_init__(self):
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        self.x0_off = 0
        self.u0_off = N * nx
        self.du0_off = self.u0_off + (N - 1) * nu
        off = self.du0_off + (N - 1) * nu
        self.sb_off = off
        off += 1 if self.has_bslack else 0
        self.lam_off = off
        off += K if self.learning else 0
        self.hull_off = off
        off += nx if self.has_hull_slack else 0
        self.n = off

        # constraint rows
        r = 0
        self.r_bound_up = r; r += N
        self.r_bound_lo = r; r += N
        if self.has_bslack:
            self.r_sb = r; r += 1
        self.r_u_bnd = r; r += (N - 1) * nu
        self.r_du_bnd = r; r += (N - 1) * nu
        self.r_x_box = r; r += (N - 1) * nx
        self.r_u_box = r; r += (N - 1) * nu
        self.r_dyn = r; r += (N - 1) * nx
        self.r_rate = r; r += (N - 1) * nu
        self.r_ic = r; r += nx
        if self.learning:
            self.r_lam_pos = r; r += K
            self.r_lam_sum = r; r += 1
            self.r_hull = r; r += nx
        self.m = r

    def ix(self, i):
        return self.x0_off + i * self.nx

    def iu(self, i):
        return self.u0_off + i * self.nu

    def idu(self, i):
        return self.du0_off + i * self.nu


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
        self.layout = _Layout(
            nx=nx, nu=nu, N=N, K=self.K,
            has_bslack=self.has_bslack,
            has_hull_slack=self.has_hull_slack,
            learning=bool(config.learning))

        self.scale_x = np.asarray(_SCALE_X6[:nx] if nx <= 6 else np.ones(nx))
        self.scale_u = np.asarray(_SCALE_U2 if nu == 2 else _SCALE_U3[:nu])
        self.hull_w = hull_w if self.has_hull_slack else np.zeros(nx)

        # stage cost index map: which state component carries which weight.
        # For the shipped models the base-state conversion is identity on
        # these components (single_track: exactly identity).
        self.idx_contour = int(BaseXIndex.PY) if nx >= 2 else 1
        self.idx_heading = int(BaseXIndex.YAW)
        self.idx_vel = int(BaseXIndex.VX) if nx == 6 else nx - 1
        self.idx_vy = int(BaseXIndex.VY) if nx == 6 else None
        self.idx_vyaw = int(BaseXIndex.VYAW) if nx == 6 else None

        self.R = config.R(nu)
        self.R_d = config.R_d(nu)
        self.bounds = model.control_bounds()
        self.margin = config.margin + model.base_config.chassis.b / 2.0

        # static equality-row indices (dynamics, rate coupling, initial
        # condition, lambda simplex + hull) — lets the IPM use the condensed
        # Cholesky/Schur KKT path instead of a pivoted LU of the full KKT.
        L = self.layout
        eq = [np.arange(L.r_dyn, L.r_dyn + (N - 1) * nx),
              np.arange(L.r_rate, L.r_rate + (N - 1) * nu),
              np.arange(L.r_ic, L.r_ic + nx)]
        if config.learning:
            eq.append(np.array([L.r_lam_sum]))
            eq.append(np.arange(L.r_hull, L.r_hull + nx))
        self.eq_rows = jnp.asarray(np.concatenate(eq))
        self.kkt_perm = jnp.asarray(self._build_kkt_perm())
        # pairwise (2x2-pivot) elimination is safe when consecutive order
        # entries form coupled-or-healthy pairs at even offsets — holds for
        # even nu, and for LMPC only when the hull slack pairs the hull rows
        self.kkt_pair_safe = (nu % 2 == 0) and (
            not config.learning or self.has_hull_slack)

        self._solve_jit = jax.jit(self._solve_impl)
        self._solve_batch_jit = jax.jit(jax.vmap(self._solve_impl))

    def _build_kkt_perm(self) -> np.ndarray:
        """Static ordering of the compact KKT [vars; equality duals] that
        interleaves each variable with its defining equality row.

        This is the stage-wise (Riccati-like) ordering: x_0 with the initial
        condition rows, each du_i with its rate-coupling row, each x_{i+1}
        with its dynamics row, hull slacks with the convex-hull rows.  Under
        the unpivoted block LDL^T it keeps every leading minor a truncated
        (well-posed) MPC KKT, which bounds element growth — the naive
        [all vars; all duals] order places delta-sized pivots first and
        destroys f32 accuracy.
        """
        L = self.layout
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        n = L.n
        dyn_d = lambda i, a: n + i * nx + a
        rate_d = lambda i, c: n + (N - 1) * nx + i * nu + c
        ic_d = lambda a: n + (N - 1) * nx + (N - 1) * nu + a
        lam_sum_d = n + (N - 1) * nx + (N - 1) * nu + nx
        hull_d = lambda a: lam_sum_d + 1 + a

        order: list[int] = []
        for a in range(nx):
            order += [L.ix(0) + a, ic_d(a)]
        for i in range(N - 1):
            order += [L.iu(i) + c for c in range(nu)]
            for c in range(nu):
                order += [L.idu(i) + c, rate_d(i, c)]
            for a in range(nx):
                order += [L.ix(i + 1) + a, dyn_d(i, a)]
        if self.config.learning:
            # hull rows paired with the hull slacks, then the simplex row
            # paired with lambda_0 (its strongest coupling), then the rest:
            # eliminating the hull duals first projects O(1) Schur terms
            # onto the lambda block, giving the curvature-free lambdas
            # stable pivots; every even-offset pair stays 2x2-invertible.
            if self.has_hull_slack:
                for a in range(nx):
                    order += [L.hull_off + a, hull_d(a)]
            else:
                order += [hull_d(a) for a in range(nx)]
            order += [L.lam_off, lam_sum_d]
            order += [L.lam_off + k for k in range(1, K)]
        if self.has_bslack:
            order.append(L.sb_off)
        return np.asarray(order, dtype=np.int32)

    # ------------------------------------------------------------------
    def _build_qp(self, inp: MPCInput) -> QPData:
        L = self.layout
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        dtype = inp.x_ic.dtype
        sx = jnp.asarray(self.scale_x, dtype=dtype)
        su = jnp.asarray(self.scale_u, dtype=dtype)
        cfg = self.config

        # wrap reference abscissae into the vehicle's current period
        # (racing_mpc.cpp:219-223)
        X_ref = inp.X_ref.at[:, 0].set(align_abscissa(
            inp.X_ref[:, 0], jnp.full((N,), inp.x_ic[0], dtype=dtype),
            jnp.full((N,), inp.total_length, dtype=dtype)))

        # per-stage linearization at the reference (racing_mpc.cpp:168-187)
        As, Bs, gs = jax.vmap(self.model.discrete_dynamics_jacobian)(
            X_ref[:-1], inp.U_ref, inp.curvatures[:-1], inp.T_ref)

        P = jnp.zeros((L.n, L.n), dtype=dtype)
        q = jnp.zeros((L.n,), dtype=dtype)
        A = jnp.zeros((L.m, L.n), dtype=dtype)
        lo = jnp.full((L.m,), -jnp.inf, dtype=dtype)
        up = jnp.full((L.m,), jnp.inf, dtype=dtype)

        ar = np.arange
        # ---- cost -----------------------------------------------------
        # control effort/rate: P blocks 2*S R S on each u / du column
        Ru = 2.0 * (self.scale_u[:, None] * self.R * self.scale_u[None, :])
        Rdu = 2.0 * (self.scale_u[:, None] * self.R_d * self.scale_u[None, :])
        u_rows = (L.u0_off + ar((N - 1) * nu)).reshape(N - 1, nu)
        du_rows = (L.du0_off + ar((N - 1) * nu)).reshape(N - 1, nu)
        P = P.at[u_rows[:, :, None], u_rows[:, None, :]].add(
            jnp.broadcast_to(jnp.asarray(Ru, dtype=dtype), (N - 1, nu, nu)))
        P = P.at[du_rows[:, :, None], du_rows[:, None, :]].add(
            jnp.broadcast_to(jnp.asarray(Rdu, dtype=dtype), (N - 1, nu, nu)))

        if cfg.learning:
            # LMPC cost: ss_costs . lambda (build_lmpc_cost, :504)
            lam_rows = L.lam_off + ar(K)
            q = q.at[lam_rows].add(inp.ss_j)
            if self.has_hull_slack:
                hull_rows = L.hull_off + ar(nx)
                P = P.at[hull_rows, hull_rows].add(
                    2.0 * jnp.asarray(self.hull_w, dtype=dtype))
        else:
            # tracking stage cost (build_tracking_cost, :442-477)
            def state_cost(i_rows, weights, refs):
                # sum_i w * (s*xbar - ref)^2 -> P += 2 w s^2, q += -2 w s ref
                return weights, refs
            for i in range(N):
                term = (i == N - 1)
                w_c = cfg.q_contour * (10.0 if term else 1.0)
                w_h = cfg.q_heading * (10.0 if term else 1.0)
                w_v = cfg.q_vel * (10.0 if term else 1.0)
                base = L.ix(i)
                for idx, w in ((self.idx_contour, w_c), (self.idx_heading, w_h)):
                    s = float(self.scale_x[idx])
                    P = P.at[base + idx, base + idx].add(2.0 * w * s * s)
                sv = float(self.scale_x[self.idx_vel])
                P = P.at[base + self.idx_vel, base + self.idx_vel].add(2.0 * w_v * sv * sv)
                q = q.at[base + self.idx_vel].add(-2.0 * w_v * sv * inp.vel_ref[i])
                if not term:
                    for idx, w in ((self.idx_vy, cfg.q_vy), (self.idx_vyaw, cfg.q_vyaw)):
                        if idx is not None and w > 0:
                            s = float(self.scale_x[idx])
                            P = P.at[base + idx, base + idx].add(2.0 * w * s * s)

        if self.has_bslack:
            P = P.at[L.sb_off, L.sb_off].add(2.0 * cfg.q_boundary)

        # ---- track boundary (build_boundary_constraint, :524-543) -----
        py_cols = L.x0_off + ar(N) * nx + self.idx_contour
        s_py = float(self.scale_x[self.idx_contour])
        rows_up = L.r_bound_up + ar(N)
        rows_lo = L.r_bound_lo + ar(N)
        A = A.at[rows_up, py_cols].set(s_py)
        A = A.at[rows_lo, py_cols].set(s_py)
        if self.has_bslack:
            A = A.at[rows_up, L.sb_off].set(-1.0)   # PY - sb <= left - margin
            A = A.at[rows_lo, L.sb_off].set(1.0)    # PY + sb >= right + margin
            A = A.at[L.r_sb, L.sb_off].set(1.0)
            lo = lo.at[L.r_sb].set(0.0)
        up = up.at[rows_up].set(inp.bound_left - self.margin)
        lo = lo.at[rows_lo].set(inp.bound_right + self.margin)

        # ---- per-stage control & rate bounds (model QP constraints) ----
        ub_rows = (L.r_u_bnd + ar((N - 1) * nu)).reshape(N - 1, nu)
        dub_rows = (L.r_du_bnd + ar((N - 1) * nu)).reshape(N - 1, nu)
        A = A.at[ub_rows, u_rows].set(jnp.broadcast_to(su, (N - 1, nu)))
        A = A.at[dub_rows, du_rows].set(jnp.broadcast_to(su, (N - 1, nu)))
        lo = lo.at[ub_rows.ravel()].set(
            jnp.tile(jnp.asarray(self.bounds.u_lb, dtype=dtype), N - 1))
        up = up.at[ub_rows.ravel()].set(
            jnp.tile(jnp.asarray(self.bounds.u_ub, dtype=dtype), N - 1))
        lo = lo.at[dub_rows.ravel()].set(
            jnp.tile(jnp.asarray(self.bounds.du_lb, dtype=dtype), N - 1))
        up = up.at[dub_rows.ravel()].set(
            jnp.tile(jnp.asarray(self.bounds.du_ub, dtype=dtype), N - 1))

        # ---- primal boxes (racing_mpc.cpp:147-148), stages 0..N-2 ------
        xb_rows = (L.r_x_box + ar((N - 1) * nx)).reshape(N - 1, nx)
        x_cols = (L.x0_off + ar((N - 1) * nx)).reshape(N - 1, nx)
        A = A.at[xb_rows, x_cols].set(jnp.broadcast_to(sx, (N - 1, nx)))
        x_min = np.asarray(cfg.x_min if len(cfg.x_min) == nx else [-np.inf] * nx)
        x_max = np.asarray(cfg.x_max if len(cfg.x_max) == nx else [np.inf] * nx)
        u_min = np.asarray(cfg.u_min if len(cfg.u_min) == nu else [-np.inf] * nu)
        u_max = np.asarray(cfg.u_max if len(cfg.u_max) == nu else [np.inf] * nu)
        lo = lo.at[xb_rows.ravel()].set(jnp.tile(jnp.asarray(x_min, dtype=dtype), N - 1))
        up = up.at[xb_rows.ravel()].set(jnp.tile(jnp.asarray(x_max, dtype=dtype), N - 1))
        ubox_rows = (L.r_u_box + ar((N - 1) * nu)).reshape(N - 1, nu)
        A = A.at[ubox_rows, u_rows].set(jnp.broadcast_to(su, (N - 1, nu)))
        lo = lo.at[ubox_rows.ravel()].set(jnp.tile(jnp.asarray(u_min, dtype=dtype), N - 1))
        up = up.at[ubox_rows.ravel()].set(jnp.tile(jnp.asarray(u_max, dtype=dtype), N - 1))

        # ---- linearized dynamics equality (racing_mpc.cpp:168-187) -----
        dyn_rows = (L.r_dyn + ar((N - 1) * nx)).reshape(N - 1, nx)
        xi_cols = x_cols                         # stage i state columns
        xip1_cols = x_cols + nx                  # stage i+1 state columns
        # x_{i+1} scale block: +diag(sx)
        A = A.at[dyn_rows, xip1_cols].set(jnp.broadcast_to(sx, (N - 1, nx)))
        # -A_i diag(sx) on x_i
        A = A.at[dyn_rows[:, :, None], xi_cols[:, None, :]].add(
            -(As * sx[None, None, :]))
        # -B_i diag(su) on u_i
        A = A.at[dyn_rows[:, :, None], u_rows[:, None, :]].add(
            -(Bs * su[None, None, :]))
        lo = lo.at[dyn_rows.ravel()].set(gs.ravel())
        up = up.at[dyn_rows.ravel()].set(gs.ravel())

        # ---- control-rate coupling (racing_mpc.cpp:189-197) ------------
        rate_rows = (L.r_rate + ar((N - 1) * nu)).reshape(N - 1, nu)
        A = A.at[rate_rows, u_rows].set(jnp.broadcast_to(su, (N - 1, nu)))
        # -u_{i-1}: stages 1..N-2
        A = A.at[rate_rows[1:], u_rows[:-1]].add(
            jnp.broadcast_to(-su, (N - 2, nu)))
        # -du_i * t_i
        A = A.at[rate_rows, du_rows].add(-(inp.T_ref[:, None] * su[None, :]))
        rhs_rate = jnp.zeros((N - 1, nu), dtype=dtype).at[0].set(inp.u_ic)
        lo = lo.at[rate_rows.ravel()].set(rhs_rate.ravel())
        up = up.at[rate_rows.ravel()].set(rhs_rate.ravel())

        # ---- initial state equality (racing_mpc.cpp:199-201) -----------
        ic_rows = L.r_ic + ar(nx)
        A = A.at[ic_rows, L.x0_off + ar(nx)].set(sx)
        lo = lo.at[ic_rows].set(inp.x_ic)
        up = up.at[ic_rows].set(inp.x_ic)

        # ---- LMPC terminal safe-set constraint (build_lmpc_cost) -------
        if cfg.learning:
            lam_cols = L.lam_off + ar(K)
            lp_rows = L.r_lam_pos + ar(K)
            A = A.at[lp_rows, lam_cols].set(1.0)
            lo = lo.at[lp_rows].set(0.0)
            A = A.at[L.r_lam_sum, lam_cols].set(1.0)
            lo = lo.at[L.r_lam_sum].set(1.0)
            up = up.at[L.r_lam_sum].set(1.0)
            hull_rows_c = L.r_hull + ar(nx)
            xN_cols = L.ix(N - 1) + ar(nx)
            A = A.at[hull_rows_c, xN_cols].set(sx)
            A = A.at[hull_rows_c[:, None], lam_cols[None, :]].set(-inp.ss_x.T)
            if self.has_hull_slack:
                A = A.at[hull_rows_c, L.hull_off + ar(nx)].set(-1.0)
            lo = lo.at[hull_rows_c].set(0.0)
            up = up.at[hull_rows_c].set(0.0)

        return QPData(P=P, q=q, A=A, l=lo, u=up)

    # ------------------------------------------------------------------
    def _solve_impl(self, inp: MPCInput, z_warm: Array, warm_valid: Array
                    ) -> tuple[MPCOutput, Array]:
        data = self._build_qp(inp)
        cfg = self.config
        if cfg.qp_method == "ipm":
            # interior point restarts from the central path; the warm start
            # is not used (its value is in the shifted X_ref linearization).
            sol = solve_qp_ip(data, iters=cfg.qp_ip_iters, eq_rows=self.eq_rows,
                              kkt_perm=self.kkt_perm,
                              pair_safe=self.kkt_pair_safe)
        else:
            x0 = jnp.where(warm_valid, z_warm, jnp.zeros_like(z_warm))
            sol = solve_qp(
                data, iters=cfg.qp_iters, rho=cfg.qp_rho, sigma=cfg.qp_sigma,
                alpha=cfg.qp_alpha, do_polish=cfg.qp_polish, x0=x0)
        out = self._extract(sol, data)
        return out, sol.x

    def _extract(self, sol: QPSolution, data: QPData) -> MPCOutput:
        L = self.layout
        nx, nu, N, K = self.nx, self.nu, self.N, self.K
        dtype = sol.x.dtype
        sx = jnp.asarray(self.scale_x, dtype=dtype)
        su = jnp.asarray(self.scale_u, dtype=dtype)
        X = sol.x[L.x0_off:L.x0_off + N * nx].reshape(N, nx) * sx
        U = sol.x[L.u0_off:L.u0_off + (N - 1) * nu].reshape(N - 1, nu) * su
        dU = sol.x[L.du0_off:L.du0_off + (N - 1) * nu].reshape(N - 1, nu) * su
        lam = (sol.x[L.lam_off:L.lam_off + K] if self.config.learning
               else jnp.zeros((0,), dtype=dtype))
        sb = sol.x[L.sb_off] if self.has_bslack else jnp.asarray(0.0, dtype=dtype)
        # OSQP-style relative termination test at the configured tolerance
        tol = self.config.tol
        Ax = data.A @ sol.x
        p_scale = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(sol.z))) + 1.0
        d_scale = jnp.maximum(
            jnp.max(jnp.abs(data.P @ sol.x)), jnp.max(jnp.abs(data.q))) + 1.0
        solved = (sol.r_prim < tol * p_scale) & (sol.r_dual < tol * d_scale)
        return MPCOutput(
            X_optm=X, U_optm=U, dU_optm=dU, convex_combi=lam,
            boundary_slack=sb, r_prim=sol.r_prim, r_dual=sol.r_dual,
            obj=sol.obj, solved=solved)

    # ------------------------------------------------------------------
    def solve(self, inp: MPCInput, z_warm: Array | None = None) -> tuple[MPCOutput, Array]:
        """One RTI solve.  Returns (output, raw scaled solution vector for
        warm-starting the next call)."""
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
        """Pack (unscaled) trajectories into the raw decision vector layout
        for warm starting (the reference's X/U/dU_optm_ref path,
        racing_mpc.cpp:293-311)."""
        L = self.layout
        dtype = X.dtype
        sx = jnp.asarray(self.scale_x, dtype=dtype)
        su = jnp.asarray(self.scale_u, dtype=dtype)
        z = jnp.zeros((L.n,), dtype=dtype)
        z = z.at[L.x0_off:L.x0_off + self.N * self.nx].set((X / sx).ravel())
        z = z.at[L.u0_off:L.u0_off + (self.N - 1) * self.nu].set((U / su).ravel())
        z = z.at[L.du0_off:L.du0_off + (self.N - 1) * self.nu].set((dU / su).ravel())
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
            a = (vels[i + 1] ** 2 - vels[i] ** 2) / (2 * d)
            f = m_total * a
            steer = float(np.arctan(wheel_base / np.asarray(Radii)[i]))
            if nu == 2:
                U_ref[i] = [f / 1000.0, steer]
            else:
                U_ref[i] = [max(f, 0.0), min(f, 0.0), steer]
            T_ref[i] = d / vels[i]
        return (jnp.asarray(X_ref), jnp.asarray(U_ref), jnp.asarray(T_ref))
