"""Batched primal-dual interior-point QP solver (Mehrotra predictor-corrector).

Solves the OSQP-form problem

    minimize    1/2 x' P x + q' x
    subject to  l <= A x <= u        (rows with l == u are equalities)

with a fixed iteration count and fully static shapes, making it jit/vmap
friendly: a scenario batch of MPC QPs becomes (B, n, n) Cholesky/LU
factorizations on the MXU.

Why IPM and not operator splitting: the reference's OSQP reaches its final
accuracy through a *polish* direct solve after first-order iterations; on
TPU the latency profile inverts — thousands of cheap sequential iterations
are latency-bound, while ~20 dense factorizations of a few-hundred-variable
KKT are fast and give 1e-6-level KKT residuals deterministically, which is
what the 1e-3 control match budget needs.

Mechanics:
- rows are split by value masks (equality / finite-lower / finite-upper),
  kept at full static shape; masked-out barrier terms contribute zero;
- each Newton step solves the regularized quasi-definite KKT
      [[P + sigma I + A_in' D A_in ,  A_eq'],
       [A_eq                       , -delta I]]
  via one LU factorization, used for both the affine and corrector steps,
  with one round of iterative refinement for float32 robustness;
- Mehrotra: affine step -> centering sigma = (mu_aff/mu)^3 -> corrector with
  second-order term; fractional-to-boundary step 0.99.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.mpc.qp import (
    QPData, QPSolution, ruiz_equilibrate, scaled_residuals)

_EPS = 1e-10
# Central-path floor: once mu (on the Ruiz-scaled problem) drops below this,
# the s.z products sit at the f32 noise floor and further Newton steps
# CORRUPT the converged iterate (observed: rd_rel 5e-7 at mu=1e-6, jumping
# to 5e-3 on the next step at mu=6e-8).  Below the floor the step is
# zeroed, which acts as early termination with the iterate frozen.
_MU_FLOOR = 1e-7
# Relative Hessian ridge applied to every incoming QP (see solve_qp_ip):
# lifts f32-rounding negative curvature of the condensed Gram-sum Hessians.
# The bias it adds along the QP's low-curvature valley (~1e-2-relative
# steering, measured) is removed afterwards by the zoomed refinement, whose
# own subproblems use the smaller _RIDGE_ZOOM_REL (bias there scales with
# the residual itself, so it contracts geometrically).
_RIDGE_REL = 1e-6
_RIDGE_ZOOM_REL = 0.0
# Fixed zoom schedule for the refinement ladder (see the trust-region notes
# in _solve_qp_ip_inner).  Measured against per-round f64 solves of the SAME
# residual subproblems (BARC tracking, deviated instance): the f32
# subproblem solve leaves O(0.1-1) junk ON THE MAGNIFIED SCALE at any zoom,
# so the unmagnified damage is junk/zoom — at zoom 1e6 a round is exact to
# ~1e-7 while the former adaptive schedule (zoom from the junk-inflated
# |xe|) parked at ~1e3 where rounds injected 1e-3-class wander.  The
# schedule climbs geometrically; rounds past the end stay at the cap.
_ZOOM_SCHED = (1.0, 3e3, 1e6)   # legacy fixed schedule (kept for reference)
# Carried-zoom escalation: a round whose accepted phi gain is still
# MACROSCOPIC (< -_GAIN_SMALL, scaled units) keeps the current zoom — the
# iterate is still making large-scale progress and a premature magnified
# round steers by junk (measured: a zoom-3e3 round accepted with dphi
# -8e-4 moved applied steering 1.5e-2 OFF the optimum while the iterate
# was still ~1e-3-suboptimal).  Once gains die the zoom multiplies by
# _ZOOM_STEP for the endgame rounds, where subproblem junk is divided
# down to harmlessness (junk/zoom ~ 1e-7 at the 1e6 cap).
_GAIN_SMALL = 1e-5
_ZOOM_STEP = 1e3
_ZOOM_MAX = 1e6
# Early-exit floor for the zoom ladder: an accepted round whose unmagnified
# correction max|xe|/zoom (Ruiz-scaled units) is below this retires the
# remaining rounds — the leftover refinement sits at the f32 noise floor.
# Sweep-validated in round 5: identical per-instance gate errors with and
# without the exit across the 11 acceptance instances (PARETO.json).
_EXIT_ATOL = 1e-6
# (A proximal-anchor variant of the subproblems — +eps/2||e||^2 — was
# built and MEASURED WORSE: eps large enough to pin the LMPC QPs' flat
# lambda faces also damps the low-curvature steering-tail corrections the
# descent rounds exist for; worst-case applied error grew from 1.9e-3 to
# 8.5e-3.  Removed.)
# Trust region on the magnified residual bounds: large enough to pass any
# real correction (|A e| <= ~C/zoom at the entry zoom), small enough to
# deny the solver the far-away region that produces the junk.
_C_TR = 1e3


def _struct_matvecs(A: Array, struct, eq_rows, n: int, m: int, dtype):
    """Structured (Amv, ATmv) closures for the MPC QP's row layout.

    The MPC QP's rows are three contiguous blocks (RacingMPC.qp_struct):
    dense rows touching only the leading nc columns, one-hot lambda rows,
    and the equality rows.  Exploiting that turns every (m, n) matvec on
    the iteration path into an (md, nc) matvec + an elementwise product —
    ~2.6x less HBM traffic per product, numerically identical (the
    dropped terms are exact zeros).  Falls back to dense A when the
    contiguity invariants don't hold (generic callers).
    """
    Amv = lambda x: A @ x                                    # noqa: E731
    ATmv = lambda w: A.T @ w                                 # noqa: E731
    if struct is not None and eq_rows is not None:
        _dr, _nc, _dgr, _dgc = (np.asarray(struct[0]), int(struct[1]),
                                np.asarray(struct[2]), np.asarray(struct[3]))
        _md, _Kd = len(_dr), len(_dgr)
        _er = np.asarray(eq_rows)
        _me = len(_er)
        _lam0 = int(_dgc[0]) if _Kd else 0
        _contig = (
            np.array_equal(_dr, np.arange(_md))
            and np.array_equal(_dgr, np.arange(_md, _md + _Kd))
            and np.array_equal(_er, np.arange(_md + _Kd, _md + _Kd + _me))
            and _md + _Kd + _me == m
            and (not _Kd or np.array_equal(_dgc, _lam0 + np.arange(_Kd))))
        if _contig:
            Ad_mv = A[:_md, :_nc]
            adiag_mv = A[_dgr, _dgc] if _Kd else None
            Ae_mv = A[_md + _Kd:]

            def Amv(x):                                      # noqa: F811
                parts = [Ad_mv @ x[:_nc]]
                if _Kd:
                    parts.append(adiag_mv * jax.lax.dynamic_slice(
                        x, (_lam0,), (_Kd,)))
                if _me:
                    parts.append(Ae_mv @ x)
                return jnp.concatenate(parts)

            def ATmv(w):                                     # noqa: F811
                out = jnp.zeros((n,), dtype=dtype).at[:_nc].set(
                    Ad_mv.T @ w[:_md])
                if _Kd:
                    out = out.at[_lam0:_lam0 + _Kd].add(
                        adiag_mv * w[_md:_md + _Kd])
                if _me:
                    out = out + Ae_mv.T @ w[_md + _Kd:]
                return out
    return Amv, ATmv


def _condensed_solver_factory(P: Array, A: Array, eq_rows, struct,
                              delta: float, reg_min):
    """Pivot-free Newton-KKT solver builder for the condensed MPC QP.

    With the equality rows known statically the Newton KKT
    ``[[H, Ae'], [Ae, -delta I]]`` is solved by Cholesky of H (SPD) + a
    Cholesky of the Schur complement ``S = Ae H^-1 Ae' + delta I`` (SPD).
    Both are PIVOT-FREE — XLA's batched Cholesky/trsm on TPU run as blocked
    matmul pipelines, whereas the pivoted-LU custom call this replaces cost
    31 ms/iter (profiled: 7 x 4.4 ms block inversions per LDL^T).

    Returns ``make_solver(D, delta_p)`` where D is the barrier/penalty row
    weight vector; the returned ``solve(r1, r2, refine=True)`` solves the
    KKT with one f32 iterative-refinement round.  Shared by the IPM core,
    its penalty polish, and the active-set refinement in ``solve_qp_ip``.
    """
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    I_n = jnp.eye(n, dtype=dtype)
    # f32 stability: the barrier weights D span ~[1e-8, 1e8]; clipping
    # them to D_CAP bounds cond(H) so the Cholesky cannot break down,
    # and one round of iterative refinement on the EXACT (unclipped)
    # KKT restores the Newton direction to the accuracy the 1e-3
    # control-match budget needs.
    D_CAP = 1e6
    Ae = A[eq_rows]                      # (m_eq, n), static shape
    me = Ae.shape[0]
    I_me = jnp.eye(me, dtype=dtype)

    from racing_lmpc_tpu.ops.pallas_linalg import chol_lower, tri_inv_lower

    if struct is not None:
        # static sparsity of A (see RacingMPC.qp_struct): dense rows hit
        # only the leading nc columns; diag rows are one-hot.  The
        # A'DA product shrinks from (n, m)x(m, n) to (nc, md)x(md, nc).
        dense_rows, nc, diag_rows, diag_cols = struct
        Ad = A[np.asarray(dense_rows)][:, :nc]          # (md, nc) static
        a_diag2 = jnp.square(A[np.asarray(diag_rows), np.asarray(diag_cols)])

    def form_AtDA(Dc):
        # NOTE: stays at the ambient HIGHEST matmul precision — dropping
        # this one product to HIGH (3-pass) was measured at +5% speed
        # but -2.5% solved fraction; the barrier weights make the
        # normal-equations product the precision-critical op.
        if struct is None:
            return (A.T * Dc) @ A
        Hd = (Ad.T * Dc[np.asarray(dense_rows)]) @ Ad
        dvec = jnp.zeros((n,), dtype=dtype)
        if len(np.asarray(diag_cols)):
            dvec = dvec.at[np.asarray(diag_cols)].add(
                Dc[np.asarray(diag_rows)] * a_diag2)
        H = jnp.diag(dvec)
        return H.at[:nc, :nc].add(Hd)

    def make_solver(D, delta_p=reg_min):
        Dc = jnp.minimum(D, D_CAP)
        H = P + delta_p * I_n + form_AtDA(Dc)
        # Jacobi pre-scaling: the barrier weights put a ~1e12 spread on
        # diag(H), far beyond f32 Cholesky breakdown (~1e7); normalizing
        # to unit diagonal moves the spread out of the factorization.
        # H = S^-1 Hs S^-1 with S = rsqrt(diag H), Hs unit-diagonal.
        s = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(H), 1e-30))
        Hs = H * s[:, None] * s[None, :]
        # in-house blocked Cholesky: XLA's `cholesky` custom call gets a
        # batch-minormost layout inside this program and runs ~60x slower
        # (2.44 ms/iter vs 0.04 ms at (256, 87, 87), profiled on v5e).
        L = chol_lower(Hs)
        # explicit blocked inverse of L: every subsequent KKT solve is a
        # matmul on the MXU; XLA's triangular_solve custom call blows the
        # scoped-VMEM limit at (batch 256, n 87+) and cannot be used here.
        Li = tri_inv_lower(L) * s[None, :]               # L^-1 S

        if me == 0:
            def solve(r1, r2, refine=True):
                x = Li.T @ (Li @ r1)
                if refine:
                    rx = r1 - H @ x
                    x = x + Li.T @ (Li @ rx)
                return x, jnp.zeros(m, dtype=dtype)
            return solve

        T = Li @ Ae.T                                    # (S L)^-1 Ae'
        S_sc = T.T @ T + delta * I_me
        Lsi = tri_inv_lower(chol_lower(S_sc))

        def kkt_solve(r1, r2c):
            z = Li @ r1
            y = Lsi.T @ (Lsi @ (T.T @ z - r2c))
            x = Li.T @ (z - T @ y)
            return x, y

        def solve(r1, r2, refine=True):
            r2c = r2[eq_rows]
            x, y = kkt_solve(r1, r2c)
            if refine:
                # one refinement round against the clipped KKT (f32)
                rx = r1 - (H @ x + Ae.T @ y)
                ry = r2c - (Ae @ x - delta * y)
                x2, y2 = kkt_solve(rx, ry)
                x, y = x + x2, y + y2
            dy = jnp.zeros(m, dtype=dtype).at[eq_rows].set(y)
            return x, dy
        return solve

    return make_solver


def _ipm_core(data: QPData, iters: int, delta: float,
              eq_rows: Array | None = None,
              trace: bool = False,
              struct=None,
              do_polish: bool = True):
    """IPM on (scaled) data.  Returns (x, y) with y the OSQP-convention dual
    (y = z_u - z_l, positive on active upper bounds).

    ``eq_rows``: optional STATIC index array of the equality rows (known at
    problem-build time for the MPC QPs).  When given, each Newton system is
    solved by condensed Cholesky + Schur complement on the compact equality
    block (see ``_condensed_solver_factory``) — two pivot-free batched
    factorizations instead of one pivoted LU of the full (n+m) KKT, which
    is the difference between ~1% and decent MXU utilization on TPU.
    """
    P, q, A, l, u = data
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype

    finite_l = jnp.isfinite(l)
    finite_u = jnp.isfinite(u)
    # relative gap test: the bounds arrive Ruiz-SCALED (rows multiplied by
    # E in [1e-4, 1e4]); an absolute threshold would silently pin
    # tight-but-distinct inequalities on small-E rows to their upper bound
    is_eq = finite_l & finite_u & (
        jnp.abs(u - l) < 1e-9 * jnp.maximum(1.0, jnp.abs(u) + jnp.abs(l)))
    if eq_rows is not None:
        is_eq = jnp.zeros(m, dtype=bool).at[eq_rows].set(True)
    has_l = finite_l & ~is_eq
    has_u = finite_u & ~is_eq
    n_barrier = jnp.maximum(jnp.sum(has_l) + jnp.sum(has_u), 1).astype(dtype)

    l_safe = jnp.where(has_l, l, 0.0)
    u_safe = jnp.where(has_u, u, 0.0)
    b_eq = jnp.where(is_eq, u, 0.0)
    eq = is_eq.astype(dtype)
    A_eq = A * eq[:, None]

    Amv, ATmv = _struct_matvecs(A, struct, eq_rows, n, m, dtype)

    I_n = jnp.eye(n, dtype=dtype)
    # trivial rows (nu_i = 0) for non-equality rows keep the KKT full-rank
    kkt_22 = -jnp.diag(jnp.where(is_eq, delta, 1.0).astype(dtype))

    # Levenberg-style adaptive primal regularization bounds (see below)
    REG_MIN = jnp.asarray(1e-6, dtype)
    REG_MAX = jnp.asarray(1e-1, dtype)

    if eq_rows is not None:
        # Condensed SPD path.  The light primal proximal lift REG_MIN is
        # the FLOOR of a Levenberg-style adaptive value carried through the
        # iteration: a Cholesky breakdown (batched TPU rounding can leave H
        # marginally indefinite where the unbatched kernel succeeds)
        # escalates it so the next factorization goes through, instead of
        # freezing the solver on a permanently-NaN H.
        make_solver = _condensed_solver_factory(
            P, A, eq_rows, struct, delta, REG_MIN)
    else:
        def make_solver(D, delta_p=REG_MIN):
            H = P + (delta + delta_p) * I_n + (A.T * D) @ A
            K = jnp.block([[H, A_eq.T], [A_eq, kkt_22]])
            lu, piv = jax.scipy.linalg.lu_factor(K)

            def solve(r1, r2, refine=True):
                rhs = jnp.concatenate([r1, jnp.where(is_eq, r2, 0.0)])
                s0 = jax.scipy.linalg.lu_solve((lu, piv), rhs)
                # one refinement round for f32
                def kmv(v):
                    vx, vy = v[:n], v[n:]
                    return jnp.concatenate([
                        H @ vx + A_eq.T @ vy,
                        A_eq @ vx + kkt_22 @ vy])
                s0 = s0 + jax.scipy.linalg.lu_solve((lu, piv), rhs - kmv(s0))
                return s0[:n], s0[n:]
            return solve

    # -- starting point --------------------------------------------------
    x = jnp.zeros(n, dtype=dtype)
    f = Amv(x)
    s_l = jnp.where(has_l, jnp.maximum(f - l_safe, 1.0), 1.0)
    s_u = jnp.where(has_u, jnp.maximum(u_safe - f, 1.0), 1.0)
    z_l = jnp.where(has_l, 1.0, 0.0).astype(dtype)
    z_u = jnp.where(has_u, 1.0, 0.0).astype(dtype)
    y_eq = jnp.zeros(m, dtype=dtype)

    def merit_parts(f, r_x, r_eq, s_l, s_u, z_l, z_u):
        # safeguard merit = dual + equality + PRIMAL inequality violation +
        # duality gap; must track the termination test (which checks primal
        # feasibility of x directly), else a dual-good early iterate with
        # infeasible x can shadow the converged one.
        rp = jnp.max(jnp.abs(f - jnp.clip(f, l, u)))
        mu = (jnp.sum(s_l * z_l * has_l) + jnp.sum(s_u * z_u * has_u)) / n_barrier
        return (jnp.max(jnp.abs(r_x)) + jnp.max(jnp.abs(r_eq)) + rp + mu), mu

    def merit_of(x, s_l, s_u, z_l, z_u, y_eq):
        f = Amv(x)
        # eq-dual and inequality-dual supports are disjoint -> one matvec
        r_x = P @ x + q + ATmv(jnp.where(is_eq, y_eq, 0.0) + z_u - z_l)
        r_eq = jnp.where(is_eq, f - b_eq, 0.0)
        merit, _ = merit_parts(f, r_x, r_eq, s_l, s_u, z_l, z_u)
        return merit

    def step(carry, _):
        x, s_l, s_u, z_l, z_u, y_eq, reg, best, best_merit = carry
        f = Amv(x)
        # residuals (eq-dual / inequality-dual supports are disjoint)
        r_x = P @ x + q + ATmv(jnp.where(is_eq, y_eq, 0.0) + z_u - z_l)
        r_eq = jnp.where(is_eq, f - b_eq, 0.0)
        # slack consistency residuals (s must track f - l / u - f)
        r_sl = jnp.where(has_l, f - l_safe - s_l, 0.0)
        r_su = jnp.where(has_u, u_safe - f - s_u, 0.0)

        # best-iterate safeguard: near the f32 central-path floor a Newton
        # step can CORRUPT an already-converged iterate (observed on TPU:
        # |r_x| 1e-6 -> 1e-3 in one near-zero-alpha step before the NaN
        # guard engages).  Track the lowest-merit iterate seen and return
        # that instead of whatever the last step left behind.
        merit, mu = merit_parts(f, r_x, r_eq, s_l, s_u, z_l, z_u)
        better = merit < best_merit
        best = jax.tree.map(
            lambda new, old: jnp.where(better, new, old),
            (x, s_l, s_u, z_l, z_u, y_eq), best)
        best_merit = jnp.minimum(merit, best_merit)

        d_l = jnp.where(has_l, z_l / jnp.maximum(s_l, _EPS), 0.0)
        d_u = jnp.where(has_u, z_u / jnp.maximum(s_u, _EPS), 0.0)
        D = d_l + d_u
        solve = make_solver(D, reg)

        def newton(sig_mu, comp_extra_l, comp_extra_u, refine=True):
            # complementarity targets: s.z = sig_mu (+ Mehrotra correction)
            comp_l = jnp.where(has_l, s_l * z_l - sig_mu + comp_extra_l, 0.0)
            comp_u = jnp.where(has_u, s_u * z_u - sig_mu + comp_extra_u, 0.0)
            # eliminate (ds, dz):
            #   dz_l = -(comp_l + z_l*(ds_l)) / s_l, ds_l = A dx + r_sl
            #   dz_u = -(comp_u + z_u*(ds_u)) / s_u, ds_u = -A dx + r_su
            # dz_u - dz_l = D*(A dx) + w
            w = (comp_l / jnp.maximum(s_l, _EPS) * has_l
                 - comp_u / jnp.maximum(s_u, _EPS) * has_u
                 + d_l * r_sl - d_u * r_su)
            r1 = -(r_x + ATmv(w))
            r2 = -r_eq
            dx, dy = solve(r1, r2, refine)
            df = Amv(dx)
            ds_l = jnp.where(has_l, df + r_sl, 0.0)
            ds_u = jnp.where(has_u, -df + r_su, 0.0)
            dz_l = jnp.where(
                has_l, -(comp_l + z_l * ds_l) / jnp.maximum(s_l, _EPS), 0.0)
            dz_u = jnp.where(
                has_u, -(comp_u + z_u * ds_u) / jnp.maximum(s_u, _EPS), 0.0)
            return dx, dy, ds_l, ds_u, dz_l, dz_u

        def max_step(v, dv, mask):
            # largest alpha in (0,1] with v + alpha dv >= (1-tau) v
            ratio = jnp.where(mask & (dv < 0), -v / jnp.minimum(dv, -_EPS), jnp.inf)
            return jnp.minimum(1.0, 0.99 * jnp.min(ratio))

        # affine (predictor) step (refined like the corrector: dropping the
        # predictor's refinement round was measured at +3.8% throughput but
        # -0.3% solved fraction — the Mehrotra correction term reuses the
        # predictor direction, so its accuracy does matter)
        dx_a, dy_a, dsl_a, dsu_a, dzl_a, dzu_a = newton(0.0, 0.0, 0.0)
        a_p = jnp.minimum(max_step(s_l, dsl_a, has_l), max_step(s_u, dsu_a, has_u))
        a_d = jnp.minimum(max_step(z_l, dzl_a, has_l), max_step(z_u, dzu_a, has_u))
        a_aff = jnp.minimum(a_p, a_d)
        mu_aff = (jnp.sum((s_l + a_aff * dsl_a) * (z_l + a_aff * dzl_a) * has_l)
                  + jnp.sum((s_u + a_aff * dsu_a) * (z_u + a_aff * dzu_a) * has_u)
                  ) / n_barrier
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, _EPS)) ** 3, 0.0, 1.0)

        # corrector with Mehrotra second-order term
        dx_c, dy_c, dsl, dsu, dzl, dzu = newton(
            sigma * mu, dsl_a * dzl_a, dsu_a * dzu_a)
        a_p = jnp.minimum(max_step(s_l, dsl, has_l), max_step(s_u, dsu, has_u))
        a_d = jnp.minimum(max_step(z_l, dzl, has_l), max_step(z_u, dzu, has_u))
        alpha = jnp.minimum(a_p, a_d)
        # freeze once the central path reaches the f32 floor
        alpha = jnp.where(mu > _MU_FLOOR, alpha, 0.0)
        # NaN guard: if a Cholesky broke down (ill-conditioned linearization)
        # the step is garbage — keep the iterate instead of poisoning it.
        step_ok = (jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dy_c))
                   & jnp.all(jnp.isfinite(dsl)) & jnp.all(jnp.isfinite(dsu))
                   & jnp.all(jnp.isfinite(dzl)) & jnp.all(jnp.isfinite(dzu)))
        alpha = jnp.where(step_ok, alpha, 0.0)
        # breakdown -> escalate regularization so the NEXT factorization of
        # the (frozen) iterate's KKT succeeds; success -> decay toward floor
        reg = jnp.where(step_ok,
                        jnp.maximum(reg * 0.5, REG_MIN),
                        jnp.minimum(reg * 64.0, REG_MAX))
        nn = jnp.nan_to_num

        x = x + alpha * nn(dx_c)
        y_eq = y_eq + alpha * nn(dy_c)
        s_l = jnp.where(has_l, jnp.maximum(s_l + alpha * nn(dsl), _EPS), s_l)
        s_u = jnp.where(has_u, jnp.maximum(s_u + alpha * nn(dsu), _EPS), s_u)
        z_l = jnp.where(has_l, jnp.maximum(z_l + alpha * nn(dzl), 0.0), z_l)
        z_u = jnp.where(has_u, jnp.maximum(z_u + alpha * nn(dzu), 0.0), z_u)
        diag = (mu, alpha, jnp.max(jnp.abs(r_x)), jnp.max(jnp.abs(r_eq)),
                step_ok) if trace else None
        return (x, s_l, s_u, z_l, z_u, y_eq, reg, best, best_merit), diag

    init = (x, s_l, s_u, z_l, z_u, y_eq)
    carry0 = init + (REG_MIN, init, jnp.asarray(jnp.inf, dtype))
    (x, s_l, s_u, z_l, z_u, y_eq, _, best, best_merit), diags = jax.lax.scan(
        step, carry0, None, length=iters)
    # the post-scan iterate was never merit-checked; give it its shot too
    final_better = merit_of(x, s_l, s_u, z_l, z_u, y_eq) < best_merit
    x, s_l, s_u, z_l, z_u, y_eq = jax.tree.map(
        lambda new, old: jnp.where(final_better, new, old),
        (x, s_l, s_u, z_l, z_u, y_eq), best)
    y = jnp.where(is_eq, y_eq, z_u - z_l)

    # ---- penalty polish (OSQP's "polish", racing_mpc.cpp:87) -------------
    # The f32 IPM parks right at ~1e-3 relative dual residual (the mu floor
    # freezes it before the duals fully settle).  Detect the active set from
    # the dual signs, then re-solve the equality-constrained QP with the
    # active rows enforced by a stiff penalty through the SAME pivot-free
    # Cholesky+Schur solver (a full-KKT LU would reintroduce the pivoted
    # custom call this module exists to avoid).  Keep whichever iterate has
    # the smaller combined KKT residual.
    # Active-set detection: a row is active on a side when its DUAL dominates
    # its SLACK (on the Ruiz-scaled problem both are O(1)-normalized).  The
    # old side-vs-side test (z_l > z_u) mis-pinned rows whose both duals sit
    # at the mu-floor noise level (~1e-6), which made the penalty system
    # infeasibly over-determined and the polish result garbage on every LMPC
    # instance (kkt_metric ~1e7, always rejected — measured).
    act_l = has_l & (z_l > s_l) & (z_l > z_u)
    act_u = has_u & (z_u > s_u) & (z_u > z_l)
    active = act_l | act_u
    b_act = jnp.where(act_l, l_safe, jnp.where(act_u, u_safe, 0.0))
    rho = jnp.asarray(1e5, dtype)
    D_pol = jnp.where(active, rho, 0.0)
    solve_pol = make_solver(D_pol)
    # Single-shot penalty polish (OSQP's "polish" analogue).  Its 1/rho bias
    # and any active-set misidentification are caught by the kkt_metric
    # gate below and, more fundamentally, superseded by the zoomed
    # refinement in solve_qp_ip — the polish is kept because on cleanly
    # determined instances it lands exactly on the active face in one solve.
    r1 = -q + ATmv(D_pol * b_act)
    x_pol, y_pol_eq = solve_pol(r1, b_eq)
    y_pol = jnp.where(is_eq, y_pol_eq,
                      jnp.where(active, D_pol * (Amv(x_pol) - b_act), 0.0))

    def kkt_metric(xc, yc):
        # primal + dual + complementarity/dual-sign violation (same metric
        # as qp.polish: stationarity alone can hold for a wrong active set)
        Axc = Amv(xc)
        zc = jnp.clip(Axc, l, u)
        rp = jnp.max(jnp.abs(Axc - zc))
        rp_eq = jnp.max(jnp.abs(jnp.where(is_eq, Axc - b_eq, 0.0)))
        rd = jnp.max(jnp.abs(P @ xc + q + ATmv(yc)))
        yin = jnp.where(is_eq, 0.0, yc)
        comp = jnp.max(
            jnp.maximum(yin, 0.0) * jnp.where(finite_u, jnp.abs(u_safe - zc), 1.0)
            + jnp.maximum(-yin, 0.0) * jnp.where(finite_l, jnp.abs(zc - l_safe), 1.0))
        return rp + rp_eq + rd + comp

    pol_ok = (kkt_metric(x_pol, y_pol) < kkt_metric(x, y)) \
        & jnp.all(jnp.isfinite(x_pol)) & jnp.all(jnp.isfinite(y_pol)) \
        & jnp.asarray(do_polish)
    x_fin = jnp.where(pol_ok, x_pol, x)
    y_fin = jnp.where(pol_ok, y_pol, y)
    if trace:
        return x_fin, y_fin, (diags, x, y, x_pol, y_pol,
                              kkt_metric(x, y), kkt_metric(x_pol, y_pol),
                              (s_l, s_u, z_l, z_u, act_l, act_u))
    return x_fin, y_fin


def solve_qp_ip(data: QPData, iters: int = 25, delta: float = 1e-7,
                scale: bool = True, eq_rows: Array | None = None,
                struct=None, zoom_rounds: int = 1,
                zoom_iters: int | None = None) -> QPSolution:
    """Ruiz-scale, run the IPM, unscale, report residuals.

    Runs under full-f32 matmul precision: TPU's default reduced-precision
    matmul accumulation (bf16-class) is enough to destabilize the Newton
    systems — with "highest" the solver matches CPU behavior bit-for-bit in
    convergence quality (verified: 0 vs 21% failed solves in closed loop).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_ip_inner(data, iters, delta, scale, eq_rows, struct,
                                  zoom_rounds, zoom_iters)


def _solve_qp_ip_inner(data: QPData, iters: int, delta: float,
                       scale: bool, eq_rows: Array | None = None,
                       struct=None, zoom_rounds: int = 1,
                       zoom_iters: int | None = None) -> QPSolution:
    # The condensed Hessians arrive as f32 Gram-product sums that are only
    # symmetric PSD in exact arithmetic; rounding leaves ~1e-4-relative
    # asymmetry and NEGATIVE curvature (observed lambda_min ~ -2e-4 on BARC
    # LMPC scenarios), which breaks down the pivot-free Cholesky and freezes
    # the NaN-guarded iterate at ~1e-1 residuals.  Symmetrize here; ridge
    # AFTER equilibration below, where the diagonal is O(1) so a uniform
    # 1e-5 lift is small for EVERY variable (a pre-scaling trace-relative
    # ridge is ~0.1-sized on the low-curvature lambda block and visibly
    # degrades LMPC solutions).
    data = data._replace(P=0.5 * (data.P + data.P.T))
    if scale:
        sdata0, (D, E, c) = ruiz_equilibrate(data)
    else:
        sdata0 = data
        D = jnp.ones(data.P.shape[0], dtype=data.P.dtype)
        E = jnp.ones(data.A.shape[0], dtype=data.P.dtype)
        c = jnp.asarray(1.0, dtype=data.P.dtype)
    n = sdata0.P.shape[0]
    trace_n = jnp.trace(sdata0.P) / n
    I_n = jnp.eye(n, dtype=sdata0.P.dtype)
    sdata = sdata0._replace(P=sdata0.P + (_RIDGE_REL * trace_n) * I_n)
    xs, ys = _ipm_core(sdata, iters=iters, delta=delta, eq_rows=eq_rows,
                       struct=struct)

    # ---- zoomed refinement (iterative refinement at the OPTIMIZATION
    # level, after Gleixner et al.'s exact-LP refinement) -----------------
    # Two f32 error sources park the first pass ~1e-2-relative off the f64
    # optimum in the steering direction (measured vs mpc/reference_qp.py):
    # the convexity ridge biases the minimizer along the QP's low-curvature
    # valley, and the IPM itself stops at its mu floor.  Both are removed by
    # re-solving the RESIDUAL problem around the iterate
    #     min 1/2 e'(P0 + ridge2) e + (q + P0 x1)'e
    #     s.t. l - A x1 <= A e <= u - A x1
    # zoomed by Delta (gradient/bounds scaled by Delta) with the SAME
    # fixed-iteration solver: f32 floors are absolute, so the magnified
    # problem resolves Delta-times-finer detail, and the refinement ridge
    # re-biases only by O(ridge * |e|) — geometric contraction.  The
    # gradient and slacks MUST be computed in compensated (double-word) f32
    # (ops/compensated.py): their true values sit at ~1e-8 where a plain
    # matvec carries ~1e-7 rounding, and a refinement fed f32-cancellation
    # noise stalls (measured).  Active-set-free, so the near-dependent
    # active rows of the LMPC QPs can never form a singular KKT here.
    from racing_lmpc_tpu.ops.compensated import (
        dot_compensated, matvec_compensated, two_sum)

    P0, q0, A0, l0, u0 = sdata0

    def comp_pieces(x):
        """Double-word A x, P x + q of the UNRIDGED scaled problem."""
        f_h, f_l = matvec_compensated(A0, x)
        rq_h, rq_l = matvec_compensated(P0, x)
        rq_h, e1 = two_sum(rq_h, q0)
        return f_h, f_l, rq_h, rq_l + e1

    def phi_of(x, pieces):
        """l1-exact-penalty merit as a DOUBLE-WORD (hi, lo) pair.

        Dual-free on purpose: the fresh duals a refinement subproblem
        returns carry their own noise and must not veto a primal
        improvement (measured: a step improving steering 10x was rejected
        by a KKT-residual guard).  Two hard-won details (round 4):
        - the violation must be the l1 SUM with PEN > max|y*| (l1-penalty
          exactness); the previous max-violation form needed PEN > ||y*||_1,
          which the 30*(1+max|y|) estimate does not reach — the ladder then
          "improved" phi by sliding ~1e-7 into infeasibility while steering
          drifted 30x off the certified optimum;
        - the compensated pieces must be ACCUMULATED in double-word too: a
          plain f32 sum of O(10) partial dots carries ~1e-6 noise, burying
          the ~1e-9 objective differences that distinguish points along the
          QP's low-curvature valley."""
        f_h, f_l, rq_h, rq_l = pieces
        # obj = 1/2 x'(P x + q) + 1/2 q'x  — use the compensated P x + q
        oh1, ol1 = dot_compensated(x, rq_h)
        oh2, ol2 = dot_compensated(x, rq_l)
        oh3, ol3 = dot_compensated(q0, x)
        h, lo = oh1, ol1
        for term in (oh2, ol2, oh3, ol3):
            h, e = two_sum(h, term)
            lo = lo + e
        h, lo = 0.5 * h, 0.5 * lo
        f = f_h + f_l
        viol = jnp.sum(jnp.abs(f - jnp.clip(f, l0, u0)))
        h, e = two_sum(h, PEN * viol)
        return h, lo + e

    def phi_lt(a, b):
        """Double-word comparison a < b."""
        return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))

    # exact-penalty weight: must dominate the true multipliers (|y*|); the
    # main pass's duals are a reliable estimate
    PEN = 30.0 * (1.0 + jnp.max(jnp.abs(jnp.nan_to_num(ys))))

    pieces = comp_pieces(xs)
    phi1 = phi_of(xs, pieces)

    # NOTE (measured verdict, round 4): a cheap one-shot active-set penalty
    # refinement (a `qp_refine_rounds` knob, rounds 3-4) was built, armed, and
    # REMOVED here.  Two independent failure modes killed it: (1) forming
    # A'(rho=1e5)A in f32 injects ~1e-2-absolute Gram rounding next to the
    # O(1) Ruiz-scaled Hessian, leaving the penalty system indefinite
    # (lambda_min ~ -1e-2 measured) so the pivot-free Cholesky NaNs at any
    # accuracy-preserving lift; (2) with a moderate rho and compensated
    # residual iterations the system solves to rd ~ 4e-7, but the answer is
    # only as good as the guessed active set, and a single mis-pinned row
    # moved the applied steering 9e-3 OFF the certified optimum (the
    # merit gate then rejects every round — the path was measured inert:
    # identical sweep errors at refine rounds 0/2/4).  The trust-region
    # zoom ladder below needs no active-set guess and reaches the same
    # target; the knob was deleted in round 5.

    # Zoom LADDER.  Round 1 runs unzoomed (the ridge-bias correction is
    # O(1)); after an accepted round the zoom is raised so the EXPECTED
    # remaining correction (~1e-2 of the measured one) becomes O(1) for the
    # solver — the f32 floors are absolute, so the magnified subproblem
    # resolves zoom-times-finer detail.  A rejected round escalates the
    # zoom instead (the step was too coarse at this scale).
    #
    # TRUST REGION (round 4): the magnified bounds are CLIPPED to +-C_TR.
    # Without the clip, magnifying the O(1) slack of every INACTIVE row by
    # zoom~1e3 hands the (un-re-equilibrated) subproblem bounds spanning
    # [1e-3, 1e3]; the fixed-iteration IPM returns junk corrections two
    # orders larger than the true residual error (|xe| = 52 where Z*e* =
    # 0.1, measured) and the ladder WANDERS along the QP's low-curvature
    # valley — the exact failure that left the r3 reference-match gate at
    # 1.1e-3 with zero margin.  Clipping is safe: the true correction
    # satisfies |A e| <= C_TR/zoom << C_TR, so clipped rows never bind at
    # the subproblem optimum; they only stop the solver from using the
    # far-away region.  With it the ladder contracts monotonically
    # (8e-5 -> 1.6e-4 -> 1.6e-4 fixed point, vs 8e-5 -> 2.5e-3 -> ...
    # without, measured on the deviated BARC instance).
    is_eq_z = jnp.zeros(A0.shape[0], dtype=bool)
    if eq_rows is not None:
        is_eq_z = is_eq_z.at[eq_rows].set(True)
    C_TR = jnp.asarray(_C_TR, dtype=sdata.P.dtype)

    def zoom_round(carry):
        xs, ys, phi1, pieces, zoom, active = carry
        f_h, f_l, rq_h, rq_l = pieces
        l_r = (l0 - f_h) - f_l
        u_r = (u0 - f_h) - f_l
        rq = rq_h + rq_l
        # two-sided clip into [-C_TR, C_TR] and order enforcement: a row
        # whose residual violation exceeds C_TR/zoom would otherwise get
        # crossed bounds (zoom*l_r > +C_TR >= uz), handing the subproblem an
        # inconsistent row — the merit gate rejects the junk step, but the
        # round is wasted and the zoom escalates on garbage (ADVICE r4).
        # Clipping the violated side pins the row AT the trust region edge,
        # a feasible subproblem that still pushes the violation down.
        lz = jnp.where(jnp.isfinite(l0),
                       jnp.clip(zoom * l_r, -C_TR, C_TR), -jnp.inf)
        uz = jnp.where(jnp.isfinite(u0),
                       jnp.clip(zoom * u_r, -C_TR, C_TR), jnp.inf)
        lz = jnp.minimum(lz, uz)
        # equality rows stay exact (their residuals are tiny anyway)
        lz = jnp.where(is_eq_z, zoom * u_r, lz)
        uz = jnp.where(is_eq_z, zoom * u_r, uz)
        rdata = QPData(P=P0, q=zoom * rq, A=A0, l=lz, u=uz)
        ok1 = jnp.all(jnp.isfinite(xs)) & jnp.all(jnp.isfinite(ys))
        xe, ye = _ipm_core(rdata, iters=zoom_iters or iters, delta=delta,
                           eq_rows=eq_rows, struct=struct)
        step_ok = ok1 & jnp.all(jnp.isfinite(xe)) & jnp.all(jnp.isfinite(ye))
        xs2 = jnp.where(step_ok, xs + xe / zoom, xs)
        ys2 = jnp.where(step_ok, ye / zoom, ys)
        pieces2 = comp_pieces(xs2)
        phi2 = phi_of(xs2, pieces2)
        better = step_ok & phi_lt(phi2, phi1)
        # macroscopic gain -> stay at this zoom (still making large-scale
        # progress); microscopic/no gain -> escalate for the endgame
        dphi = (phi2[0] - phi1[0]) + (phi2[1] - phi1[1])
        macro = better & (dphi < -_GAIN_SMALL)
        xs = jnp.where(better, xs2, xs)
        ys = jnp.where(better, ys2, ys)
        phi1 = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), phi2, phi1)
        pieces = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), pieces2, pieces)
        at_max = zoom >= _ZOOM_MAX
        zoom = jnp.where(macro, zoom,
                         jnp.minimum(zoom * _ZOOM_STEP, _ZOOM_MAX))
        # EARLY EXIT for the rounds that remain (r4 verdict: Putnam
        # instances land 5e-6 after round 1 yet paid every round).  Two
        # conditions retire the ladder:
        # - a REJECTED round at the zoom cap: pieces, zoom and the IPM are
        #   all deterministic, so the next round would solve the identical
        #   subproblem and be rejected again — skipping is exact;
        # - an ACCEPTED round whose unmagnified correction is below
        #   _EXIT_ATOL (Ruiz-scaled units): the remaining refinement is at
        #   the f32 noise floor, orders below the acceptance gates.
        corr = jnp.max(jnp.abs(xe)) / zoom
        done = (~better & at_max) | (better & (corr < _EXIT_ATOL))
        return xs, ys, phi1, pieces, zoom, active & ~done

    carry = (xs, ys, phi1, pieces, jnp.asarray(1.0, dtype=sdata.P.dtype),
             jnp.asarray(True))

    # lax.while_loop ladder: ONE compiled copy of the round body (the old
    # unrolled cond chain put zoom_rounds IPM cores in the graph), and the
    # early exit is real in EVERY execution mode — batch-1 stops the chip
    # the round the ladder retires, and under vmap the while predicate
    # becomes any(active): the BATCH stops at the deepest round any
    # instance still needs (measured: most scenario instances retire after
    # 1-2 rounds, so the zoom_rounds=4 default costs ~zoom-2 throughput
    # instead of 2x).
    def ladder_cond(c):
        carry_c, k = c
        return carry_c[-1] & (k < zoom_rounds)

    def ladder_step(c):
        carry_c, k = c
        return zoom_round(carry_c), k + 1

    carry, _ = jax.lax.while_loop(
        ladder_cond, ladder_step, (carry, jnp.asarray(0)))
    xs, ys, phi1, pieces, _, _ = carry

    rp_rel, rd_rel = scaled_residuals(sdata, xs, ys)
    x = xs * D
    y = ys * E / c
    z = jnp.clip(data.A @ x, data.l, data.u)
    r_prim = jnp.max(jnp.abs(data.A @ x - z))
    r_dual = jnp.max(jnp.abs(data.P @ x + data.q + data.A.T @ y))
    obj = 0.5 * x @ (data.P @ x) + data.q @ x
    return QPSolution(x=x, y=y, z=z, r_prim=r_prim, r_dual=r_dual, obj=obj,
                      rp_rel=rp_rel, rd_rel=rd_rel)
