"""End-to-end control match vs a float64 oracle.

For BARC scenario QPs (tracking and LMPC), the full build->IPM->extract
pipeline is compared against scipy trust-constr solving the SAME QP data at
float64 (the role OSQP-with-polish at f64 plays in the reference,
racing_mpc.cpp:85-103).

Thresholds are differentiated by channel on purpose:

- **longitudinal**: the lon channel is well-conditioned; the f32 IPM matches
  the f64 oracle to ~1e-5 relative — far inside the 1e-3 budget.
- **steering**: the condensed Hessian has a near-null subspace of
  high-frequency steering alternations that barely change contour/heading
  or rate cost; its relative curvature is ~1e-9 of the dominant scale
  (measured rcond of the scaled KKT).  ANY f32 factorization has error
  ~eps_f32 / lambda_min ~ 4e-2 along that valley — matching the f64
  minimizer there requires f64 arithmetic, which TPUs do not have.  The
  valley is cost-flat: the objective gap between the two solutions is
  ~1e-4 relative, so closed-loop behavior is equivalent (the closed-loop
  tests bound lateral deviation independently).  We assert the steering
  match to the f32-achievable 1e-1 relative and the objective gap to 1e-3
  relative, which pins the solution quality without demanding
  f64-resolvable digits.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import minimize, LinearConstraint

from racing_lmpc_tpu.benchmarks import build_barc_lmpc, make_scenario_batch
from racing_lmpc_tpu.config import barc_mpc_config
from racing_lmpc_tpu.mpc.racing_mpc import RacingMPC
from racing_lmpc_tpu.mpc.ipm import solve_qp_ip


def _oracle(P, q, A, l, u):
    P = 0.5 * (P + P.T)
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(len(q)),
        jac=lambda x: P @ x + q, hess=lambda x: P,
        constraints=[LinearConstraint(A, l, u)], method="trust-constr",
        options={"maxiter": 3000, "gtol": 1e-12, "xtol": 1e-14})
    assert res.status in (1, 2), res.message
    return res.x


def _compare(mpc, inp, b):
    one = jax.tree.map(lambda a: a[b], inp)
    with jax.default_matmul_precision("highest"):
        data, aux = jax.jit(mpc._build_qp)(one)
        sol = solve_qp_ip(data, iters=mpc.config.qp_ip_iters,
                          eq_rows=mpc.eq_rows, struct=mpc.qp_struct)
    P, q, A, l, u = [np.asarray(v, np.float64) for v in data]
    x_o = _oracle(P, q, A, l, u)
    x_i = np.asarray(sol.x, np.float64)
    F, f, MU, mu0, Gm, gm = [np.asarray(a, np.float64) for a in aux]
    su = np.asarray(mpc.scale_u)
    N, nu, nuu = mpc.N, mpc.nu, mpc.layout.nuu

    def controls(x):
        return (MU @ x[:nuu] + mu0).reshape(N - 1, nu) * su

    dU_rel = np.abs(controls(x_i) - controls(x_o)) / su
    Ps = 0.5 * (P + P.T)
    obj = lambda x: 0.5 * x @ Ps @ x + q @ x
    obj_gap_rel = abs(obj(x_i) - obj(x_o)) / max(abs(obj(x_o)), 1.0)
    return dU_rel, obj_gap_rel


@pytest.fixture(scope="module")
def barc():
    return build_barc_lmpc(n_horizon=10, num_ss=16)


def test_tracking_mpc_matches_f64_oracle(barc):
    model, track, _, _, manager = barc
    cfg = barc_mpc_config("barc_tracking_mpc", n=10, learning=False)
    mpc = RacingMPC(cfg, model)
    inp = make_scenario_batch(mpc, track, None, 3, seed=7)
    for b in range(3):
        dU_rel, obj_gap = _compare(mpc, inp, b)
        assert dU_rel[:, 0].max() < 1e-4, f"lon mismatch {dU_rel[:, 0].max()}"
        assert dU_rel[:, 1].max() < 1e-1, f"steer valley {dU_rel[:, 1].max()}"
        assert obj_gap < 1e-3, f"objective gap {obj_gap}"


def test_lmpc_matches_f64_oracle(barc):
    model, track, cfg, mpc, manager = barc
    inp = make_scenario_batch(mpc, track, manager, 3, seed=7)
    for b in range(3):
        dU_rel, obj_gap = _compare(mpc, inp, b)
        assert dU_rel[:, 0].max() < 1e-3, f"lon mismatch {dU_rel[:, 0].max()}"
        assert dU_rel[:, 1].max() < 2e-1, f"steer valley {dU_rel[:, 1].max()}"
        assert obj_gap < 1e-3, f"objective gap {obj_gap}"
