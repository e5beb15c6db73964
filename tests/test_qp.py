"""QP solver tests against closed forms and SciPy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize, LinearConstraint

from racing_lmpc_tpu.mpc.qp import QPData, solve_qp


def _to_qp(P, q, A, l, u, dtype=jnp.float32):
    return QPData(
        P=jnp.asarray(P, dtype=dtype), q=jnp.asarray(q, dtype=dtype),
        A=jnp.asarray(A, dtype=dtype), l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype))


def scipy_solve(P, q, A, l, u):
    n = P.shape[0]
    con = LinearConstraint(A, l, u)
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros(n), jac=lambda x: P @ x + q,
        constraints=[con], method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return res.x


def test_unconstrained():
    rng = np.random.default_rng(0)
    n = 8
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = np.zeros((1, n))
    sol = solve_qp(_to_qp(P, q, A, [-np.inf], [np.inf]))
    x_true = np.linalg.solve(P, -q)
    assert np.abs(np.asarray(sol.x) - x_true).max() < 1e-4


def test_box_projection():
    # min 1/2||x - v||^2 s.t. -1 <= x <= 1  ->  clip(v)
    v = np.array([2.0, -3.0, 0.5, 0.0, -0.7])
    n = 5
    sol = solve_qp(_to_qp(np.eye(n), -v, np.eye(n), -np.ones(n), np.ones(n)))
    assert np.abs(np.asarray(sol.x) - np.clip(v, -1, 1)).max() < 1e-5


def test_equality_constrained_closed_form():
    rng = np.random.default_rng(1)
    n, m = 10, 4
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    sol_true = np.linalg.solve(K, np.concatenate([-q, b]))
    sol = solve_qp(_to_qp(P, q, A, b, b))
    assert np.abs(np.asarray(sol.x) - sol_true[:n]).max() < 1e-4
    # duals match too (sign convention: P x + q + A' y = 0)
    assert np.abs(np.asarray(sol.y) - (-sol_true[n:] * -1)).max() < 1e-3 or \
        np.abs(np.asarray(sol.y) - sol_true[n:]).max() < 1e-3


@pytest.mark.parametrize("seed", [2, 3, 4])
def test_random_inequality_qp_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m = 12, 18
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n) * 2
    A = rng.normal(size=(m, n))
    l = -rng.uniform(0.1, 1.0, m)
    u = rng.uniform(0.1, 1.0, m)
    x_ref = scipy_solve(P, q, A, l, u)
    sol = solve_qp(_to_qp(P, q, A, l, u), iters=400)
    assert np.abs(np.asarray(sol.x) - x_ref).max() < 5e-4
    assert float(sol.r_prim) < 1e-4


def test_mixed_equality_inequality_vs_scipy():
    rng = np.random.default_rng(5)
    n = 15
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A_eq = rng.normal(size=(3, n))
    b_eq = rng.normal(size=3) * 0.1
    A_in = rng.normal(size=(10, n))
    ub = rng.uniform(0.5, 1.5, 10)
    A = np.vstack([A_eq, A_in])
    l = np.concatenate([b_eq, -np.full(10, np.inf)])
    u = np.concatenate([b_eq, ub])
    x_ref = scipy_solve(P, q, A, l, u)
    sol = solve_qp(_to_qp(P, q, A, l, u), iters=400)
    assert np.abs(np.asarray(sol.x) - x_ref).max() < 1e-3


def test_mpc_like_double_integrator():
    # 10-step double integrator regulation with control box: compare vs scipy
    N, nx, nu = 10, 2, 1
    dt = 0.1
    Ad = np.array([[1, dt], [0, 1]])
    Bd = np.array([[dt**2 / 2], [dt]])
    n = N * nx + (N - 1) * nu
    Q = np.diag([1.0, 0.1])
    R = 0.01 * np.eye(nu)
    P = np.zeros((n, n))
    q = np.zeros(n)
    for i in range(N):
        P[i * nx:(i + 1) * nx, i * nx:(i + 1) * nx] = Q * (10.0 if i == N - 1 else 1.0)
    for i in range(N - 1):
        j = N * nx + i * nu
        P[j:j + nu, j:j + nu] = R
    x0 = np.array([1.0, 0.0])
    rows = []
    l, u = [], []
    # dynamics
    for i in range(N - 1):
        row = np.zeros((nx, n))
        row[:, (i + 1) * nx:(i + 2) * nx] = -np.eye(nx)
        row[:, i * nx:(i + 1) * nx] = Ad
        row[:, N * nx + i * nu:N * nx + (i + 1) * nu] = Bd
        rows.append(row)
        l += [0.0] * nx
        u += [0.0] * nx
    # initial state
    row = np.zeros((nx, n))
    row[:, :nx] = np.eye(nx)
    rows.append(row)
    l += list(x0)
    u += list(x0)
    # control box
    for i in range(N - 1):
        row = np.zeros((nu, n))
        row[:, N * nx + i * nu:N * nx + (i + 1) * nu] = np.eye(nu)
        rows.append(row)
        l += [-0.6]
        u += [0.6]
    A = np.vstack(rows)
    l, u = np.array(l), np.array(u)
    x_ref = scipy_solve(P, q, A, l, u)
    sol = solve_qp(_to_qp(P, q, A, l, u), iters=400)
    assert np.abs(np.asarray(sol.x) - x_ref).max() < 1e-3
    # the control bound must actually be active initially for this test to bite
    u_traj = x_ref[N * nx:]
    assert np.abs(u_traj).max() > 0.59


def test_vmap_batched_matches_single():
    rng = np.random.default_rng(6)
    n, m, B = 8, 12, 5
    Ps, qs, As, ls, us = [], [], [], [], []
    for _ in range(B):
        M = rng.normal(size=(n, n))
        Ps.append(M @ M.T + np.eye(n))
        qs.append(rng.normal(size=n))
        As.append(rng.normal(size=(m, n)))
        ls.append(-rng.uniform(0.1, 1, m))
        us.append(rng.uniform(0.1, 1, m))
    batch = QPData(
        P=jnp.asarray(np.stack(Ps), dtype=jnp.float32),
        q=jnp.asarray(np.stack(qs), dtype=jnp.float32),
        A=jnp.asarray(np.stack(As), dtype=jnp.float32),
        l=jnp.asarray(np.stack(ls), dtype=jnp.float32),
        u=jnp.asarray(np.stack(us), dtype=jnp.float32))
    batched = jax.jit(jax.vmap(lambda d: solve_qp(d, iters=300)))
    sols = batched(batch)
    for b in range(B):
        single = solve_qp(_to_qp(Ps[b], qs[b], As[b], ls[b], us[b]), iters=300)
        assert np.abs(np.asarray(sols.x[b]) - np.asarray(single.x)).max() < 2e-4


def test_warm_start_converges_faster():
    rng = np.random.default_rng(7)
    n, m = 10, 14
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = -rng.uniform(0.5, 1, m)
    u = rng.uniform(0.5, 1, m)
    data = _to_qp(P, q, A, l, u)
    cold = solve_qp(data, iters=400)
    warm = solve_qp(data, iters=30, x0=cold.x, y0=cold.y)
    assert np.abs(np.asarray(warm.x) - np.asarray(cold.x)).max() < 1e-3
