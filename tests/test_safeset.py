"""Safe-set tests: lap processing, query semantics, recorder, regression.

Uses the 3 recorded BARC laps shipped with the reference
(racing_mpc/test_data/barc_ss) as golden fixtures.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import SS_DIR, TRACK_DIR, barc_vehicle
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.safeset import (
    RegQuery,
    SafeSetManager,
    SafeSetRecorder,
    SSQuery,
)
from racing_lmpc_tpu.track import RacingTrajectory

BARC_LAP_PREFIXES = [SS_DIR / "barc" / f"ss_lap_{i}" for i in (1, 2, 3)]
BARC_LEN = 17.0142237


@pytest.fixture(scope="module")
def loaded_manager():
    mgr = SafeSetManager(max_laps=3, nx=6, nu=2)
    rec = SafeSetRecorder(mgr)
    rec.load(BARC_LAP_PREFIXES, BARC_LEN)
    return mgr


def test_load_barc_laps(loaded_manager):
    mgr = loaded_manager
    assert mgr.num_laps == 3
    assert sorted(int(v.sum()) for v in mgr.valid_raw) == [436, 440, 443]


def test_cost_to_go_descends(loaded_manager):
    mgr = loaded_manager
    slot = mgr._order[0]
    T = int(mgr.valid_raw[slot].sum())
    # middle copy of the tripled array holds J = [T-1 .. 0]
    J_mid = mgr.J_rep[slot][mgr.pad:mgr.pad + T]
    assert J_mid[0] == T - 1 and J_mid[-1] == 0
    assert np.all(np.diff(J_mid) == -1)


def test_query_returns_local_points(loaded_manager):
    mgr = loaded_manager
    q = np.array([5.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)
    res = mgr.query(SSQuery(q, 1.0, 96, 32))
    assert res.x.shape == (96, 6)
    # returned points are near the query abscissa
    assert np.abs(res.x[:, 0] - 5.0).max() < 2.0
    # 32 per lap from 3 laps
    assert res.J.shape == (96,)


def test_query_wraps_start_finish(loaded_manager):
    # querying just before the start line must return next-lap (wrapped)
    # points with continued (negative-J) cost-to-go — the tripling at work
    mgr = loaded_manager
    q = np.array([BARC_LEN - 0.1, 0.0, 0, 0, 0, 0], dtype=np.float32)
    res = mgr.query(SSQuery(q, 1.0, 30, 10))
    assert res.x[:, 0].max() > BARC_LEN - 0.5  # points ahead across the line
    assert res.J.min() < 5                     # low/negative cost-to-go side


def test_query_padded_relative_cost(loaded_manager):
    mgr = loaded_manager
    q = np.array([5.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)
    x, J, found = mgr.query_padded(q, 96, 32)
    assert found and x.shape == (96, 6) and J[0] == 0.0


def test_recorder_lap_detection(tmp_path):
    mgr = SafeSetManager(max_laps=3, nx=6, nu=2, pad_len=256)
    rec = SafeSetRecorder(mgr, to_file=True, file_prefix=str(tmp_path / "ss_"))
    L = 10.0
    t = 0.0
    # drive 2.5 laps at 1 m/s, dt=0.1 (first partial lap primes the recorder)
    s = 7.0
    for _ in range(260):
        x = np.array([s % L, 0.01, 0.0, 1.0, 0.0, 0.0])
        rec.step(x, np.zeros(2), 0.0, t, L)
        s += 0.1
        t += 0.1
    assert mgr.num_laps >= 1
    assert rec.lap_count >= 2
    assert len(rec.lap_times) >= 1
    assert abs(rec.lap_times[0] - 10.0) < 0.2
    # checkpoint files written in the reference's 4-file format
    files = sorted(p.name for p in tmp_path.iterdir())
    assert any(f.endswith("_x.txt") for f in files)
    # and they reload
    mgr2 = SafeSetManager(max_laps=3, nx=6, nu=2, pad_len=256)
    rec2 = SafeSetRecorder(mgr2)
    prefix = str(tmp_path / "ss_lap_1")
    rec2.load([prefix], L)
    assert mgr2.num_laps == 1


def test_ring_buffer_eviction():
    mgr = SafeSetManager(max_laps=2, nx=6, nu=2, pad_len=64)
    for lap in range(3):
        T = 20
        x = np.zeros((T, 6))
        x[:, 0] = np.linspace(0, 9.5, T)
        x[:, 3] = lap + 1.0  # velocity marks the lap
        mgr.add_lap(x, np.zeros((T, 2)), np.zeros(T), np.arange(T) * 0.1, 10.0)
    assert mgr.num_laps == 2
    res = mgr.query(SSQuery(np.array([5.0, 0, 0, 0, 0, 0]), 1.0, 10, 5))
    # newest lap (vx=3) first; evicted lap (vx=1) absent
    assert res.x[0, 3] == 3.0
    assert not np.any(res.x[:, 3] == 1.0)


def test_regression_matches_reference_formula(loaded_manager):
    # verify the WLS algebra against a direct numpy transcription of
    # safe_set.cpp:219-243 on the same (single-lap) data
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    mgr = SafeSetManager(max_laps=1, nx=6, nu=2, pad_len=512)
    x = np.loadtxt(BARC_LAP_PREFIXES[0].as_posix() + "_x.txt")
    u = np.loadtxt(BARC_LAP_PREFIXES[0].as_posix() + "_u.txt")
    k = np.loadtxt(BARC_LAP_PREFIXES[0].as_posix() + "_k.txt")
    t = np.loadtxt(BARC_LAP_PREFIXES[0].as_posix() + "_t.txt")
    mgr.add_lap(x, u, k, t, BARC_LEN)

    A0 = np.eye(6)
    B0 = np.zeros((6, 2))
    C0 = np.zeros(6)
    # regress the vx (index 3) one-step error on (vx, lon)
    q_pt = np.array([x[50, 3], u[50, 0]])
    query = RegQuery(
        x=q_pt, dist_max=0.5,
        reg_in_state_idxs=[[3]], reg_in_control_idxs=[[0]],
        reg_out_state_idxs=[[3]],
        A=A0, B=B0, C=C0, f=model.discrete_dynamics)
    out = mgr.query_regression(query)
    # correction applied at (3,3), (3,0 of B), C[3] only
    changed = out.A != A0
    assert changed[3, 3] and changed.sum() == 1
    assert (out.B != B0)[3, 0]
    assert out.C[3] != 0.0

    # direct transcription on valid points: stored u_i produced x_i, so the
    # control applied during [t_i, t_{i+1}) is u_{i+1} (prediction AND
    # features use the successor control), and the residual is on the
    # OUTPUT state
    dt = np.concatenate([np.diff(t), [t[-1] - t[-2]]])
    import jax
    f_pred = np.asarray(jax.vmap(model.discrete_dynamics)(
        jnp.asarray(x[:-1], dtype=jnp.float32),
        jnp.asarray(u[1:], dtype=jnp.float32),
        jnp.asarray(k[:-1], dtype=jnp.float32),
        jnp.asarray(dt[:-1], dtype=jnp.float32)))
    xs = x[:-1, 3]
    us = u[1:, 0]
    xip1 = x[1:, 3]
    pred = f_pred[:, 3]
    z = np.stack([xs, us], axis=-1)
    d = np.sqrt(np.sum((z - q_pt) ** 2, axis=-1))
    mask = d < 0.5
    Kw = np.where(mask, 0.75 / 0.5 * (1 - (d / 0.5) ** 2) ** 2, 0.0)
    M = np.stack([xs, us, np.ones_like(xs)], axis=-1)
    y = xip1 - pred
    Q = M.T @ (Kw[:, None] * M) + 1e-3 * np.eye(3)
    b = M.T @ (Kw * y)
    R = np.linalg.solve(Q, b)
    assert np.isclose(out.A[3, 3] - 1.0, R[0], rtol=1e-3, atol=1e-5)
    assert np.isclose(out.B[3, 0], R[1], rtol=1e-3, atol=1e-5)
    assert np.isclose(out.C[3], R[2], rtol=1e-3, atol=1e-5)


def test_regression_recovers_planted_error_dynamics():
    """Ground-truth gate for row/alignment/sign: generate a lap from a known
    model plus a planted linear error on ONE output row, store it exactly as
    the recorder does (x_i paired with the control that produced it), and
    check the regression recovers the planted (dA, dB, dC) on that row."""
    rng = np.random.default_rng(0)
    nx, nu = 3, 1
    dt = 0.05

    Ap = np.array([[1.0, dt, 0.0], [0.0, 0.95, dt], [0.0, 0.0, 0.9]])
    Bp = np.array([[0.0], [0.0], [dt * 2.0]])

    def f(x, u, k, dtv):
        return jnp.asarray(Ap, dtype=x.dtype) @ x \
            + jnp.asarray(Bp, dtype=x.dtype) @ u

    # planted error on OUTPUT row 1 from features (x1, x2, u0)
    dA_true = np.array([0.03, -0.02])     # on x[1], x[2]
    dB_true = np.array([0.05])
    dC_true = 0.01

    T = 220
    xs = np.zeros((T, nx)); us_applied = np.zeros((T - 1, nu))
    xs[0] = [0.0, 0.4, 0.1]
    for i in range(T - 1):
        us_applied[i] = 0.3 * np.sin(0.11 * i) + 0.05 * rng.standard_normal()
        xn = Ap @ xs[i] + Bp @ us_applied[i]
        xn[1] += (dA_true @ xs[i, 1:3] + dB_true @ us_applied[i] + dC_true)
        xs[i + 1] = xn

    # recorder convention: u stored at i is the control that PRODUCED x_i
    u_store = np.zeros((T, nu))
    u_store[1:] = us_applied
    mgr = SafeSetManager(max_laps=1, nx=nx, nu=nu, pad_len=256,
                         use_native=False)
    mgr.add_lap(xs, u_store, np.zeros(T), dt * np.arange(T), 100.0)

    out = mgr.query_regression(RegQuery(
        x=np.array([0.0, 0.0, 0.0]), dist_max=10.0,
        reg_in_state_idxs=[[1, 2]], reg_in_control_idxs=[[0]],
        reg_out_state_idxs=[[1]],
        A=Ap.copy(), B=Bp.copy(), C=np.zeros(nx), f=f))

    np.testing.assert_allclose(out.A[1, 1:3] - Ap[1, 1:3], dA_true, atol=5e-3)
    np.testing.assert_allclose(out.B[1, 0] - Bp[1, 0], dB_true[0], atol=5e-3)
    assert abs(out.C[1] - dC_true) < 5e-3
    # untouched rows stay nominal
    np.testing.assert_allclose(out.A[0], Ap[0], atol=1e-12)
    np.testing.assert_allclose(out.A[2], Ap[2], atol=1e-12)
