"""LQR and EKF tests (reference packages racing_lqr / ekf_state_estimator)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    PARAM_DIR,
    ekf_config_from_params,
    load_ros_params,
    lqr_config_from_params,
    sample_vehicle,
    single_track_config_from_params,
    vehicle_config_from_params,
)
from racing_lmpc_tpu.estimation import (
    EKFStateEstimator,
    EKFUninitializedException,
    NoObservationRegisteredException,
    ObservationNameAlreadyExistsException,
    ObservationNameNotFoundException,
)
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.mpc.racing_lqr import RacingLQR


@pytest.fixture(scope="module")
def model():
    # IAC-scale sample vehicle in global (non-Frenet) mode, full 3-control
    p = load_ros_params(PARAM_DIR / "sample_vehicle_base.param.yaml",
                        PARAM_DIR / "sample_vehicle_single_track.param.yaml")
    base = vehicle_config_from_params(p)
    base = type(base)(**{**base.__dict__,
                         "modeling": type(base.modeling)(
                             use_frenet=False, integrator_type="rk4",
                             sample_throttle=60.0)})
    st = single_track_config_from_params(p, simplify_lon_control=False)
    return SingleTrackPlanarModel(base, st)


def make_reference(model, N, dt, v0=30.0, steer=0.01):
    """A dynamically consistent reference by rolling the model."""
    x = jnp.asarray([0.0, 0.0, 0.0, v0, 0.0, 0.0], dtype=jnp.float32)
    u = jnp.asarray([500.0, 0.0, steer], dtype=jnp.float32)
    X = [x]
    for _ in range(N - 1):
        from racing_lmpc_tpu.ops.integrators import rk4
        x = rk4(model.dynamics, x, u, jnp.zeros(()), jnp.asarray(dt))
        X.append(x)
    return jnp.stack(X), jnp.tile(u, (N - 1, 1))


def test_lqr_regulates_to_reference(model):
    p = load_ros_params(PARAM_DIR / "sample_lqr.param.yaml")
    cfg = lqr_config_from_params(p)       # N=20, dt=0.01
    lqr = RacingLQR(cfg, model)
    X_ref, U_ref = make_reference(model, cfg.n, cfg.dt)
    # perturbed initial condition as in test_racing_lqr.cpp:119-122
    x_ic = X_ref[0] + jnp.asarray([1.0, 0.3, 0.01, 0.0, 0.0, 0.0])
    sol = lqr.solve(x_ic, X_ref, U_ref)
    assert sol.X_optm.shape == (cfg.n, 6)
    # N=20 x dt=0.01 is a 0.2 s window at 30 m/s: only the fast (yaw)
    # channel can decay appreciably; position errors barely move.
    dev_yaw = np.abs(np.asarray(sol.X_optm[:, 2] - X_ref[:, 2]))
    assert dev_yaw[-1] < dev_yaw[0] / 3
    # feedback steers against the lateral/yaw deviation
    assert float(sol.U_optm[0, 2]) < -0.01
    # the rollout obeys the nonlinear dynamics exactly (it IS an RK4 rollout)
    from racing_lmpc_tpu.ops.integrators import rk4
    x1 = rk4(model.dynamics, sol.X_optm[0], sol.U_optm[0], jnp.zeros(()),
             jnp.asarray(cfg.dt))
    assert np.allclose(np.asarray(x1), np.asarray(sol.X_optm[1]), atol=1e-5)
    # feedback gains are nontrivial
    assert float(jnp.abs(sol.K_gains).max()) > 0.01


def test_lqr_exact_tracking_from_reference_start(model):
    p = load_ros_params(PARAM_DIR / "sample_lqr.param.yaml")
    cfg = lqr_config_from_params(p)
    lqr = RacingLQR(cfg, model)
    X_ref, U_ref = make_reference(model, cfg.n, cfg.dt)
    sol = lqr.solve(X_ref[0], X_ref, U_ref)
    # starting exactly on the (feasible) reference: controls = reference
    assert np.abs(np.asarray(sol.U_optm - U_ref)).max() < 2.0  # N-scale forces
    assert np.abs(np.asarray(sol.X_optm - X_ref)).max() < 0.05


def test_lqr_mgkt_turn_golden_fixture():
    """Replicates the reference's only LQR fixture (test_racing_lqr.cpp:63-127):
    the go-kart-scale vehicle (sample_vehicle_2) tracking the first second of
    an offline-optimized mgkt turn-4 trajectory (test_data/{x,u,t}_optm.txt),
    resampled to the N=51 / dt=0.02 horizon of sample_lqr_2.param.yaml, from
    an initial state perturbed by (+1.0 m, +0.3 m, +0.01 rad)."""
    from racing_lmpc_tpu.config import DATA_DIR

    p = load_ros_params(
        PARAM_DIR / "sample_vehicle_2_base.param.yaml",
        PARAM_DIR / "sample_vehicle_2_single_track.param.yaml")
    base = vehicle_config_from_params(p)
    base = type(base)(**{**base.__dict__,
                         "modeling": type(base.modeling)(
                             use_frenet=False, integrator_type="rk4",
                             sample_throttle=base.modeling.sample_throttle)})
    st = single_track_config_from_params(p, simplify_lon_control=False)
    gokart = SingleTrackPlanarModel(base, st)

    cfg = lqr_config_from_params(
        load_ros_params(PARAM_DIR / "sample_lqr_2.param.yaml"))
    assert cfg.n == 51 and abs(cfg.dt - 0.02) < 1e-12
    lqr = RacingLQR(cfg, gokart)

    lqr_dir = DATA_DIR / "lqr"
    X_optm = np.loadtxt(lqr_dir / "x_optm.txt")          # (19, 6)
    U_optm = np.loadtxt(lqr_dir / "u_optm.txt")[:, :3]   # (18, 3): FD, FB, STEER
    T_optm = np.loadtxt(lqr_dir / "t_optm.txt")          # (18,) durations
    t_knots = np.concatenate([[0.0], np.cumsum(T_optm)])

    # x_optm rows are (PX, PY, YAW, VYAW, SLIP, V) — the offline optimizer's
    # parametrization (cross-checked against mgkt_turn_4.txt: column 6 is the
    # ~19.3 m/s turn speed).  The reference test feeds them POSITIONALLY into
    # the single-track state (test_racing_lqr.cpp:75,102), silently tracking
    # vx = 0.35 m/s — harmless there because it asserts nothing.  Convert to
    # the single-track layout (PX, PY, YAW, VX, VY, VYAW) so the tracking
    # assertions below are physically meaningful.
    vyaw, slip, v = X_optm[:, 3], X_optm[:, 4], X_optm[:, 5]
    X_optm = np.stack([X_optm[:, 0], X_optm[:, 1], X_optm[:, 2],
                       v * np.cos(slip), v * np.sin(slip), vyaw], axis=1)

    # resample onto the horizon exactly as the reference test does
    t_intp = np.linspace(0.0, 1.0, cfg.n)
    X_ref = np.stack([np.interp(t_intp, t_knots, X_optm[:, j])
                      for j in range(6)], axis=1)
    U_ref = np.stack([np.interp(t_intp[:-1], t_knots[:-1], U_optm[:, j])
                      for j in range(3)], axis=1)

    pert = np.asarray([1.0, 0.3, 0.01, 0.0, 0.0, 0.0])
    sol0 = lqr.solve(X_ref[0], X_ref, U_ref)           # nominal rollout
    sol = lqr.solve(X_ref[0] + pert, X_ref, U_ref)     # perturbed IC

    X0 = np.asarray(sol0.X_optm)
    X = np.asarray(sol.X_optm)
    assert np.all(np.isfinite(X)) and np.all(np.isfinite(np.asarray(sol.U_optm)))
    # Compare perturbed vs NOMINAL closed-loop rollouts (the fixture data is
    # only approximately consistent with this model, so comparing against
    # X_ref directly would measure model-data mismatch, not the feedback).
    # With q_pos = 1 vs r = 0.01 on drive forces of O(100 N), longitudinal
    # error is deliberately cheap to leave; the LATERAL error (closed by
    # steering, which is O(0.05 rad)) must contract.
    diff = X - X0
    yaw0 = X0[:, 2]
    lat = -np.sin(yaw0) * diff[:, 0] + np.cos(yaw0) * diff[:, 1]
    assert abs(lat[-1]) < 0.5 * abs(lat[0])
    # closed-loop stability: the perturbation never amplifies
    pos_dev = np.linalg.norm(diff[:, :2], axis=1)
    assert pos_dev.max() < 1.2 * pos_dev[0]
    # the rollout is an exact RK4 trajectory of the nonlinear model
    from racing_lmpc_tpu.ops.integrators import rk4
    x1 = rk4(gokart.dynamics, jnp.asarray(X[0]), sol.U_optm[0],
             jnp.zeros(()), jnp.asarray(cfg.dt))
    assert np.allclose(np.asarray(x1), X[1], atol=1e-4)
    # speed stays in the physical go-kart envelope while tracking a ~19 m/s turn
    assert 5.0 < X[:, 3].min() and X[:, 3].max() < 30.0


def test_lqr_batched(model):
    p = load_ros_params(PARAM_DIR / "sample_lqr.param.yaml")
    cfg = lqr_config_from_params(p)
    lqr = RacingLQR(cfg, model)
    X_ref, U_ref = make_reference(model, cfg.n, cfg.dt)
    B = 4
    x_ics = jnp.tile(X_ref[0], (B, 1)) + jnp.linspace(0, 1, B)[:, None]
    sols = lqr.solve_batch(x_ics, jnp.tile(X_ref, (B, 1, 1)),
                           jnp.tile(U_ref, (B, 1, 1)))
    assert sols.X_optm.shape == (B, cfg.n, 6)
    single = lqr.solve(x_ics[2], X_ref, U_ref)
    assert np.allclose(np.asarray(sols.u[2]), np.asarray(single.u), atol=1e-4)


# ---------------------------------------------------------------------------
# EKF
# ---------------------------------------------------------------------------

@pytest.fixture()
def ekf(model):
    p = load_ros_params(PARAM_DIR / "sample_ekf.param.yaml")
    cfg = ekf_config_from_params(p)
    return EKFStateEstimator(cfg, model)


def h_pose(x, z):
    return x[:3]


def h_speed(x, z):
    return x[3:4]


def test_ekf_registry_and_exceptions(ekf):
    with pytest.raises(NoObservationRegisteredException):
        ekf.initialize(0)
    ekf.register_observation("pose", 3, h_pose)
    with pytest.raises(ObservationNameAlreadyExistsException):
        ekf.register_observation("pose", 3, h_pose)
    with pytest.raises(EKFUninitializedException):
        ekf.update_observation("pose", 1, np.zeros(3), np.eye(3))
    ekf.initialize(0)
    with pytest.raises(ObservationNameNotFoundException):
        ekf.update_observation("imu", 1, np.zeros(3), np.eye(3))


def test_ekf_converges_to_true_state(model, ekf):
    from racing_lmpc_tpu.ops.integrators import rk4
    ekf.register_observation("pose", 3, h_pose)
    ekf.register_observation("speed", 1, h_speed)
    ekf.initialize(0)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray([0.0, 0.5, 0.1, 1.5, 0.0, 0.0], dtype=jnp.float32)
    u = jnp.asarray([200.0, 0.0, 0.02], dtype=jnp.float32)
    ekf.update_control(u)
    dt = 0.01
    t_ns = 0
    for i in range(100):
        x_true = rk4(model.dynamics, x_true, u, jnp.zeros(()), jnp.asarray(dt))
        t_ns += int(dt * 1e9)
        z_pose = np.asarray(x_true[:3]) + rng.normal(0, 0.01, 3)
        ekf.update_observation("pose", t_ns, z_pose, np.eye(3) * 1e-4)
        if i % 5 == 0:
            z_v = np.asarray(x_true[3:4]) + rng.normal(0, 0.05, 1)
            t_ns += 1
            ekf.update_observation("speed", t_ns, z_v, np.eye(1) * 2.5e-3)
    err = np.abs(np.asarray(ekf.x - x_true))
    assert err[:3].max() < 0.05      # pose tracked
    assert err[3] < 0.3              # speed tracked through mixed updates
    # covariance contracted from the 1e3 prior
    assert float(jnp.diag(ekf.P)[:3].max()) < 1.0


def test_ekf_rejects_nan_observation(model, ekf):
    ekf.register_observation("pose", 3, h_pose)
    ekf.initialize(0)
    x_before = np.asarray(ekf.x)
    out = ekf.update_observation("pose", 10**7, np.array([np.nan, 0, 0]), np.eye(3))
    # fell back to pure prediction: finite state, no NaN contamination
    assert np.all(np.isfinite(np.asarray(out["x"])))
    assert np.all(np.isfinite(np.asarray(out["P"])))


def test_ekf_timestamp_jump_resets_clock(model, ekf):
    ekf.register_observation("pose", 3, h_pose)
    ekf.initialize(10**9)
    ekf.update_observation("pose", 2 * 10**9, np.zeros(3), np.eye(3) * 1e-4)
    # jump backwards: must not integrate a negative dt
    out = ekf.update_observation("pose", 5 * 10**8, np.zeros(3), np.eye(3) * 1e-4)
    assert np.all(np.isfinite(np.asarray(out["x"])))
    assert ekf.nanosec == 5 * 10**8


def test_ekf_state_clipping(model, ekf):
    ekf.register_observation("speed", 1, h_speed)
    ekf.initialize(0)
    # huge speed observation gets clipped to x_max (sample_ekf: vx max 2.0)
    out = ekf.update_observation("speed", 10**6, np.array([100.0]), np.eye(1) * 1e-8)
    assert float(out["x"][3]) <= 2.0 + 1e-6
