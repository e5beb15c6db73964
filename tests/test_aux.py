"""Auxiliary-subsystem tests: telemetry, msgs, transforms, visualizer,
vanilla controller, launch runner."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import TRACK_DIR, barc_vehicle
from racing_lmpc_tpu.control.pid import PidCoefficients, PidController
from racing_lmpc_tpu.control.telemetry import CycleProfiler, Logger, LogLevel
from racing_lmpc_tpu.control.vanilla import VanillaController, VanillaControllerConfig
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.msgs import MPCTelemetry, VehicleStateMsg
from racing_lmpc_tpu.ops.transform import (
    calc_yaw_difference,
    heading_from_quaternion,
    quaternion_from_heading,
)
from racing_lmpc_tpu.track import RacingTrajectory
from racing_lmpc_tpu.track.visualizer import TrajectoryVisualizer


@pytest.fixture(scope="module")
def barc_track():
    return RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")


def test_cycle_profiler_window_and_warn():
    p = CycleProfiler(capacity=5)
    for v in [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]:
        p.add_cycle_stats(v)
    prof = p.profile()
    # window of 5: the 1.0 fell out
    assert prof.min == 2.0 and prof.max == 6.0 and prof.mean == 4.0
    d = prof.to_diagnostic_status("solve", "ms", warn_threshold=5.0)
    assert d["level"] == "WARN"
    d2 = prof.to_diagnostic_status("solve", "ms", warn_threshold=10.0)
    assert d2["level"] == "OK"


def test_logger_callbacks():
    log = Logger()
    seen = []
    log.register_callback(lambda lvl, msg: seen.append((lvl, msg)))
    log.send_log(LogLevel.WARN, "hello")
    assert seen == [(LogLevel.WARN, "hello")]


def test_pid_integral_clamp():
    pid = PidController("t", PidCoefficients(
        k_p=1.0, k_i=1.0, k_d=0.0, min_cmd=-10, max_cmd=10, min_i=-0.5, max_i=0.5))
    for _ in range(100):
        out = pid.update(1.0, 0.1)
    assert pid.integral_error == 0.5     # clamped
    assert out == 1.5                    # p=1 + i=0.5


def test_quaternion_roundtrip():
    for yaw in [-3.0, -1.0, 0.0, 0.5, 2.9]:
        q = quaternion_from_heading(yaw)
        assert np.isclose(heading_from_quaternion(*q), yaw, atol=1e-9)
    assert np.isclose(calc_yaw_difference(3.0, -3.0), 0.2831853, atol=1e-5)


def test_msgs_serialize():
    msg = VehicleStateMsg(t=1.0)
    msg.p.s = 5.0
    d = msg.to_dict()
    assert d["p"]["s"] == 5.0
    json.dumps(d)  # JSON-serializable
    tel = MPCTelemetry(solved=True, state=[1.0], control=[0.1])
    json.dumps(tel.to_dict())


def test_visualizer_polylines(barc_track):
    vis = TrajectoryVisualizer(barc_track, num_samples=200)
    lines = vis.polylines()
    assert lines["center"].shape == (200, 2)
    # boundaries bracket the centerline: left on the left of heading
    widths = np.linalg.norm(lines["left"] - lines["right"], axis=-1)
    assert np.all(widths > 0.5) and np.all(widths < 2.0)
    # prediction path conversion
    X = np.zeros((5, 6), dtype=np.float32)
    X[:, 0] = np.linspace(0, 1, 5)
    path = vis.prediction_path(X)
    assert path.shape == (5, 3)
    poly = vis.vehicle_polygon(np.array([0.0, 0.0, np.pi / 2]), 0.3, 0.2)
    assert poly.shape == (4, 2)
    assert np.isclose(np.abs(poly[:, 1]).max(), 0.15, atol=1e-6)


def test_vanilla_controller_steers_toward_raceline(barc_track):
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    cfg = VanillaControllerConfig(
        lookahead_speed_ratio=0.5, min_lookahead_distance=0.5,
        max_lookahead_distance=2.0,
        lon_pid_coeffs=PidCoefficients(k_p=2.0, k_i=0.0, k_d=0.0,
                                       min_cmd=-10, max_cmd=10,
                                       min_i=-1, max_i=1),
        dt=0.025)
    ctrl = VanillaController(cfg, model, barc_track)
    # left of the centerline, aligned: pure pursuit must steer right
    x = np.array([1.0, 0.3, 0.0, 1.5, 0.0, 0.0])
    u = ctrl.solve(x, vel_ref=2.0)
    assert u[2] < -0.01
    # slower than reference speed: positive drive force
    assert u[0] > 0.0 and u[1] == 0.0
    # right of centerline: steer left
    x2 = np.array([1.0, -0.3, 0.0, 1.5, 0.0, 0.0])
    u2 = ctrl.solve(x2, vel_ref=2.0)
    assert u2[2] > 0.01
    # overspeed: braking
    u3 = ctrl.solve(np.array([1.0, 0.0, 0.0, 4.0, 0.0, 0.0]), vel_ref=1.0)
    assert u3[1] < 0.0 and u3[0] == 0.0


def test_launch_runner_barc_tracking():
    from racing_lmpc_tpu.launch import sim_barc_tracking_mpc
    cosim = sim_barc_tracking_mpc(n_override=10)
    summary = cosim.run(60)
    assert summary["fallback_rate"] < 0.3
    # telemetry recorded with solve times
    assert len(cosim.telemetry) == 60
    assert all(t.solve_time > 0 for t in cosim.telemetry)
    # the vehicle moved along the track
    assert cosim._last_s > 1.5


def test_visualizer_plot_run(tmp_path):
    from racing_lmpc_tpu.config import TRACK_DIR
    from racing_lmpc_tpu.track import RacingTrajectory
    from racing_lmpc_tpu.track.visualizer import TrajectoryVisualizer
    import numpy as np

    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    viz = TrajectoryVisualizer(track, num_samples=200)
    xy = np.asarray(viz.polylines()["center"][:50])
    out = tmp_path / "lap.png"
    viz.plot_run(xy, out, speeds=np.linspace(1, 3, 50), title="test lap")
    assert out.stat().st_size > 10_000


def test_xprof_trace(tmp_path):
    import glob
    import jax.numpy as jnp
    from racing_lmpc_tpu.control.telemetry import XprofTrace

    with XprofTrace(tmp_path):
        jnp.ones(8).sum().block_until_ready()
    assert glob.glob(str(tmp_path / "**" / "*.pb"), recursive=True)


def test_norm_2_broadcasts():
    from racing_lmpc_tpu.ops import norm_2
    v = jnp.asarray([[3.0, 4.0], [5.0, 12.0]])
    np.testing.assert_allclose(np.asarray(norm_2(v)), [5.0, 13.0], rtol=1e-6)


def test_legacy_lmpc_tracks_centerline(barc_track):
    """RacingLMPCLegacy (racing_lmpc.cpp parity): a full-dynamics SQP solve
    on the BARC centerline returns an in-bounds, dynamics-consistent plan."""
    from racing_lmpc_tpu.control import RacingLMPCLegacy, RacingLMPCLegacyConfig

    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    cfg = RacingLMPCLegacyConfig(
        n=10, margin=0.1, average_track_width=1.0,
        q_contour=1.0, q_heading=1.0, q_vel=0.2, q_boundary=100.0,
        r=(0.01, 0.0, 0.0, 0.01),
        x_max=(np.inf, np.inf, np.inf, 6.0, 1.0, 3.0),
        x_min=(-np.inf, -np.inf, -np.inf, 0.1, -1.0, -3.0),
        u_max=(0.01, 0.33), u_min=(-0.01, -0.33),
        sqp_iters=4)
    ctrl = RacingLMPCLegacy(cfg, model, barc_track)

    dt, v_ref = 0.025, 1.5
    s_hor = v_ref * dt * np.arange(cfg.n)
    X_ref = np.zeros((cfg.n, 6), dtype=np.float32)
    X_ref[:, 0] = s_hor
    X_ref[:, 3] = v_ref
    x_ic = np.array([0.0, 0.05, 0.0, 1.2, 0.0, 0.0], dtype=np.float32)
    out = ctrl.solve(x_ic, X_ref, np.zeros((cfg.n - 1, 2), np.float32), dt)

    X = np.asarray(out.X_optm)
    U = np.asarray(out.U_optm)
    assert np.all(np.isfinite(X)) and np.all(np.isfinite(U))
    # controls within the box (small tolerance for the QP's soft handling)
    assert np.all(U[:, 0] <= 0.011) and np.all(U[:, 0] >= -0.011)
    assert np.all(np.abs(U[:, 1]) <= 0.34)
    # the reported X is the nonlinear rollout of U (exact dynamics hold)
    x = jnp.asarray(x_ic)
    for i in range(cfg.n - 1):
        k = barc_track.curvature(x[0])
        x = model.discrete_dynamics(x, jnp.asarray(U[i]), k,
                                    jnp.asarray(dt, jnp.float32))
    np.testing.assert_allclose(np.asarray(x), X[-1], atol=1e-5)
    # it actually tracks: stays within the track and near the reference speed
    assert np.max(np.abs(X[:, 1])) < 0.5
    assert abs(X[-1, 3] - v_ref) < 1.0
