"""End-to-end closed-loop tests: MPCController + RacingSimulator on BARC.

This is the in-process equivalent of the reference's two-node lock-step
co-simulation (racing_simulator_node <-> racing_mpc_node in "step" mode) —
the gate for the tracking-MPC vertical slice (SURVEY.md section 7, stage 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    SimulatorConfig,
    TRACK_DIR,
    barc_mpc_config,
    barc_vehicle,
)
from racing_lmpc_tpu.control.loop import MPCController
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.sim import RacingSimulator
from racing_lmpc_tpu.track import RacingTrajectory


@pytest.fixture(scope="module")
def stack():
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    return model, track


def run_loop(model, track, x0, steps, n_horizon=10, dt=0.025):
    cfg = barc_mpc_config("barc_tracking_mpc", n=n_horizon, learning=False,
                          step_mode="step")
    ctrl = MPCController(cfg, model, track, dt)
    sim = RacingSimulator(SimulatorConfig(dt=dt, x0=tuple(x0)), model, track)
    info = ctrl.step(sim.x)
    fallbacks = 0
    lat, speeds = [], []
    for _ in range(steps):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
        lat.append(float(sim.x[1]))
        speeds.append(float(sim.x[3]))
    return sim, ctrl, fallbacks, np.array(lat), np.array(speeds)


def test_tracking_lap_segment(stack):
    model, track = stack
    sim, ctrl, fallbacks, lat, speeds = run_loop(
        model, track, (0.1, 0.05, 0.02, 0.8, 0.0, 0.0), steps=150)
    # Below ~1.2 m/s the RK4-linearized yaw channel is per-step unstable
    # (|R(lambda*dt)| > 1), which can make the affine QP infeasible — the
    # reference hits the same wall and keeps flying the previous plan
    # (racing_mpc.cpp:358-371); we allow those early fallbacks but the loop
    # must recover and keep the car on track.  Budgets at measured+margin
    # (VERDICT r4 next #7: measured fallbacks=1, lat_max=0.072): a 2x
    # regression on either now fails the FAST suite.
    assert fallbacks <= 5
    assert np.abs(lat).max() < 0.30  # half-width 0.45; measured 0.072
    # it accelerates toward the speed limit and makes progress
    assert speeds[-1] > 2.0
    assert speeds.max() < 4.0  # speed limit is 6, raceline speed ~3.5-5


def test_deviated_start_recovers(stack):
    model, track = stack
    sim, ctrl, fallbacks, lat, speeds = run_loop(
        model, track, (0.1, 0.3, 0.0, 0.8, 0.0, 0.0), steps=150)
    # measured fallbacks=2, lat_max=0.300 (the initial offset itself)
    assert fallbacks <= 5
    # pulled back toward the centerline
    assert abs(lat[-1]) < 0.15
    assert np.abs(lat).max() < 0.32  # must not overshoot past the start


def test_simulator_rollout_batched(stack):
    model, track = stack
    sim = RacingSimulator(SimulatorConfig(dt=0.01), model, track)
    x0 = jnp.asarray(np.tile([0.1, 0.0, 0.0, 1.0, 0.0, 0.0], (8, 1)),
                     dtype=jnp.float32)
    us = jnp.zeros((8, 50, 3), dtype=jnp.float32)
    traj = sim.rollout(x0, us)
    assert traj.shape == (8, 50, 6)
    assert bool(jnp.all(jnp.isfinite(traj)))
    # rolling resistance decelerates the coasting car
    assert float(traj[0, -1, 3]) < 1.0
    # abscissa stays wrapped
    assert float(jnp.abs(traj[..., 0]).max()) <= track.total_length


def test_trajectory_hot_swap(stack):
    """Raceline switch mid-run with frenet re-projection of the stored plan
    (racing_mpc_node.cpp change_trajectory, :509-571) via TrajectoryCommand
    handling (:131-148,479-507)."""
    from racing_lmpc_tpu.msgs import TrajectoryCommand
    from racing_lmpc_tpu.track import RacingTrajectoryMap

    model, track = stack
    tmap = RacingTrajectoryMap(TRACK_DIR / "barc")
    idxs = tmap.indices()
    assert len(idxs) >= 2
    cfg = barc_mpc_config("barc_tracking_mpc", n=10, learning=False,
                          step_mode="step")
    ctrl = MPCController(cfg, model, tmap.get_trajectory(idxs[0]), 0.025)
    sim = RacingSimulator(
        SimulatorConfig(dt=0.025, x0=(0.1, 0.05, 0.0, 1.5, 0.0, 0.0)),
        model, tmap.get_trajectory(idxs[0]))
    info = ctrl.step(sim.x)
    for _ in range(20):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
    X_before = np.asarray(ctrl.state.last_X)

    # switch to the optimal raceline + tighten the speed limit
    ctrl.on_trajectory_command(
        TrajectoryCommand(trajectory_index=idxs[1], speed_limit=2.5,
                          velocity_profile_scale=0.9), tmap)
    assert ctrl.track is tmap.get_trajectory(idxs[1])
    assert ctrl.speed_limit == 2.5 and ctrl.speed_scale == 0.9
    # plan re-projected: global positions preserved across frames
    X_after = np.asarray(ctrl.state.last_X)
    g_old = np.asarray(jnp.stack([
        tmap.get_trajectory(idxs[0]).frenet_to_global(jnp.asarray(p))
        for p in X_before[:, :3]]))
    g_new = np.asarray(jnp.stack([
        tmap.get_trajectory(idxs[1]).frenet_to_global(jnp.asarray(p))
        for p in X_after[:, :3]]))
    assert np.abs(g_old[:, :2] - g_new[:, :2]).max() < 5e-3
    # body velocities untouched
    np.testing.assert_allclose(X_after[:, 3:], X_before[:, 3:], atol=1e-6)

    # the loop keeps flying on the new raceline
    fallbacks = 0
    lat = []
    for _ in range(40):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
        lat.append(float(sim.x[1]))
    assert fallbacks <= 10


def test_kinematic_bicycle_closed_loop():
    """BASELINE config-1 gate: kinematic bicycle (nx=4, nu=3) through the
    full MPC stack on the BARC oval — exercises the nu=3 scaling, bounds,
    and base-control conversion paths the single-track launches skip."""
    from racing_lmpc_tpu.config import PARAM_DIR, load_ros_params
    from racing_lmpc_tpu.models.factory import load_vehicle_model

    params = load_ros_params(PARAM_DIR / "barc_base.param.yaml",
                             PARAM_DIR / "barc_single_track.param.yaml")
    model = load_vehicle_model("kinematic_bicycle_model", params)
    assert (model.nx, model.nu) == (4, 3)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    r3 = (1e-3, 0, 0, 0, 1e-3, 0, 0, 0, 1.0)
    rd3 = (1e-2, 0, 0, 0, 1e-2, 0, 0, 0, 1.0)
    cfg = barc_mpc_config("barc_tracking_mpc", n=10, learning=False,
                          step_mode="step", r=r3, r_d=rd3,
                          x_max=(), x_min=(), u_max=(), u_min=())
    ctrl = MPCController(cfg, model, track, 0.025)
    sim = RacingSimulator(SimulatorConfig(dt=0.025, x0=(0.1, 0.05, 0.0, 1.0)),
                          model, track)
    info = ctrl.step(sim.x)
    fallbacks, lat = 0, []
    for _ in range(60):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
        lat.append(abs(float(sim.x[1])))
    assert fallbacks <= 5
    assert max(lat) < 0.2          # stays near the centerline
    assert float(sim.x[3]) > 1.0   # makes progress


def test_double_track_closed_loop():
    """Double-track (PX, PY, YAW, VYAW, SLIP, V layout) through the full MPC
    stack: exercises the model-declared cost-index/state-scale mapping (the
    default positional map would put the velocity weight on VYAW)."""
    from racing_lmpc_tpu.config import PARAM_DIR, load_ros_params
    from racing_lmpc_tpu.models.factory import load_vehicle_model

    params = load_ros_params(PARAM_DIR / "barc_base.param.yaml",
                             PARAM_DIR / "barc_double_track.param.yaml")
    model = load_vehicle_model("double_track_planar_model", params)
    assert (model.nx, model.nu) == (6, 3)
    b = model.control_bounds()
    assert b.u_ub[0] > 0.0, "fd_max must load from the double_track section"
    ci = model.cost_state_indices()
    assert ci["vel"] == 5 and ci["vyaw"] == 3 and ci["vy"] is None
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    r3 = (1e-3, 0, 0, 0, 1e-3, 0, 0, 0, 1.0)
    rd3 = (1e-2, 0, 0, 0, 1e-2, 0, 0, 0, 1.0)
    # n=25 @ dt=0.01 keeps a 0.25 s lookahead — with a 0.1 s horizon the
    # contour cost barely responds to steering and the solver sits at zero
    cfg = barc_mpc_config("barc_tracking_mpc", n=25, learning=False,
                          step_mode="step", r=r3, r_d=rd3,
                          x_max=(), x_min=(), u_max=(), u_min=())
    # dt=0.01: the yaw-rate channel is STIFF at low speed (continuous pole
    # ~ -240/s at 1 m/s for the BARC car) and explicit RK4 is unstable
    # beyond |a dt| ~ 2.8 — at the launches' 0.025 s the discrete A[3,3]
    # reaches ~30/step and no controller can track through it
    ctrl = MPCController(cfg, model, track, 0.01)
    sim = RacingSimulator(
        SimulatorConfig(dt=0.01, x0=(0.1, 0.05, 0.0, 0.0, 0.0, 1.0)),
        model, track)
    info = ctrl.step(sim.x)
    fallbacks, lat = 0, []
    # 150 steps (1.5 s): the rate-cost-limited drive ramp lets v sag to
    # ~0.95 over the first half second before the controller pulls it back
    for _ in range(150):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
        lat.append(abs(float(sim.x[1])))
    assert fallbacks <= 5
    assert max(lat) < 0.2            # stays near the centerline
    assert float(sim.x[5]) > 1.0     # makes progress (V is index 5)
