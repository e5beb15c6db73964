"""Full LMPC closed-loop test: safe-set terminal constraint on BARC.

The in-process equivalent of the reference's sim_barc_lmpc launch: BARC
single-track vehicle, the center track, LMPC with the 3 recorded safe-set
laps loaded at startup (sim_barc_lmpc.launch.py:39-41,87-88).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    SS_DIR,
    SimulatorConfig,
    TRACK_DIR,
    barc_mpc_config,
    barc_vehicle,
)
from racing_lmpc_tpu.control.loop import MPCController
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.sim import RacingSimulator
from racing_lmpc_tpu.track import RacingTrajectory

BARC_LAPS = tuple(str(SS_DIR / "barc" / f"ss_lap_{i}") for i in (1, 2, 3))


@pytest.fixture(scope="module")
def lmpc_stack():
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    cfg = barc_mpc_config(
        "barc_lmpc", n=20, learning=True, step_mode="step",
        num_ss_pts=48, num_ss_pts_per_lap=16,
        load=True, load_path=BARC_LAPS)
    ctrl = MPCController(cfg, model, track, 0.025)
    return model, track, cfg, ctrl


def test_lmpc_config(lmpc_stack):
    model, track, cfg, ctrl = lmpc_stack
    assert cfg.learning
    assert ctrl.mpc.K == 48
    assert ctrl.mpc.has_hull_slack  # barc_lmpc convex_hull_slack nonzero


def test_lmpc_closed_loop(lmpc_stack):
    model, track, cfg, ctrl = lmpc_stack
    # start on the recorded-lap speed range so the safe set is reachable
    x0 = (0.1, 0.04, 0.0, 1.9, 0.0, 0.0)
    sim = RacingSimulator(SimulatorConfig(dt=0.025, x0=x0), model, track)
    info = ctrl.step(sim.x, u_ic=jnp.zeros(2))
    # safe set was loaded lazily on first step
    assert ctrl.ss_manager.num_laps == 3
    fallbacks = 0
    lam_sums = []
    for i in range(120):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
        lam_sums.append(float(jnp.sum(info.output.convex_combi)))
    x = np.asarray(sim.x)
    # solver healthy; convex combination stays on the simplex.  Budgets at
    # measured+margin (VERDICT r4 next #7: measured fallbacks=0,
    # lat_max=0.099): a 2-3x regression now fails the FAST suite.
    assert fallbacks <= 4
    ok_lams = [s for s in lam_sums if abs(s - 1.0) < 1e-2]
    assert len(ok_lams) > 100
    # car on track and making progress at racing speed
    assert abs(x[1]) < 0.30
    assert x[3] > 1.2
    # terminal state lies near the safe-set convex hull
    out = info.output
    hull_pt = out.convex_combi @ ctrl._query_safe_set(ctrl.state.last_X[-1])[0]
    gap = np.abs(np.asarray(out.X_optm[-1]) - np.asarray(hull_pt))
    assert gap[:3].max() < 0.5  # position/heading nearly in the hull


def test_lmpc_records_new_laps(lmpc_stack):
    model, track, cfg, ctrl = lmpc_stack
    # the recorder sees states each step; force a wrap to close a lap
    rec = ctrl.ss_recorder
    laps_before = rec.lap_count
    L = track.total_length
    t0 = ctrl._time
    for i, s in enumerate(np.linspace(L - 0.5, L + 0.6, 12) % L):
        rec.step(np.array([s, 0.0, 0.0, 2.0, 0.0, 0.0]), np.zeros(2),
                 0.0, t0 + i * 0.025, L)
    assert rec.lap_count > laps_before


def test_lmpc_with_error_regression(lmpc_stack):
    """Error-dynamics regression enabled (paper headline; RegQuery path):
    the corrections stay small/finite and the closed loop keeps running."""
    from racing_lmpc_tpu.control.loop import MPCController, RegressionSpec

    model, track, cfg, _ = lmpc_stack
    spec = RegressionSpec(
        dist_max=3.0,
        groups=(((3, 4, 5), (0, 1), 4),    # vy error from (vx, vy, w, u)
                ((3, 4, 5), (0, 1), 5)))   # yaw-rate error
    ctrl = MPCController(cfg, model, track, 0.025, regression=spec)
    sim = RacingSimulator(
        SimulatorConfig(dt=0.025, x0=(0.1, 0.04, 0.0, 1.9, 0.0, 0.0)),
        model, track)
    info = ctrl.step(sim.x, u_ic=jnp.zeros(2))
    assert ctrl.ss_manager.num_laps == 3
    regs = ctrl._query_regression(np.asarray(sim.x), np.zeros(2))
    assert regs is not None
    dA, dB, dC = [np.asarray(r) for r in regs]
    assert np.all(np.isfinite(dA)) and np.all(np.isfinite(dB))
    # corrections only touch the requested output rows
    assert np.abs(dA[[0, 1, 2, 3]]).max() == 0.0
    assert np.abs(dA[[4, 5]]).sum() > 0.0
    fallbacks = 0
    for _ in range(40):
        sim.step(info.u_base)
        info = ctrl.step(sim.x, u_ic=info.u_apply)
        fallbacks += int(bool(info.used_fallback))
    x = np.asarray(sim.x)
    assert fallbacks <= 10
    assert abs(x[1]) < 0.45 and np.all(np.isfinite(x))
