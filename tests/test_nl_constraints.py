"""Nonlinear model constraints wired into the QP/SQP (racing_mpc.cpp:126-145).

The reference calls ``model_->add_nlp_constraints`` inside the per-stage
loop of BOTH solver paths: kinematic power  v*fd <= P_max  and drive/brake
exclusivity  (fd*fb)^2 <= 1  (kinematic_bicycle_model.cpp:99-104), and the
double-track's friction-ellipse + v >= 0 rows
(double_track_planar_model.cpp:106-126).  The TPU engine linearizes them at
the RTI reference (one dense row block in the condensed QP) and
re-linearizes each SQP iteration.  These tests are the VERDICT's done
criteria: a kinematic plan at an aggressive velocity reference must hold
v*fd <= P_max, and a double-track plan must keep the friction-ellipse
residuals <= 0 — and in both cases the UNCONSTRAINED solver demonstrably
violates, so the rows are load-bearing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    PARAM_DIR,
    TRACK_DIR,
    barc_mpc_config,
    load_ros_params,
    single_track_config_from_params,
    double_track_config_from_params,
    vehicle_config_from_params,
)
from racing_lmpc_tpu.models import (
    DoubleTrackPlanarModel,
    KinematicBicycleModel,
)
from racing_lmpc_tpu.mpc.racing_mpc import MPCInput, RacingMPC
from racing_lmpc_tpu.track import RacingTrajectory


def _mk_input(mpc, track, x_ic, v0, v_target, dt=0.025):
    """Centerline reference ramping the velocity v0 -> v_target."""
    N, nx, nu = mpc.N, mpc.nx, mpc.nu
    s0 = float(x_ic[0])
    vels = np.linspace(v0, v_target, N)
    s_hor = s0 + np.cumsum(np.concatenate([[0.0], vels[:-1] * dt]))
    X_ref = np.zeros((N, nx), dtype=np.float32)
    X_ref[:, 0] = s_hor
    X_ref[:, mpc.idx_vel] = vels
    s_j = jnp.asarray(s_hor, jnp.float32)
    K = mpc.K
    return MPCInput(
        x_ic=jnp.asarray(x_ic, jnp.float32),
        u_ic=jnp.zeros((nu,), jnp.float32),
        X_ref=jnp.asarray(X_ref),
        U_ref=jnp.zeros((N - 1, nu), jnp.float32),
        T_ref=jnp.full((N - 1,), dt, jnp.float32),
        bound_left=track.left_boundary(s_j),
        bound_right=track.right_boundary(s_j),
        total_length=jnp.asarray(track.total_length, jnp.float32),
        curvatures=track.curvature(s_j),
        vel_ref=jnp.asarray(vels, jnp.float32),
        ss_x=jnp.zeros((K, nx), jnp.float32),
        ss_j=jnp.zeros((K,), jnp.float32))


@pytest.fixture(scope="module")
def kin_setup():
    p = load_ros_params(PARAM_DIR / "barc_base.param.yaml",
                        PARAM_DIR / "barc_single_track.param.yaml")
    base = vehicle_config_from_params(p)
    # the BARC yaml's 550 W engine cap never binds at fd_max*v_max = 30 W;
    # lower it so the limit is actually exercised (same schema/loader)
    cfg = single_track_config_from_params(
        p, simplify_lon_control=False, p_max=1.2)
    model = KinematicBicycleModel(base, cfg)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    eye3 = tuple(np.eye(3).ravel() * 0.01)
    mpc_cfg = barc_mpc_config(
        "barc_tracking_mpc", n=14, learning=False,
        r=eye3, r_d=eye3, q_vel=8.0,
        x_min=(), x_max=(), u_min=(), u_max=())
    return model, track, mpc_cfg


def test_kinematic_power_constraint_enforced(kin_setup):
    model, track, mpc_cfg = kin_setup
    p_max = model.config.p_max
    assert p_max > 0
    mpc = RacingMPC(mpc_cfg, model)
    assert mpc.layout.n_nl == 2
    mpc.validate_struct(_mk_input(mpc, track, [0.5, 0.0, 0.0, 1.0], 1.0, 2.0))

    # aggressive acceleration: unconstrained power demand m*a*v far over
    # P_max at the top of the ramp
    x_ic = [0.5, 0.0, 0.0, 1.6]
    inp = _mk_input(mpc, track, x_ic, 1.6, 3.2)
    out, _ = mpc.solve_sqp(inp, iters=6)
    X, U = np.asarray(out.X_optm), np.asarray(out.U_optm)
    power = X[:-1, 3] * U[:, 0]
    assert power.max() <= p_max * 1.03 + 1e-6, (
        f"power violated: {power.max()} > {p_max}")
    # exclusivity: |fd*fb| <= 1 within linearization tolerance
    assert np.abs(U[:, 0] * U[:, 1]).max() <= 1.1

    # the rows are load-bearing: without them the same scenario demands
    # more power than P_max
    model_free = KinematicBicycleModel(model.base_config, model.config)
    model_free.n_nl = 0
    mpc_free = RacingMPC(mpc_cfg, model_free)
    out_f, _ = mpc_free.solve_sqp(inp, iters=6)
    Xf, Uf = np.asarray(out_f.X_optm), np.asarray(out_f.U_optm)
    assert (Xf[:-1, 3] * Uf[:, 0]).max() > p_max * 1.1, (
        "scenario does not exercise the power limit; tighten it")


@pytest.fixture(scope="module")
def dt_setup():
    p = load_ros_params(PARAM_DIR / "sample_vehicle_base.param.yaml",
                        PARAM_DIR / "sample_vehicle_double_track.param.yaml")
    base = vehicle_config_from_params(p)
    cfg = double_track_config_from_params(p)
    model = DoubleTrackPlanarModel(base, cfg)
    track = RacingTrajectory.from_file(
        TRACK_DIR / "putnam" / "10_putnam_optm.txt")
    eye3 = tuple((np.eye(3) * np.array([1e-7, 1e-7, 0.05])).ravel())
    mpc_cfg = barc_mpc_config(
        "iac_car_tracking_mpc", n=10, learning=False,
        r=eye3, r_d=eye3, q_vel=20.0, q_boundary=1000.0,
        q_contour=50.0, q_heading=20.0,
        x_min=(), x_max=(), u_min=(), u_max=())
    return model, track, mpc_cfg


def test_double_track_friction_ellipse_enforced(dt_setup):
    model, track, mpc_cfg = dt_setup
    mpc = RacingMPC(mpc_cfg, model)
    assert mpc.layout.n_nl == 7

    # brake hard INTO the tightest Putnam corner: the combined Fx+Fy
    # demand exceeds the ellipse unless the solver moderates the braking
    # (pure cornering alone cannot violate it: the Pacejka peak
    # sin(C atan(...)) stays under mu Fz for C < 2)
    curv = np.asarray(track.curvature_np(np.linspace(0, track.total_length, 2000)))
    s_corner = float(np.linspace(0, track.total_length, 2000)[np.argmax(np.abs(curv))])
    x_ic = [s_corner - 10.0, 0.0, 0.0, 0.0, 0.0, 55.0]
    inp = _mk_input(mpc, track, x_ic, 55.0, 15.0, dt=0.04)
    # 8 SQP re-linearizations: at 6 the linearized-ellipse residual sits
    # right at the 5% gate (measured 5.3% after the round-4 solver rework;
    # 8 -> 1.4%, 10 -> 0.4%)
    out, _ = mpc.solve_sqp(inp, iters=8)
    X, U = np.asarray(out.X_optm), np.asarray(out.U_optm)
    ell = np.stack([np.asarray(model.friction_ellipse(
        jnp.asarray(X[i]), jnp.asarray(U[i]))) for i in range(mpc.N - 1)])
    assert ell.max() <= 0.05, f"friction ellipse violated: {ell.max()}"
    assert X[:, 5].min() >= -1e-3, "v >= 0 violated"

    # load-bearing check: unconstrained plan exceeds the ellipse
    model_free = DoubleTrackPlanarModel(model.base_config, model.config)
    model_free.n_nl = 0
    mpc_free = RacingMPC(mpc_cfg, model_free)
    out_f, _ = mpc_free.solve_sqp(inp, iters=6)
    Xf, Uf = np.asarray(out_f.X_optm), np.asarray(out_f.U_optm)
    ell_f = np.stack([np.asarray(model_free.friction_ellipse(
        jnp.asarray(Xf[i]), jnp.asarray(Uf[i]))) for i in range(mpc.N - 1)])
    assert ell_f.max() > 0.05, (
        "scenario does not exercise the friction ellipse; tighten it")
