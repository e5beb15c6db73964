"""Vehicle-model tests: construction, dynamics sanity, Jacobian consistency.

Mirrors the reference's model smoke tests (test_single_track_planar_model.cpp)
but with numeric assertions: finite-difference Jacobian checks, physical
invariants (straight-line driving, curvature response), and base-state
round-trips at the two shipped vehicle scales (BARC 1:10 and IAC car).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    barc_vehicle,
    iac_vehicle,
    load_ros_params,
    PARAM_DIR,
    double_track_config_from_params,
    single_track_config_from_params,
    vehicle_config_from_params,
)
from racing_lmpc_tpu.models import (
    DoubleTrackPlanarModel,
    KinematicBicycleModel,
    SingleTrackPlanarModel,
    load_vehicle_model,
)


@pytest.fixture(scope="module")
def barc_model():
    base, st = barc_vehicle()
    return SingleTrackPlanarModel(base, st)


@pytest.fixture(scope="module")
def iac_model():
    base, st = iac_vehicle()
    return SingleTrackPlanarModel(base, st)


def finite_diff_jac(f, x, eps=1e-3):
    # eps sized for float32 evaluations: ulp-noise/eps ~1e-2 absolute on O(100)
    # outputs, truncation O(eps^2); tolerances below account for both.
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x))
    J = np.zeros((y0.size, x.size))
    for i in range(x.size):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        J[:, i] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return J


def test_barc_config_values(barc_model):
    # spot-check YAML ingestion against barc_base.param.yaml
    cfg = barc_model.base_config
    assert cfg.chassis.total_mass == 2.2187
    assert cfg.chassis.wheel_base == 0.324
    assert cfg.front_tyre.pacejka_b == 5.0
    assert cfg.rear_tyre.pacejka_fz0 == 1886.5
    assert cfg.modeling.use_frenet is True
    assert cfg.modeling.integrator_type == "rk4"
    assert barc_model.config.simplify_lon_control is True
    assert barc_model.nu == 2
    assert len(cfg.powertrain.rpm) == 71
    assert len(cfg.powertrain.torque) == 71 * 7


def test_single_track_straight_line(barc_model):
    # driving straight with zero input: decelerates from rolling resistance only
    x = jnp.array([0.0, 0.0, 0.0, 1.5, 0.0, 0.0])
    u = jnp.zeros(2)
    xd = np.asarray(barc_model.dynamics(x, u, jnp.array(0.0)))
    assert np.isclose(xd[0], 1.5, atol=1e-6)      # s_dot = vx
    assert np.isclose(xd[1], 0.0, atol=1e-6)      # t_dot = 0
    assert np.isclose(xd[2], 0.0, atol=1e-6)      # no yaw rate
    assert xd[3] < 0.0                            # rolling resistance decelerates
    assert np.isclose(xd[4], 0.0, atol=1e-6)
    assert np.isclose(xd[5], 0.0, atol=1e-6)


def test_single_track_drive_force(barc_model):
    # positive lon command accelerates: fd+fb = lon*1000 (smooth split)
    x = jnp.array([0.0, 0.0, 0.0, 1.5, 0.0, 0.0])
    lon = 0.005
    u = jnp.array([lon, 0.0])
    xd = np.asarray(barc_model.dynamics(x, u, jnp.array(0.0)))
    m = barc_model.base_config.chassis.total_mass
    fr = barc_model.base_config.chassis.fr
    fd = lon * (np.tanh(lon) * 0.5 + 0.5) * 1000
    fb = lon * (np.tanh(-lon) * 0.5 + 0.5) * 1000
    expected_ax = (fd + fb - fr * m * 9.8) / m
    assert np.isclose(xd[3], expected_ax, rtol=1e-5)


def test_single_track_steering_turns_left(barc_model):
    x = jnp.array([0.0, 0.0, 0.0, 1.5, 0.0, 0.0])
    u = jnp.array([0.0, 0.2])
    xd = np.asarray(barc_model.dynamics(x, u, jnp.array(0.0)))
    assert xd[5] > 0.0  # positive yaw acceleration for left steer
    assert xd[4] > 0.0  # lateral acceleration toward the left


def test_frenet_curvature_coupling(barc_model):
    # on a left curve at centerline: xi_dot = -k*s_dot when omega=0
    x = jnp.array([0.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    u = jnp.zeros(2)
    k = 0.5
    xd = np.asarray(barc_model.dynamics(x, u, jnp.array(k)))
    assert np.isclose(xd[0], 2.0, atol=1e-6)          # t=0 -> s_dot = vx
    assert np.isclose(xd[2], -k * 2.0, atol=1e-6)
    # off centerline: s_dot = vx / (1 - t k)
    x2 = x.at[1].set(0.4)
    xd2 = np.asarray(barc_model.dynamics(x2, u, jnp.array(k)))
    assert np.isclose(xd2[0], 2.0 / (1 - 0.4 * k), atol=1e-5)


@pytest.mark.parametrize("fixture", ["barc", "iac"])
def test_jacobians_match_finite_difference(fixture, barc_model, iac_model):
    model = barc_model if fixture == "barc" else iac_model
    rng = np.random.default_rng(3)
    x = jnp.array([1.0, 0.05, 0.02, 2.0, 0.1, 0.3]) if fixture == "barc" else \
        jnp.array([10.0, 0.5, 0.05, 30.0, 0.5, 0.2])
    u = jnp.array([0.004, 0.1]) if model.nu == 2 else jnp.array([500.0, 0.0, 0.05])
    k = jnp.array(0.1)
    A, B = model.dynamics_jacobian(x, u, k)
    A_fd = finite_diff_jac(lambda xv: model.dynamics(jnp.array(xv), u, k), x)
    B_fd = finite_diff_jac(lambda uv: model.dynamics(x, jnp.array(uv), k), u)
    scale_A = np.maximum(np.abs(A_fd), 1.0)
    scale_B = np.maximum(np.abs(B_fd), 1.0)
    assert np.max(np.abs(np.asarray(A) - A_fd) / scale_A) < 2e-2
    assert np.max(np.abs(np.asarray(B) - B_fd) / scale_B) < 2e-2


def test_discrete_jacobian_affine_remainder(barc_model):
    x = jnp.array([1.0, 0.05, 0.02, 2.0, 0.1, 0.3])
    u = jnp.array([0.004, 0.1])
    k = jnp.array(0.1)
    dt = jnp.array(0.025)
    A, B, g = barc_model.discrete_dynamics_jacobian(x, u, k, dt)
    xp = barc_model.discrete_dynamics(x, u, k, dt)
    # A x + B u + g reproduces the integrator exactly at the linearization point
    assert np.allclose(np.asarray(A @ x + B @ u + g), np.asarray(xp), atol=1e-6)


def test_rk4_convergence_order(barc_model):
    # BARC yaw dynamics are stiff (|lambda| ~ 100/s): check RK4 self-convergence
    # instead of absolute accuracy — halving dt must shrink the error sharply.
    import racing_lmpc_tpu.ops.integrators as integ
    x = jnp.array([0.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    u = jnp.array([0.005, 0.1])
    k = jnp.array(0.0)

    def rollout(n_steps, dt):
        xi = x
        for _ in range(n_steps):
            xi = integ.rk4(barc_model.dynamics, xi, u, k, jnp.array(dt))
        return np.asarray(xi)

    ref = rollout(16, 0.00125)           # fine reference over t=0.02
    err1 = np.abs(rollout(1, 0.02) - ref).max()
    err2 = np.abs(rollout(2, 0.01) - ref).max()
    err4 = np.abs(rollout(4, 0.005) - ref).max()
    assert err2 < err1 / 4
    assert err4 < err2 / 4


def test_control_conversions_roundtrip(barc_model):
    x = jnp.zeros(6)
    u = jnp.array([0.006, 0.2])
    u_base = np.asarray(barc_model.to_base_control(x, u))
    lon = 0.006
    assert np.isclose(u_base[0], lon / (1 + np.exp(-lon)), atol=1e-8)
    assert np.isclose(u_base[1], lon / (1 + np.exp(lon)), atol=1e-8)
    assert u_base[2] == pytest.approx(0.2)
    # from_base picks the dominant force channel
    u_back = np.asarray(barc_model.from_base_control(x, jnp.array(u_base)))
    assert np.isclose(u_back[0], u_base[0])
    assert u_back[1] == pytest.approx(0.2)


def test_kinematic_bicycle_model():
    p = load_ros_params(PARAM_DIR / "barc_base.param.yaml",
                        PARAM_DIR / "barc_single_track.param.yaml")
    base = vehicle_config_from_params(p)
    cfg = single_track_config_from_params(p, simplify_lon_control=False)
    model = KinematicBicycleModel(base, cfg)
    assert model.nx == 4 and model.nu == 3

    x = jnp.array([0.0, 0.0, 0.0, 2.0])
    u = jnp.array([1.0, 0.0, 0.1])
    xd = np.asarray(model.dynamics(x, u, jnp.array(0.0)))
    l = base.chassis.wheel_base
    lr = base.chassis.cg_ratio * l
    beta = np.arctan(lr * np.tan(0.1) / l)
    R = (l / np.tan(0.1)) / np.cos(beta)
    assert np.isclose(xd[2], 2.0 / R, atol=1e-6)
    assert np.isclose(xd[0], 2.0 * np.cos(beta), atol=1e-6)
    assert np.isclose(xd[1], 2.0 * np.sin(beta), atol=1e-6)

    # base state conversion: vx = v cos(beta), vy = v sin(beta)
    xb = np.asarray(model.to_base_state(x, u))
    assert np.allclose(xb[3:5], [2.0 * np.cos(beta), 2.0 * np.sin(beta)], atol=1e-6)
    x_back = np.asarray(model.from_base_state(jnp.array(xb), jnp.zeros(3)))
    assert np.allclose(x_back, np.asarray(x), atol=1e-6)

    A, B = model.dynamics_jacobian(x, u, jnp.array(0.0))
    A_fd = finite_diff_jac(lambda xv: model.dynamics(jnp.array(xv), u, jnp.array(0.0)), x)
    assert np.max(np.abs(np.asarray(A) - A_fd) / np.maximum(np.abs(A_fd), 1.0)) < 2e-2


def test_double_track_model():
    p = load_ros_params(PARAM_DIR / "sample_vehicle_base.param.yaml",
                        PARAM_DIR / "sample_vehicle_double_track.param.yaml")
    base = vehicle_config_from_params(p)
    cfg = double_track_config_from_params(p)
    model = DoubleTrackPlanarModel(base, cfg)
    assert model.nx == 6 and model.nu == 3

    # IAC-scale car cornering
    x = jnp.array([0.0, 0.0, 0.0, 0.1, 0.01, 30.0])
    u = jnp.array([2000.0, 0.0, 0.03])
    gamma = float(model.solve_gamma_y(x, u))
    # residual at the solution is ~0
    res = float(model._gamma_residual(jnp.array(gamma), x, u))
    assert abs(res) < 1e-6
    assert gamma != 0.0

    xd = np.asarray(model.dynamics(x, u, jnp.array(0.0)))
    assert np.all(np.isfinite(xd))
    # accelerating with drive force
    assert xd[5] > 0.0

    # discrete step stays finite and sane
    xp = np.asarray(model.discrete_dynamics(x, u, jnp.array(0.0), jnp.array(0.01)))
    assert np.all(np.isfinite(xp))
    assert abs(xp[5] - 30.0) < 1.0


def test_factory():
    p = load_ros_params(PARAM_DIR / "barc_base.param.yaml",
                        PARAM_DIR / "barc_single_track.param.yaml")
    m = load_vehicle_model("single_track_planar_model", p)
    assert isinstance(m, SingleTrackPlanarModel)
    with pytest.raises(ValueError):
        load_vehicle_model("hovercraft", p)


def test_actuator_maps(barc_model):
    # throttle inverse then forward approximately round-trips inside the table
    barc_model.vehicle_state.engine_rpm = 3000.0
    barc_model.vehicle_state.gear = 2
    fd = 5.0  # N
    thr = barc_model.calc_throttle(fd)
    assert 0.0 <= thr <= 100.0
    # closed-form check of the reference's two-segment inverse
    # (base_vehicle_model.cpp:131-172): engine torque target through gear
    # chain, then linear interp between torque(rpm, 0) and torque(rpm, sample).
    pt = barc_model.base_config.powertrain
    target = (fd * 0.05 * 1.0 / pt.mechanical_efficiency) / (pt.gear_ratio[1] * 3.0)
    tbl = pt.torque_table()
    rpm_i = list(pt.rpm).index(3000.0)
    t_min = tbl[rpm_i, 0]
    # sample_throttle=60 sits between grid columns 50 and 65
    t_smp = tbl[rpm_i, 2] + (tbl[rpm_i, 3] - tbl[rpm_i, 2]) * (60.0 - 50.0) / 15.0
    expected = (target - t_min) / ((t_smp - t_min) / 60.0)
    assert np.isclose(thr, expected, rtol=1e-4)
    # the forward map is monotone in throttle at fixed rpm
    assert barc_model.calc_drive_force(80.0) > barc_model.calc_drive_force(30.0)

    # brake map: negative force -> positive kPa, clamped
    kpa = barc_model.calc_brake(-5.0)
    assert kpa >= 0.0
    assert barc_model.calc_brake(1.0) == 0.0


def test_vmap_batched_dynamics(barc_model):
    xs = jnp.tile(jnp.array([0.0, 0.0, 0.0, 2.0, 0.0, 0.0]), (16, 1))
    us = jnp.tile(jnp.array([0.005, 0.05]), (16, 1))
    ks = jnp.zeros(16)
    f = jax.vmap(barc_model.dynamics)
    out = f(xs, us, ks)
    assert out.shape == (16, 6)
    single = barc_model.dynamics(xs[0], us[0], ks[0])
    assert np.allclose(np.asarray(out[0]), np.asarray(single), atol=1e-6)
