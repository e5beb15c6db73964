"""Independent physics cross-check (VERDICT r3 missing #2).

The engine, the f64 reference-QP oracle (mpc/reference_qp.py), and every
match test all consume the SAME JAX models — a transcription error vs the
C++ would self-confirm through that chain.  ``ref_models_f64.py`` is a
second, independently written f64 numpy transcription of the three models
(different author path, complex-step Jacobians instead of jax AD); here
both implementations are pinned against each other at the BARC and IAC
parameter sets over realistic racing states.

Checked per model:
- continuous dynamics x_dot  (<= 1e-6 relative, f64 vs f64)
- discrete RK4 step          (same)
- discrete Jacobians A, B and the affine remainder g
  (jax.jacfwd vs complex-step; single_track_planar_model.cpp:377-387)

A wrong sign, a wrong lever arm, a dropped term, or a mis-scaled force in
either implementation fails these gates; agreement to 1e-6 across two
independent transcriptions bounds the probability of a COMMON error to
"both authors made the identical mistake reading the same line".
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from racing_lmpc_tpu.config import (
    PARAM_DIR, load_ros_params, vehicle_config_from_params,
    single_track_config_from_params, double_track_config_from_params)
from racing_lmpc_tpu.models import (
    DoubleTrackPlanarModel, KinematicBicycleModel, SingleTrackPlanarModel)

import ref_models_f64 as ref


def _vehicle(base_yaml, model_yaml):
    p = load_ros_params(PARAM_DIR / base_yaml, PARAM_DIR / model_yaml)
    return vehicle_config_from_params(p), p


def _states_barc(rng, n):
    # (px, py, yaw, vx, vy, vyaw) around BARC racing conditions
    return np.stack([
        rng.uniform(0, 15, n), rng.uniform(-0.4, 0.4, n),
        rng.uniform(-0.5, 0.5, n), rng.uniform(0.5, 3.5, n),
        rng.uniform(-0.5, 0.5, n), rng.uniform(-2.0, 2.0, n)], axis=1)


def _states_iac(rng, n):
    return np.stack([
        rng.uniform(0, 1000, n), rng.uniform(-4, 4, n),
        rng.uniform(-0.5, 0.5, n), rng.uniform(5, 60, n),
        rng.uniform(-2, 2, n), rng.uniform(-0.5, 0.5, n)], axis=1)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(1.0, np.max(np.abs(b)))


def _check_model(model, xdot_fn, base, cfg, X, U, ks, dt, tol=1e-6):
    """Pin the JAX model (run in f64) against the independent numpy
    transcription on every (x, u, k) sample."""
    with jax.enable_x64(True):
        for x, u, k in zip(X, U, ks):
            xj = jnp.asarray(x, jnp.float64)
            uj = jnp.asarray(u, jnp.float64)
            kj = jnp.asarray(k, jnp.float64)
            dtj = jnp.asarray(dt, jnp.float64)

            xd_jax = np.asarray(model.dynamics(xj, uj, kj))
            xd_ref = xdot_fn(x, u, k, base, cfg)
            assert _rel(xd_jax, xd_ref) < tol, \
                f"x_dot mismatch {_rel(xd_jax, xd_ref):.2e} at x={x} u={u}"

            xp_jax = np.asarray(model.discrete_dynamics(xj, uj, kj, dtj))
            xp_ref = ref.discrete(xdot_fn, x, u, k, dt, base, cfg)
            assert _rel(xp_jax, xp_ref) < tol, \
                f"RK4 step mismatch {_rel(xp_jax, xp_ref):.2e}"

            A_jax, B_jax, g_jax = jax.tree.map(
                np.asarray, model.discrete_dynamics_jacobian(xj, uj, kj, dtj))
            A_ref, B_ref, g_ref = ref.cstep_jacobians(
                xdot_fn, x, u, k, dt, base, cfg)
            assert _rel(A_jax, A_ref) < tol, f"A mismatch {_rel(A_jax, A_ref):.2e}"
            assert _rel(B_jax, B_ref) < tol, f"B mismatch {_rel(B_jax, B_ref):.2e}"
            assert _rel(g_jax, g_ref) < tol, f"g mismatch {_rel(g_jax, g_ref):.2e}"


def test_single_track_barc_crosscheck():
    base, p = _vehicle("barc_base.param.yaml", "barc_single_track.param.yaml")
    cfg = single_track_config_from_params(p)
    model = SingleTrackPlanarModel(base, cfg)
    rng = np.random.default_rng(7)
    n = 8
    X = _states_barc(rng, n)
    # simplified lon control: (lon, steer)
    U = np.stack([rng.uniform(-3, 3, n), rng.uniform(-0.3, 0.3, n)], axis=1)
    ks = rng.uniform(-1.5, 1.5, n)
    assert cfg.simplify_lon_control
    _check_model(model, ref.single_track_xdot, base, cfg, X, U, ks, dt=0.025)


def test_single_track_iac_crosscheck():
    base, p = _vehicle("iac_car_base.param.yaml", "iac_car_single_track.param.yaml")
    cfg = single_track_config_from_params(p)
    model = SingleTrackPlanarModel(base, cfg)
    rng = np.random.default_rng(11)
    n = 8
    X = _states_iac(rng, n)
    if cfg.simplify_lon_control:
        U = np.stack([rng.uniform(-8, 8, n), rng.uniform(-0.2, 0.2, n)], axis=1)
    else:
        U = np.stack([rng.uniform(0, 15000, n), rng.uniform(-8000, 0, n),
                      rng.uniform(-0.2, 0.2, n)], axis=1)
    ks = rng.uniform(-0.02, 0.02, n)
    _check_model(model, ref.single_track_xdot, base, cfg, X, U, ks, dt=0.025)


def test_kinematic_bicycle_crosscheck():
    base, p = _vehicle("barc_base.param.yaml", "barc_single_track.param.yaml")
    cfg = single_track_config_from_params(p)
    model = KinematicBicycleModel(base, cfg)
    rng = np.random.default_rng(13)
    n = 8
    # (px, py, yaw, v); steer bounded away from 0 (l/tan(delta) pole)
    X = np.stack([
        rng.uniform(0, 15, n), rng.uniform(-0.4, 0.4, n),
        rng.uniform(-0.5, 0.5, n), rng.uniform(0.5, 3.5, n)], axis=1)
    delta = rng.uniform(0.03, 0.3, n) * rng.choice([-1.0, 1.0], n)
    U = np.stack([rng.uniform(0, 4, n), rng.uniform(-3, 0, n), delta], axis=1)
    ks = rng.uniform(-1.5, 1.5, n)
    _check_model(model, ref.kinematic_xdot, base, cfg, X, U, ks, dt=0.025)


def test_double_track_crosscheck():
    base, p = _vehicle("barc_base.param.yaml", "barc_double_track.param.yaml")
    cfg = double_track_config_from_params(p)
    model = DoubleTrackPlanarModel(base, cfg)
    rng = np.random.default_rng(17)
    n = 6
    # (px, py, yaw, vyaw, slip, v)
    X = np.stack([
        rng.uniform(0, 15, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(-0.5, 0.5, n), rng.uniform(-1.5, 1.5, n),
        rng.uniform(-0.15, 0.15, n), rng.uniform(1.0, 3.5, n)], axis=1)
    U = np.stack([rng.uniform(0, 4, n), rng.uniform(-3, 0, n),
                  rng.uniform(-0.3, 0.3, n)], axis=1)
    ks = rng.uniform(-1.0, 1.0, n)
    # the implicit gamma_y is solved by different schemes on the two sides
    # (Newton scan vs analytic fixed point) — keep a 1e-6 gate anyway: both
    # converge far below it
    _check_model(model, ref.double_track_xdot, base, cfg, X, U, ks, dt=0.025)
