"""Vehicle-model interface, base state/control layout, and actuator maps.

Parity target: ``base_vehicle_model/base_vehicle_model.hpp:32-209`` and
``base_vehicle_model.cpp``.  Where the reference compiles CasADi SX graphs
once per model and queries symbolic Jacobians, each model here is a small
Python object whose methods are pure JAX functions; Jacobians come from
``jax.jacfwd`` at trace time and everything is compiled once by XLA at the
call sites (MPC builder / simulator / EKF).

Base state layout (``base_vehicle_model.hpp`` XIndex):
    PX, PY, YAW, VX, VY, VYAW
Base control layout (UIndex):  FD (drive force), FB (brake force), STEER.
In Frenet modeling mode PX is the track abscissa s, PY the lateral offset t,
and YAW the heading error xi (same convention as the reference).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import BaseVehicleConfig
from racing_lmpc_tpu.ops.integrators import integrate
from racing_lmpc_tpu.ops.lookup import bilinear_interpolate, _fast_linear

GRAVITY = 9.8


class BaseXIndex(enum.IntEnum):
    PX = 0
    PY = 1
    YAW = 2
    VX = 3
    VY = 4
    VYAW = 5


class BaseUIndex(enum.IntEnum):
    FD = 0
    FB = 1
    STEER = 2


@dataclass
class VehicleState:
    """Low-rate hardware state used by the actuator maps.

    Mirrors ``BaseVehicleModelState`` (base_vehicle_model_state.hpp:31-50).
    """
    wheel_speeds: np.ndarray = field(default_factory=lambda: np.zeros(4))
    engine_rpm: float = 0.0
    gear: int = 1


@dataclass(frozen=True)
class BoxBounds:
    """Per-stage linear bounds contributed by a model to the MPC QP.

    This is the static-shape equivalent of the inequality half of
    ``add_nlp_constraints``: each entry is (lower, upper) arrays over the
    control / control-rate vector.  Nonlinear constraints (power, drive-brake
    exclusivity, friction ellipse) are exposed separately for the SQP path.
    """
    u_lb: np.ndarray
    u_ub: np.ndarray
    du_lb: np.ndarray   # bounds on the rate variable du (per second)
    du_ub: np.ndarray


class VehicleModel:
    """Abstract vehicle model.

    Subclasses implement ``nx``/``nu``, ``dynamics`` (continuous, with local
    curvature ``k`` for Frenet mode), state/control conversions, and
    ``control_bounds``.  Discretization and all Jacobians are derived here.
    """

    def __init__(self, base_config: BaseVehicleConfig):
        self.base_config = base_config
        self.vehicle_state = VehicleState()

    # -- sizes ---------------------------------------------------------------
    @property
    def nx(self) -> int:
        raise NotImplementedError

    @property
    def nu(self) -> int:
        raise NotImplementedError

    nx_base: int = 6
    nu_base: int = 3

    # -- continuous dynamics -------------------------------------------------
    def dynamics(self, x: Array, u: Array, k: Array) -> Array:
        """Continuous dynamics x_dot = f(x, u, k)."""
        raise NotImplementedError

    def dynamics_jacobian(self, x: Array, u: Array, k: Array) -> tuple[Array, Array]:
        """Continuous-time (A, B) = (df/dx, df/du) via forward-mode AD."""
        A = jax.jacfwd(self.dynamics, argnums=0)(x, u, k)
        B = jax.jacfwd(self.dynamics, argnums=1)(x, u, k)
        return A, B

    # -- discrete dynamics ---------------------------------------------------
    def discrete_dynamics(self, x: Array, u: Array, k: Array, dt: Array) -> Array:
        """One integration step (RK4 or Euler per modeling config)."""
        return integrate(
            self.dynamics, x, u, k, dt,
            method=self.base_config.modeling.integrator_type,
        )

    def discrete_dynamics_jacobian(
        self, x: Array, u: Array, k: Array, dt: Array
    ) -> tuple[Array, Array, Array]:
        """Discrete (A, B, g) with affine remainder g = x+ - A x - B u.

        Matches ``single_track_planar_model.cpp:377-387``: the remainder makes
        ``A x + B u + g`` the exact value of the integrator at the
        linearization point, which is what the linearized QP dynamics rows use.
        """
        A = jax.jacfwd(self.discrete_dynamics, argnums=0)(x, u, k, dt)
        B = jax.jacfwd(self.discrete_dynamics, argnums=1)(x, u, k, dt)
        g = self.discrete_dynamics(x, u, k, dt) - A @ x - B @ u
        return A, B, g

    # -- base state/control conversions (identity by default) ----------------
    def to_base_state(self, x: Array, u: Array) -> Array:
        return x

    def from_base_state(self, x_base: Array, u_base: Array) -> Array:
        return x_base

    def to_base_control(self, x: Array, u: Array) -> Array:
        return u

    def from_base_control(self, x_base: Array, u_base: Array) -> Array:
        return u_base

    def to_base_state_jacobian(self, x: Array, u: Array) -> tuple[Array, Array]:
        """d(to_base_state)/d(x, u) — used to express base-state stage costs
        on models whose base conversion is nonlinear (e.g. kinematic bicycle)."""
        Jx = jax.jacfwd(self.to_base_state, argnums=0)(x, u)
        Ju = jax.jacfwd(self.to_base_state, argnums=1)(x, u)
        return Jx, Ju

    # -- MPC constraint data -------------------------------------------------
    def cost_state_indices(self) -> dict:
        """Where contour / heading / velocity / vy / vyaw live in THIS
        model's state layout, for the MPC stage cost (the reference instead
        evaluates the cost on ``to_base_state(x)`` inside the NLP,
        racing_mpc.cpp:442-477 — the QP equivalent is weighting the model
        coordinate that carries the same quantity).  Default covers layouts
        that share the base-state prefix (PX, PY, YAW, ...): single-track
        (VX, VY, VYAW tail) and kinematic bicycle (V last)."""
        nx = self.nx
        return {
            "contour": int(BaseXIndex.PY),
            "heading": int(BaseXIndex.YAW),
            "vel": int(BaseXIndex.VX) if nx == 6 else nx - 1,
            "vy": int(BaseXIndex.VY) if nx == 6 else None,
            "vyaw": int(BaseXIndex.VYAW) if nx == 6 else None,
        }

    def state_scales(self):
        """Optional per-model override of the MPC's fixed diagonal state
        scaling (racing_mpc.cpp:36: per-QUANTITY values px 2000, py 10,
        yaw 0.1, vx 80, vy 2, vyaw 2).  Return None to use the positional
        default; models whose state ORDER differs (double-track) return the
        permuted vector."""
        return None

    def control_bounds(self) -> BoxBounds:
        raise NotImplementedError

    # number of rows returned by ``nl_constraints`` (static, per model)
    n_nl: int = 0

    def nl_constraints(self, x: Array, u: Array, k: Array) -> Array:
        """Stage-wise NONLINEAR inequality residuals g(x, u, k) <= 0.

        The reference wires these through ``model_->add_nlp_constraints``
        into BOTH solver paths (racing_mpc.cpp:126-145): kinematic power
        v*fd <= P_max and drive/brake exclusivity (fd*fb)^2 <= 1
        (kinematic_bicycle_model.cpp:99-104), the double-track's four
        friction-ellipse rows + v >= 0
        (double_track_planar_model.cpp:106-126).  The TPU engine linearizes
        them at the RTI reference each solve (one extra dense row block in
        the condensed QP, re-linearized every SQP iteration), which is the
        OSQP-compatible treatment the reference itself would need on its QP
        path.  Default: no rows (single-track simplified lon — the shipped
        launches — has only the linear subset, handled by control_bounds)."""
        return jnp.zeros((0,), dtype=jnp.result_type(x))

    # -- actuator maps (base_vehicle_model.cpp:131-246) ----------------------
    def calc_throttle(self, fd: float) -> float:
        """Drive force (N) → throttle % via inverse engine-torque lookup.

        Mirrors ``BaseVehicleModel::calc_throttle`` (base_vehicle_model.cpp:131-172).
        """
        pt = self.base_config.powertrain
        state = self.vehicle_state
        if state.gear > len(pt.gear_ratio):
            return 0.0
        ft = self.base_config.front_tyre
        rt = self.base_config.rear_tyre
        target_front = fd * ft.radius * pt.kd
        target_rear = fd * rt.radius * (1.0 - pt.kd)
        target_wheel = (target_front + target_rear) / pt.mechanical_efficiency
        target_engine = target_wheel / (pt.gear_ratio[state.gear - 1] * pt.final_drive_ratio)

        rpm_grid = jnp.asarray(pt.rpm)
        thr_grid = jnp.asarray(pt.throttle)
        table = jnp.asarray(pt.torque_table())
        sample = self.base_config.modeling.sample_throttle
        t_min = bilinear_interpolate(rpm_grid, thr_grid, table, state.engine_rpm, 0.0)
        t_smp = bilinear_interpolate(rpm_grid, thr_grid, table, state.engine_rpm, sample)
        t_max = bilinear_interpolate(rpm_grid, thr_grid, table, state.engine_rpm, 100.0)
        lo = _fast_linear(t_min, t_smp, 0.0, sample, target_engine, False)
        hi = _fast_linear(t_smp, t_max, sample, 100.0, target_engine, False)
        return float(jnp.where(target_engine < t_smp, lo, hi))

    def calc_brake(self, fb: float) -> float:
        """Brake force (N, negative) → master-cylinder kPa.

        Mirrors ``BaseVehicleModel::calc_brake`` (base_vehicle_model.cpp:174-205),
        including the front-only clamp of the return value.
        """
        if fb > 0.0:
            return 0.0
        fbc = self.base_config.front_brake
        front_torque = fbc.bias * fb * self.base_config.front_tyre.radius * fbc.bias
        lever = (fbc.brake_pad_in_r + fbc.brake_pad_out_r) / 2.0
        kpa = -0.001 * front_torque / (lever * fbc.brake_pad_friction_coeff * fbc.piston_area)
        return float(np.clip(kpa, 0.0, fbc.max_brake))

    def calc_drive_force(self, throttle: float) -> float:
        """Throttle % → drive force (N) via forward torque lookup.

        Mirrors ``BaseVehicleModel::calc_drive_force`` (base_vehicle_model.cpp:207-228).
        """
        pt = self.base_config.powertrain
        state = self.vehicle_state
        throttle = float(np.clip(throttle, 0.0, 100.0))
        if state.gear > len(pt.gear_ratio):
            return 0.0
        engine_torque = float(bilinear_interpolate(
            jnp.asarray(pt.rpm), jnp.asarray(pt.throttle),
            jnp.asarray(pt.torque_table()), state.engine_rpm, throttle))
        wheel_torque = engine_torque * pt.gear_ratio[state.gear - 1] * pt.final_drive_ratio
        front = wheel_torque * pt.kd / self.base_config.front_tyre.radius
        rear = wheel_torque * (1.0 - pt.kd) / self.base_config.rear_tyre.radius
        return front + rear

    def calc_brake_force(self, brake_kpa: float) -> float:
        """Master-cylinder kPa → total brake force (N).

        Mirrors ``BaseVehicleModel::calc_brake_force`` (base_vehicle_model.cpp:230-246).
        """
        fbc = self.base_config.front_brake
        rbc = self.base_config.rear_brake
        f_kpa = float(np.clip(fbc.bias * brake_kpa, 0.0, fbc.max_brake))
        r_kpa = float(np.clip(rbc.bias * brake_kpa, 0.0, rbc.max_brake))
        f_lever = (fbc.brake_pad_in_r + fbc.brake_pad_out_r) / 2.0
        r_lever = (rbc.brake_pad_in_r + rbc.brake_pad_out_r) / 2.0
        f_torque = f_kpa * 1000.0 * fbc.piston_area * fbc.brake_pad_friction_coeff * f_lever
        r_torque = r_kpa * 1000.0 * rbc.piston_area * rbc.brake_pad_friction_coeff * r_lever
        return (f_torque / self.base_config.front_tyre.radius
                + r_torque / self.base_config.rear_tyre.radius)

    # -- axle-level force helpers shared by the planar models ----------------
    def _axle_longitudinal_forces(self, fd: Array, fb: Array):
        """Per-axle longitudinal tyre forces incl. rolling resistance split.

        Shared math of kinematic_bicycle_model.cpp:199-207 and
        single_track_planar_model.cpp:256-264.
        Returns (Fx_front_per_wheel, Fx_rear_per_wheel).
        """
        cfg = self.base_config
        kd = cfg.powertrain.kd
        kb = cfg.front_brake.bias
        m = cfg.chassis.total_mass
        l = cfg.chassis.wheel_base
        lr = cfg.chassis.cg_ratio * l
        lf = l - lr
        fr = cfg.chassis.fr
        Fx_f = 0.5 * kd * fd + 0.5 * kb * fb - 0.5 * fr * m * GRAVITY * lr / l
        Fx_r = 0.5 * (1.0 - kd) * fd + 0.5 * (1.0 - kb) * fb - 0.5 * fr * m * GRAVITY * lf / l
        return Fx_f, Fx_r

    def _longitudinal_accel(self, fd: Array, fb: Array, v_sq: Array) -> Array:
        """ax with aero drag and rolling resistance (eq. 9 in both models)."""
        cfg = self.base_config
        m = cfg.chassis.total_mass
        cd = cfg.aero.drag_coeff
        A = cfg.aero.frontal_area
        fr = cfg.chassis.fr
        return (fd + fb - 0.5 * cd * A * v_sq - fr * m * GRAVITY) / m

    def _vertical_loads(self, ax: Array, v_sq: Array):
        """Per-wheel vertical loads with longitudinal transfer + downforce.

        Shared math of single_track_planar_model.cpp:269-277.  Returns
        (Fz_front_per_wheel, Fz_rear_per_wheel).
        """
        cfg = self.base_config
        m = cfg.chassis.total_mass
        l = cfg.chassis.wheel_base
        lr = cfg.chassis.cg_ratio * l
        lf = l - lr
        h = cfg.chassis.cg_height
        rho = cfg.aero.air_density
        A = cfg.aero.frontal_area
        Fz_f = (0.5 * m * GRAVITY * lr / (lf + lr) - 0.5 * h / (lf + lr) * m * ax
                + 0.25 * cfg.aero.cl_f * rho * A * v_sq)
        Fz_r = (0.5 * m * GRAVITY * lf / (lf + lr) + 0.5 * h / (lf + lr) * m * ax
                + 0.25 * cfg.aero.cl_r * rho * A * v_sq)
        return Fz_f, Fz_r

    @staticmethod
    def frenet_correction(px_dot: Array, phi_dot: Array, py: Array, k: Array):
        """Global→Frenet rate conversion: s_dot = px_dot/(1 - t*kappa),
        xi_dot = phi_dot - kappa*s_dot (single_track_planar_model.cpp:326-330)."""
        s_dot = px_dot / (1.0 - py * k)
        return s_dot, phi_dot - k * s_dot
