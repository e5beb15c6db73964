"""Double-track planar model: 4-wheel full Pacejka with lateral load transfer.

Parity target: ``double_track_planar_model/src/double_track_planar_model.cpp``.

State  x = (PX, PY, YAW, VYAW, SLIP, V)  — note the different parametrization
from the single-track model (slip angle beta and speed magnitude v).
Control u = (FD, FB, STEER).

The lateral load transfer ``gamma_y`` is defined implicitly:
    gamma_y = hcog / (0.5 (twf + twr)) * (lateral force sum)
where the tyre forces themselves depend on gamma_y.  The reference embeds a
CasADi Newton rootfinder inside the dynamics graph (:316-332); here we run a
fixed-iteration Newton loop (unrolled, AD-differentiable) — the map is a
strong contraction for physical parameters, so a handful of iterations
reaches float32 fixed point and stays XLA-compilable with static shapes.
"""

from __future__ import annotations

import enum

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import BaseVehicleConfig, DoubleTrackConfig
from racing_lmpc_tpu.models.base import (
    BaseUIndex,
    BaseXIndex,
    BoxBounds,
    GRAVITY,
    VehicleModel,
)

NEWTON_ITERS = 8


class DtXIndex(enum.IntEnum):
    PX = 0
    PY = 1
    YAW = 2
    VYAW = 3
    SLIP = 4
    V = 5


class DoubleTrackPlanarModel(VehicleModel):
    def __init__(self, base_config: BaseVehicleConfig, config: DoubleTrackConfig):
        super().__init__(base_config)
        self.config = config

    @property
    def nx(self) -> int:
        return 6

    @property
    def nu(self) -> int:
        return 3

    def cost_state_indices(self) -> dict:
        """This layout is (PX, PY, YAW, VYAW, SLIP, V): velocity magnitude
        V carries the q_vel weight (== base VX to first order in slip), VYAW
        carries q_vyaw, and there is no lateral-velocity coordinate (slip
        angle is left unweighted, as the base default would otherwise tax
        the wrong state)."""
        return {
            "contour": int(DtXIndex.PY),
            "heading": int(DtXIndex.YAW),
            "vel": int(DtXIndex.V),
            "vy": None,
            "vyaw": int(DtXIndex.VYAW),
        }

    def state_scales(self):
        """Per-quantity scales permuted into the (.., VYAW, SLIP, V) order
        (slip is an angle -> yaw-class scale)."""
        return np.array([2000.0, 10.0, 0.1, 2.0, 0.1, 80.0])

    # ------------------------------------------------------------------
    def forces_given_gamma(self, x: Array, u: Array, gamma_y: Array):
        """Per-wheel (FL, FR, RL, RR) forces given the load transfer.

        Mirrors double_track_planar_model.cpp:216-256 (full Pacejka with
        E-term and load sensitivity ``(1 + eps * Fz / Fz0)``).
        """
        cfg = self.base_config
        omega = x[..., DtXIndex.VYAW]
        beta = x[..., DtXIndex.SLIP]
        v = x[..., DtXIndex.V]
        fd = u[..., BaseUIndex.FD]
        fb = u[..., BaseUIndex.FB]
        delta = u[..., BaseUIndex.STEER]
        v_sq = v * v

        Fx_f, Fx_r = self._axle_longitudinal_forces(fd, fb)
        ax = self._longitudinal_accel(fd, fb, v_sq)

        l = cfg.chassis.wheel_base
        lr = cfg.chassis.cg_ratio * l
        lf = l - lr
        h = cfg.chassis.cg_height
        rho, A = cfg.aero.air_density, cfg.aero.frontal_area
        kroll = self.config.kroll_f
        m = cfg.chassis.total_mass
        twf, twr = cfg.chassis.tw_f, cfg.chassis.tw_r

        # NOTE: the reference uses the lr lever arm for BOTH axles here
        # (double_track_planar_model.cpp:230-236); reproduced as-is for parity.
        Fz_f = (0.5 * m * GRAVITY * lr / (lf + lr) - 0.5 * h / (lf + lr) * m * ax
                + 0.25 * cfg.aero.cl_f * rho * A * v_sq)
        Fz_r = (0.5 * m * GRAVITY * lr / (lf + lr) + 0.5 * h / (lf + lr) * m * ax
                + 0.25 * cfg.aero.cl_r * rho * A * v_sq)
        Fz_fl = Fz_f - kroll * gamma_y
        Fz_fr = Fz_f + kroll * gamma_y
        Fz_rl = Fz_r - (1.0 - kroll) * gamma_y
        Fz_rr = Fz_r + (1.0 - kroll) * gamma_y

        vx_b = v * jnp.cos(beta)
        vy_b = v * jnp.sin(beta)
        a_fl = delta - jnp.arctan((lf * omega + vy_b) / (vx_b - 0.5 * twf * omega))
        a_fr = delta - jnp.arctan((lf * omega + vy_b) / (vx_b + 0.5 * twf * omega))
        a_rl = jnp.arctan((lr * omega - vy_b) / (vx_b - 0.5 * twr * omega))
        a_rr = jnp.arctan((lr * omega - vy_b) / (vx_b + 0.5 * twr * omega))

        mu = self.config.mu
        ft, rt = cfg.front_tyre, cfg.rear_tyre

        def pacejka(Fz, alpha, B, C, E, Fz0, eps):
            Ba = B * alpha
            return (mu * Fz * (1.0 + eps * Fz / Fz0)
                    * jnp.sin(C * jnp.arctan(Ba - E * (Ba - jnp.arctan(Ba)))))

        Fy_fl = pacejka(Fz_fl, a_fl, ft.pacejka_b, ft.pacejka_c, ft.pacejka_e,
                        ft.pacejka_fz0, ft.pacejka_eps)
        Fy_fr = pacejka(Fz_fr, a_fr, ft.pacejka_b, ft.pacejka_c, ft.pacejka_e,
                        ft.pacejka_fz0, ft.pacejka_eps)
        Fy_rl = pacejka(Fz_rl, a_rl, rt.pacejka_b, rt.pacejka_c, rt.pacejka_e,
                        rt.pacejka_fz0, rt.pacejka_eps)
        Fy_rr = pacejka(Fz_rr, a_rr, rt.pacejka_b, rt.pacejka_c, rt.pacejka_e,
                        rt.pacejka_fz0, rt.pacejka_eps)

        Fx = jnp.stack([Fx_f, Fx_f, Fx_r, Fx_r], axis=-1)
        Fy = jnp.stack([Fy_fl, Fy_fr, Fy_rl, Fy_rr], axis=-1)
        Fz = jnp.stack([Fz_fl, Fz_fr, Fz_rl, Fz_rr], axis=-1)
        return Fx, Fy, Fz

    def _gamma_residual(self, gamma_y: Array, x: Array, u: Array) -> Array:
        """Residual of the implicit load-transfer equation (:316-327)."""
        cfg = self.base_config
        delta = u[..., BaseUIndex.STEER]
        twf, twr = cfg.chassis.tw_f, cfg.chassis.tw_r
        h = cfg.chassis.cg_height
        Fx, Fy, _ = self.forces_given_gamma(x, u, gamma_y)
        lat = (Fy[..., 2] + Fy[..., 3]
               + (Fx[..., 0] + Fx[..., 1]) * jnp.sin(delta)
               + (Fy[..., 0] + Fy[..., 1]) * jnp.cos(delta))
        return gamma_y - h / (0.5 * (twf + twr)) * lat

    def solve_gamma_y(self, x: Array, u: Array) -> Array:
        """Fixed-iteration Newton for gamma_y, seeded at 0 as the reference's
        rootfinder call (:329-331)."""
        g = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        res_fn = lambda gy: self._gamma_residual(gy, x, u)
        for _ in range(NEWTON_ITERS):
            r, dr = jax.jvp(res_fn, (g,), (jnp.ones_like(g),))
            g = g - r / dr
        return g

    def dynamics(self, x: Array, u: Array, k: Array) -> Array:
        """Continuous dynamics (double_track_planar_model.cpp:258-283) with the
        load transfer resolved by Newton iteration."""
        cfg = self.base_config
        py = x[..., DtXIndex.PY]
        phi = x[..., DtXIndex.YAW]
        omega = x[..., DtXIndex.VYAW]
        beta = x[..., DtXIndex.SLIP]
        v = x[..., DtXIndex.V]
        delta = u[..., BaseUIndex.STEER]
        v_sq = v * v

        gamma_y = self.solve_gamma_y(x, u)
        Fx, Fy, _ = self.forces_given_gamma(x, u, gamma_y)
        Fx_fl, Fx_fr, Fx_rl, Fx_rr = (Fx[..., i] for i in range(4))
        Fy_fl, Fy_fr, Fy_rl, Fy_rr = (Fy[..., i] for i in range(4))

        m = cfg.chassis.total_mass
        Jzz = cfg.chassis.moi
        l = cfg.chassis.wheel_base
        lr = cfg.chassis.cg_ratio * l
        lf = l - lr
        twf, twr = cfg.chassis.tw_f, cfg.chassis.tw_r
        rho, A, cd = cfg.aero.air_density, cfg.aero.frontal_area, cfg.aero.drag_coeff

        cb, sb = jnp.cos(beta), jnp.sin(beta)
        cdb, sdb = jnp.cos(delta - beta), jnp.sin(delta - beta)
        v_dot = (1.0 / m) * (
            (Fx_rl + Fx_rr) * cb + (Fx_fl + Fx_fr) * cdb + (Fy_rl + Fy_rr) * sb
            - (Fy_fl + Fy_fr) * sdb - 0.5 * cd * rho * A * v_sq * cb)
        beta_dot = -omega + (1.0 / (m * v)) * (
            -(Fx_rl + Fx_rr) * sb + (Fx_fl + Fx_fr) * sdb + (Fy_rl + Fy_rr) * cb
            + (Fy_fl + Fy_fr) * cdb + 0.5 * cd * rho * A * v_sq * sb)
        omega_dot = (1.0 / Jzz) * (
            (Fx_rr - Fx_rl) * twr / 2.0 - (Fy_rl + Fy_rr) * lr
            + ((Fx_fr - Fx_fl) * jnp.cos(delta) + (Fy_fl - Fy_fr) * jnp.sin(delta)) * twf / 2.0
            + ((Fy_fl + Fy_fr) * jnp.cos(delta) + (Fx_fl + Fx_fr) * jnp.sin(delta)) * lf)

        vx = v * jnp.cos(phi + beta)
        vy = v * jnp.sin(phi + beta)
        phi_dot = omega
        if cfg.modeling.use_frenet:
            vx, phi_dot = self.frenet_correction(vx, phi_dot, py, k)

        return jnp.stack([vx, vy, phi_dot, omega_dot, beta_dot, v_dot], axis=-1)

    # -- base conversions ----------------------------------------------------
    def to_base_state(self, x: Array, u: Array) -> Array:
        beta = x[..., DtXIndex.SLIP]
        v = x[..., DtXIndex.V]
        return jnp.stack([
            x[..., DtXIndex.PX],
            x[..., DtXIndex.PY],
            x[..., DtXIndex.YAW],
            v * jnp.cos(beta),
            v * jnp.sin(beta),
            x[..., DtXIndex.VYAW],
        ], axis=-1)

    def from_base_state(self, x_base: Array, u_base: Array) -> Array:
        vx = x_base[..., BaseXIndex.VX]
        vy = x_base[..., BaseXIndex.VY]
        return jnp.stack([
            x_base[..., BaseXIndex.PX],
            x_base[..., BaseXIndex.PY],
            x_base[..., BaseXIndex.YAW],
            x_base[..., BaseXIndex.VYAW],
            jnp.arctan2(vy, vx),
            jnp.hypot(vx, vy),
        ], axis=-1)

    # ------------------------------------------------------------------
    def control_bounds(self) -> BoxBounds:
        """Linear bounds from ``add_nlp_constraints`` (:121-137)."""
        cfg = self.config
        steer_max = self.base_config.steer.max_steer
        steer_rate = self.base_config.steer.max_steer_rate
        u_lb = np.array([0.0, cfg.fb_max, -steer_max])
        u_ub = np.array([cfg.fd_max, 0.0, steer_max])
        du_lb = np.array([-np.inf, cfg.fb_max / cfg.tb, -steer_rate])
        du_ub = np.array([cfg.fd_max / cfg.td, np.inf, steer_rate])
        return BoxBounds(u_lb, u_ub, du_lb, du_ub)

    def friction_ellipse(self, x: Array, u: Array) -> Array:
        """Per-wheel friction-ellipse residuals (<= 0 feasible), :106-110."""
        gamma_y = self.solve_gamma_y(x, u)
        Fx, Fy, Fz = self.forces_given_gamma(x, u, gamma_y)
        mu = self.config.mu
        return (Fx / (mu * Fz)) ** 2 + (Fy / (mu * Fz)) ** 2 - 1.0

    # 4 friction-ellipse rows + power + exclusivity + v >= 0
    n_nl: int = 7

    def nl_constraints(self, x: Array, u: Array, k: Array) -> Array:
        """The double-track add_nlp_constraints inequality set
        (double_track_planar_model.cpp:106-126): four friction ellipses,
        v*fd <= P_max, (fd*fb)^2 <= 1, and v >= 0.  The reference's separate
        ``gamma_y`` algebraic constraint (:113-118) is identically satisfied
        here because this model solves the same fixed point INSIDE the
        dynamics/force graph (solve_gamma_y), so it contributes no extra QP
        row — the linearizations already differentiate through it."""
        v = x[..., DtXIndex.V]
        fd = u[..., BaseUIndex.FD]
        fb = u[..., BaseUIndex.FB]
        return jnp.concatenate([
            self.friction_ellipse(x, u),
            jnp.stack([v * fd - self.config.p_max,
                       (fd * fb) ** 2 - 1.0,
                       -v], axis=-1),
        ], axis=-1)

    def calc_lon_control(self, u: Array) -> tuple[float, float]:
        fd = float(u[BaseUIndex.FD])
        fb = float(u[BaseUIndex.FB])
        if abs(fd) > abs(fb):
            return self.calc_throttle(fd), 0.0
        return 0.0, self.calc_brake(fb)

    def calc_lat_control(self, u: Array) -> float:
        return float(u[BaseUIndex.STEER])
