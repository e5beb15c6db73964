"""Extended Kalman filter on the vehicle model with a pluggable observation
registry.

Parity target: ``ekf_state_estimator/src/ekf_state_estimator.cpp``:

- observations registered by name before ``initialize()``; each ``h(x, z)``
  gets an AD Jacobian H and a slice of the block Kalman-gain matrix
  (register_observation, :72-99);
- ``update_observation``: RK4 prediction with the AD-derived F = dx+/dx at
  curvature 0 (:43-49,137-151), standard correct (innovation, S = HPH' + R,
  K = PH'S^{-1}), NaN/Inf input rejection falling back to pure prediction
  (:155-167), covariance sanitation (:238-264), state clipping to config
  bounds (:199-202), filter reset on timestamp regression (:133-135);
- the same exception taxonomy (ekf_state_estimator.hpp:44-101).

The predict+correct math is one jitted pure function per observation source;
state (x, P, K, u, timestamp) lives on the Python object like the reference.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import EKFConfig
from racing_lmpc_tpu.models.base import VehicleModel
from racing_lmpc_tpu.ops.integrators import rk4
from racing_lmpc_tpu.ops.pallas_linalg import inv_small


class EKFAlreadyInitializedException(RuntimeError):
    pass


class EKFUninitializedException(RuntimeError):
    pass


class NoObservationRegisteredException(RuntimeError):
    pass


class ObservationNameAlreadyExistsException(RuntimeError):
    pass


class ObservationNameNotFoundException(RuntimeError):
    pass


def _sanitize_cov(x, P):
    """State-covariance sanitation (check_cov, ekf_state_estimator.cpp:238-264):
    symmetrize, replace non-finite entries, floor the diagonal.  Returns a
    flag so the host can WARN through the Logger (the reference logs there)."""
    P_sym = 0.5 * (P + P.T)
    finite = jnp.isfinite(P_sym)
    diag = jnp.diagonal(P_sym)
    p_bad = jnp.any(~finite) | jnp.any(diag < 0.0)
    P_fixed = jnp.where(finite, P_sym, 0.0)
    P_fixed = P_fixed.at[jnp.diag_indices_from(P_fixed)].set(
        jnp.maximum(jnp.diagonal(P_fixed), 1e-9))
    return x, P_fixed, p_bad


class EKFStateEstimator:
    def __init__(self, config: EKFConfig, model: VehicleModel,
                 logger=None, debug: bool = False):
        """``logger`` is a telemetry.Logger sink for WARN-on-sanitation and
        (with ``debug=True``) the full-matrix deep-debug dumps the reference
        emits through its Logger (ekf_state_estimator.cpp:138-210)."""
        self.config = config
        self.model = model
        self.logger = logger
        self.debug = debug
        nx = model.nx
        self.x = jnp.asarray(config.x0, dtype=jnp.float32)
        self.P = jnp.asarray(np.reshape(config.p0, (nx, nx)), dtype=jnp.float32)
        self.Q = jnp.asarray(np.reshape(config.q, (nx, nx)), dtype=jnp.float32)
        self.x_min = jnp.asarray(config.x_min, dtype=jnp.float32)
        self.x_max = jnp.asarray(config.x_max, dtype=jnp.float32)
        self.u = jnp.zeros((model.nu,), dtype=jnp.float32)
        self._hs: dict[str, Callable] = {}
        self._slices: dict[str, slice] = {}
        self._nz: dict[str, int] = {}
        self._steps: dict[str | None, Callable] = {}
        self.K = jnp.zeros((nx, 0), dtype=jnp.float32)
        self.initialized = False
        self.nanosec = 0

    # ------------------------------------------------------------------
    def register_observation(self, name: str, nz: int, h: Callable):
        """Register ``h(x, z) -> z_pred`` before initialization
        (ekf_state_estimator.cpp:72-99)."""
        if self.initialized:
            raise EKFAlreadyInitializedException()
        if name in self._hs:
            raise ObservationNameAlreadyExistsException(name)
        self._hs[name] = h
        begin = self.K.shape[1]
        self._slices[name] = slice(begin, begin + nz)
        self._nz[name] = nz
        self.K = jnp.concatenate(
            [self.K, jnp.zeros((self.model.nx, nz), dtype=jnp.float32)], axis=1)
        self._steps[name] = jax.jit(self._make_step(h))

    def initialize(self, timestamp_ns: int):
        if self.K.shape[1] == 0:
            raise NoObservationRegisteredException()
        self.initialized = True
        self.nanosec = int(timestamp_ns)
        if None not in self._steps:
            self._steps[None] = jax.jit(self._make_step(None))

    # ------------------------------------------------------------------
    def _predict(self, x, u, P, dt):
        model = self.model
        zero_k = jnp.zeros((), dtype=x.dtype)

        def f(xv):
            return rk4(model.dynamics, xv, u, zero_k, dt)
        x_p = f(x)
        F = jax.jacfwd(f)(x)
        P_p = F @ P @ F.T + self.Q
        return x_p, P_p

    def _make_step(self, h: Callable | None):
        nx = self.model.nx

        def step(x, u, P, dt, z, R):
            with jax.default_matmul_precision("highest"):
                x_p, P_p = self._predict(x, u, P, dt)
                if h is None:
                    x_p, P_p, p_bad = _sanitize_cov(
                        jnp.clip(x_p, self.x_min, self.x_max), P_p)
                    return (x_p, P_p,
                            jnp.zeros((nx, 0), dtype=x.dtype), p_bad)
                bad = ~(jnp.all(jnp.isfinite(z)) & jnp.all(jnp.isfinite(R)))
                # covariance sanitation (check_cov, :238-264)
                R = jnp.maximum(R, 0.0)
                R = R.at[jnp.diag_indices_from(R)].set(
                    jnp.maximum(jnp.diag(R), 1e-6))
                z_safe = jnp.where(jnp.isfinite(z), z, 0.0)
                H = jax.jacfwd(h, argnums=0)(x_p, z_safe)
                y = z_safe - h(x_p, z_safe)
                S = H @ P_p @ H.T + R
                Kz = P_p @ H.T @ inv_small(S)
                x_c = x_p + Kz @ y
                P_c = (jnp.eye(nx, dtype=x.dtype) - Kz @ H) @ P_p
                # NaN/Inf input -> pure prediction (:155-167)
                x_new = jnp.where(bad, x_p, x_c)
                P_new = jnp.where(bad, P_p, P_c)
                Kz = jnp.where(bad, jnp.zeros_like(Kz), Kz)
                x_new, P_new, p_bad = _sanitize_cov(
                    jnp.clip(x_new, self.x_min, self.x_max), P_new)
                return x_new, P_new, Kz, p_bad | bad
        return step

    # ------------------------------------------------------------------
    def update_control(self, u):
        """Latest control input for the prediction step (:216-219)."""
        self.u = jnp.asarray(u, dtype=jnp.float32)

    def update_observation(self, name: str | None, timestamp_ns: int,
                           z=None, R=None) -> dict:
        """Predict + correct with the named observation; ``name=None`` is a
        pure-prediction update (:112-214)."""
        if not self.initialized:
            raise EKFUninitializedException()
        if name is not None and name not in self._hs:
            raise ObservationNameNotFoundException(name)
        dt_ns = int(timestamp_ns) - self.nanosec
        if dt_ns < 0:
            # timestamp jump back: reset the filter clock (:133-135)
            self.initialize(timestamp_ns)
            dt_ns = 0
        dt = jnp.asarray(dt_ns * 1e-9, dtype=jnp.float32)
        if name is None:
            x, P, _, p_bad = self._steps[None](self.x, self.u, self.P, dt,
                                               jnp.zeros(0), jnp.zeros((0, 0)))
            Kz = jnp.zeros((self.model.nx, 0))
        else:
            z = jnp.asarray(z, dtype=jnp.float32)
            R = jnp.asarray(R, dtype=jnp.float32)
            x, P, Kz, p_bad = self._steps[name](self.x, self.u, self.P, dt, z, R)
            self.K = self.K.at[:, self._slices[name]].set(Kz)
        self.x, self.P = x, P
        self.nanosec = int(timestamp_ns)
        if self.logger is not None:
            from racing_lmpc_tpu.control.telemetry import LogLevel
            if bool(p_bad):
                # mirrors the reference's WARN when check_cov sanitizes or a
                # NaN/Inf observation was rejected (:155-167,238-264)
                self.logger.send_log(
                    LogLevel.WARN,
                    f"EKF sanitation engaged on update '{name}' "
                    f"(non-finite input or covariance repaired)")
            if self.debug:
                # deep-debug matrix dumps (:138-210)
                self.logger.send_log(
                    LogLevel.DEBUG,
                    f"EKF update '{name}': x={np.asarray(x)}\n"
                    f"P={np.asarray(P)}\nK={np.asarray(self.K)}\n"
                    f"Kz={np.asarray(Kz)}")
        return {"x": self.x, "P": self.P, "K": self.K, "Kz": Kz,
                "sanitized": bool(p_bad)}
