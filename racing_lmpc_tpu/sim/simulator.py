"""Vehicle plant simulator.

Parity target: ``racing_simulator/src/racing_simulator.cpp``.  The reference
composes, once, a discrete-dynamics graph with the track curvature interpolant
and abscissa/yaw wrapping baked in (:46-69); ``step`` clamps |vx| >= 1e-6,
converts base→model control, and advances the state (:97-112).

Here the composed step is one jitted pure function; a vectorized multi-step
rollout (``lax.scan``) and batched-scenario rollouts (``vmap``) come for free
and replace the reference's one-step-per-ROS-message loop for benchmarking
and safe-set generation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import SimulatorConfig
from racing_lmpc_tpu.models.base import VehicleModel
from racing_lmpc_tpu.ops.math import align_abscissa, align_yaw
from racing_lmpc_tpu.track.trajectory import RacingTrajectory


class RacingSimulator:
    def __init__(self, config: SimulatorConfig, model: VehicleModel,
                 track: RacingTrajectory):
        self.config = config
        self.model = model
        self.track = track
        self.x = jnp.asarray(config.x0, dtype=jnp.float32)
        self.u = jnp.zeros(model.nu_base, dtype=jnp.float32)
        self._step_jit = jax.jit(self.step_fn)

    # ------------------------------------------------------------------
    def step_fn(self, x: Array, u_base: Array) -> Array:
        """One composed plant step (racing_simulator.cpp:46-69,97-112):
        vx clamp → base→model control → discrete dynamics with curvature at
        the current abscissa → abscissa/yaw wrap."""
        model = self.model
        dt = jnp.asarray(self.config.dt, dtype=x.dtype)
        use_frenet = model.base_config.modeling.use_frenet
        vx_idx = 3 if model.nx >= 6 else model.nx - 1
        vx = x[..., vx_idx]
        x = x.at[..., vx_idx].set(
            jnp.where(jnp.abs(vx) < 1e-6, jnp.copysign(1e-6, vx), vx))
        u = model.from_base_control(x, u_base)
        if use_frenet:
            k = self.track.curvature(x[..., 0])
        else:
            k = jnp.zeros_like(x[..., 0])
        xp = model.discrete_dynamics(x, u, k, dt)
        L = self.track.total_length
        if use_frenet:
            xp = xp.at[..., 0].set(align_abscissa(
                xp[..., 0], jnp.asarray(L / 2.0, dtype=x.dtype),
                jnp.asarray(L, dtype=x.dtype)))
        else:
            xp = xp.at[..., 2].set(align_yaw(xp[..., 2], jnp.zeros_like(xp[..., 2])))
        return xp

    def step(self, u_base: Array) -> Array:
        """Stateful single step (the ROS-node usage pattern)."""
        self.u = jnp.asarray(u_base, dtype=self.x.dtype)
        self.x = self._step_jit(self.x, self.u)
        return self.x

    def set_state(self, x: Array):
        self.x = jnp.asarray(x, dtype=jnp.float32)

    # ------------------------------------------------------------------
    def rollout(self, x0: Array, us_base: Array) -> Array:
        """Vectorized rollout: scan the composed step over a control
        sequence.  ``x0``: (nx,) or (B, nx); ``us_base``: (T, nu_base) or
        (B, T, nu_base).  Returns the state trajectory (T, nx) / (B, T, nx)."""
        def scan_one(x0, us):
            def body(x, u):
                xn = self.step_fn(x, u)
                return xn, xn
            return jax.lax.scan(body, x0, us)[1]
        if x0.ndim == 1:
            return jax.jit(scan_one)(x0, us_base)
        return jax.jit(jax.vmap(scan_one))(x0, us_base)
