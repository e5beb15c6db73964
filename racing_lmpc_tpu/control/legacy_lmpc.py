"""Legacy full-dynamics tracking controller ("racing_lmpc").

Parity target: ``controllers/racing_lmpc/src/racing_lmpc.cpp`` — despite the
name this is a *tracking* NLP controller (no safe set): full nonlinear
dynamics equalities solved by IPOPT, per-step boundary slack, stage cost on
contour/heading/velocity (racing_lmpc.cpp:79-176).

TPU-native equivalent: the same problem expressed as SQP over the shared
RTI QP kernel (``RacingMPC.solve_sqp``) — each SQP iteration relinearizes at
the nonlinear rollout, so at convergence the exact dynamics hold, matching
the IPOPT formulation's feasible point.  The config mirrors
``RacingLMPCConfig`` (racing_lmpc_config.hpp:24-56).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from racing_lmpc_tpu.config import RacingMPCConfig
from racing_lmpc_tpu.models.base import VehicleModel
from racing_lmpc_tpu.mpc.racing_mpc import MPCInput, MPCOutput, RacingMPC
from racing_lmpc_tpu.track.trajectory import RacingTrajectory


@dataclass
class RacingLMPCLegacyConfig:
    """Mirrors ``RacingLMPCConfig`` field names."""
    max_cpu_time: float = 10.0
    max_iter: int = 1000
    tol: float = 1e-3
    n: int = 10
    margin: float = 0.0
    average_track_width: float = 1.0
    verbose: bool = False
    step_mode: str = "step"
    q_contour: float = 1.0
    q_heading: float = 1.0
    q_vel: float = 1.0
    q_boundary: float = 0.0
    r: tuple = ()
    x_max: tuple = ()
    x_min: tuple = ()
    u_max: tuple = ()
    u_min: tuple = ()
    sqp_iters: int = 8


class RacingLMPCLegacy:
    """Full-dynamics tracking controller over the shared SQP/QP kernel."""

    def __init__(self, config: RacingLMPCLegacyConfig, model: VehicleModel,
                 track: RacingTrajectory):
        self.config = config
        self.model = model
        self.track = track
        nu = model.nu
        r = config.r if config.r else tuple(np.eye(nu).ravel() * 0.01)
        self.mpc = RacingMPC(RacingMPCConfig(
            max_cpu_time=config.max_cpu_time, max_iter=config.max_iter,
            tol=config.tol, n=config.n, margin=config.margin,
            average_track_width=config.average_track_width,
            verbose=config.verbose, step_mode=config.step_mode,
            q_contour=config.q_contour, q_heading=config.q_heading,
            q_vel=config.q_vel, q_boundary=config.q_boundary,
            # the reference's legacy controller has no rate-cost term (rates
            # are constrained via uip1 only, racing_lmpc.cpp:137-176); the
            # shared QP kernel carries explicit dU variables, which need
            # nonzero curvature to keep the Hessian definite — a small
            # regularization is the numerical equivalent of "no rate cost".
            r_d=tuple((np.eye(nu) * 1e-2).ravel()),
            r=r,
            x_max=config.x_max, x_min=config.x_min,
            u_max=config.u_max, u_min=config.u_min,
            learning=False), model)

    def solve(self, x_ic, X_ref, U_ref, dt: float) -> MPCOutput:
        """One full-dynamics solve (racing_lmpc.cpp solve): SQP to a point
        where the nonlinear dynamics equalities hold."""
        N = self.config.n
        X_ref = jnp.asarray(X_ref, dtype=jnp.float32)
        s = X_ref[:, 0]
        def build(X_lin, U_lin):
            s = X_lin[:, 0]
            return MPCInput(
                x_ic=jnp.asarray(x_ic, dtype=jnp.float32),
                u_ic=jnp.zeros((self.model.nu,), dtype=jnp.float32),
                X_ref=X_lin,
                U_ref=jnp.asarray(U_lin, dtype=jnp.float32),
                T_ref=jnp.full((N - 1,), dt, dtype=jnp.float32),
                bound_left=self.track.left_boundary(s),
                bound_right=self.track.right_boundary(s),
                total_length=jnp.asarray(self.track.total_length,
                                         dtype=jnp.float32),
                curvatures=self.track.curvature(s),
                vel_ref=X_ref[:, self.mpc.idx_vel],
                ss_x=jnp.zeros((0, self.model.nx), dtype=jnp.float32),
                ss_j=jnp.zeros((0,), dtype=jnp.float32))

        # SQP with track-data refresh: curvature/boundaries re-interpolated
        # at each iterate's abscissae, linearization at the nonlinear rollout
        # of the optimized controls (see RacingMPC.solve_sqp).
        out, z = self.mpc.solve(build(X_ref, jnp.asarray(U_ref, dtype=jnp.float32)))
        U = out.U_optm
        for _ in range(self.config.sqp_iters - 1):
            x = jnp.asarray(x_ic, dtype=jnp.float32)
            X_roll = [x]
            for i in range(N - 1):
                k = self.track.curvature(x[0])
                x = self.model.discrete_dynamics(
                    x, U[i], k, jnp.asarray(dt, dtype=jnp.float32))
                X_roll.append(x)
            out, z = self.mpc._solve_jit(
                build(jnp.stack(X_roll), U), z, jnp.asarray(True))
            # damped step (see RacingMPC.solve_sqp)
            U = U + 0.5 * (out.U_optm - U)
        # report the damped iterate's rollout as the solution trajectory
        x = jnp.asarray(x_ic, dtype=jnp.float32)
        X_roll = [x]
        for i in range(N - 1):
            k = self.track.curvature(x[0])
            x = self.model.discrete_dynamics(
                x, U[i], k, jnp.asarray(dt, dtype=jnp.float32))
            X_roll.append(x)
        return out._replace(X_optm=jnp.stack(X_roll), U_optm=U)
