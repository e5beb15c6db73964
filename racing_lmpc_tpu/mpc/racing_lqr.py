"""Finite-horizon discrete Riccati LQR tracking controller.

Parity target: ``racing_lqr/src/racing_lqr.cpp:45-104``: per-stage
linearization of the continuous dynamics at the reference, exact c2d via the
augmented matrix exponential, backward Riccati recursion, forward rollout
applying u = u_ref - K (x - x_ref) through RK4 (curvature 0, as the
reference's solve does — "TODO add frenet support" there).

TPU-native: the backward pass is a ``lax.scan`` over stages (the Jacobians
for all stages are linearized in one ``vmap`` beforehand), the whole solve
is one jitted function, and it batches over scenarios with ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import RacingLQRConfig
from racing_lmpc_tpu.models.base import VehicleModel
from racing_lmpc_tpu.ops.integrators import c2d, rk4
from racing_lmpc_tpu.ops.pallas_linalg import solve_small


class LQRSolution(NamedTuple):
    u: Array         # (nu,) first control
    U_optm: Array    # (N-1, nu)
    X_optm: Array    # (N, nx)
    K_gains: Array   # (N-1, nu, nx)


class RacingLQR:
    def __init__(self, config: RacingLQRConfig, model: VehicleModel):
        self.config = config
        self.model = model
        nx, nu = model.nx, model.nu
        self.Q = jnp.asarray(config.Q(nx), dtype=jnp.float32)
        self.R = jnp.asarray(config.Rm(nu), dtype=jnp.float32)
        self.Qf = jnp.asarray(config.Qf(nx), dtype=jnp.float32)
        self._solve_jit = jax.jit(self._solve_impl)
        self._solve_batch = jax.jit(jax.vmap(self._solve_impl))

    def _solve_impl(self, x_ic: Array, X_ref: Array, U_ref: Array) -> LQRSolution:
        """``X_ref``: (N, nx), ``U_ref``: (N-1, nu)."""
        model = self.model
        dt = jnp.asarray(self.config.dt, dtype=x_ic.dtype)
        N = self.config.n
        zero_k = jnp.zeros((N - 1,), dtype=x_ic.dtype)

        with jax.default_matmul_precision("highest"):
            # stage linearizations + exact discretization (racing_lqr.cpp:59-69)
            Ac, Bc = jax.vmap(model.dynamics_jacobian)(X_ref[:-1], U_ref, zero_k)
            Ad, Bd = jax.vmap(lambda a, b: c2d(a, b, dt))(Ac, Bc)

            # backward Riccati (racing_lqr.cpp:71-77)
            def backward(P, AB):
                A, B = AB
                BtP = B.T @ P
                K = solve_small(self.R + BtP @ B, BtP @ A)
                P_new = self.Q + A.T @ P @ (A - B @ K)
                return P_new, K

            _, Ks = jax.lax.scan(
                backward, self.Qf, (Ad, Bd), reverse=True)

            # forward rollout with RK4 (racing_lqr.cpp:80-90)
            def forward(x, inp):
                K, x_ref, u_ref = inp
                u = u_ref - K @ (x - x_ref)
                x_next = rk4(model.dynamics, x, u, jnp.zeros((), dtype=x.dtype), dt)
                return x_next, (x_next, u)

            _, (Xs, Us) = jax.lax.scan(
                forward, x_ic, (Ks, X_ref[:-1], U_ref))
        X = jnp.concatenate([x_ic[None], Xs], axis=0)
        return LQRSolution(u=Us[0], U_optm=Us, X_optm=X, K_gains=Ks)

    def solve(self, x_ic: Array, X_ref: Array, U_ref: Array) -> LQRSolution:
        return self._solve_jit(
            jnp.asarray(x_ic, dtype=jnp.float32),
            jnp.asarray(X_ref, dtype=jnp.float32),
            jnp.asarray(U_ref, dtype=jnp.float32))

    def solve_batch(self, x_ic: Array, X_ref: Array, U_ref: Array) -> LQRSolution:
        """Batched solve over a leading scenario dimension."""
        return self._solve_batch(x_ic, X_ref, U_ref)
