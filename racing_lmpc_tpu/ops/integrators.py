"""Fixed-step integrators and exact discretization.

Parity targets: ``lmpc_utils/utils.cpp:52-123`` (``rk4_function``,
``euler_function``, ``c2d_function``).  Where the reference builds CasADi
symbolic graphs once and evaluates them many times, here the integrators are
higher-order JAX functions closed over a continuous dynamics callable; XLA
traces and compiles them once under ``jit`` and they batch freely under
``vmap``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import Array
from jax.scipy.linalg import expm

# dynamics(x, u, k) -> x_dot, where k is the local track curvature
Dynamics = Callable[[Array, Array, Array], Array]


def rk4(dynamics: Dynamics, x: Array, u: Array, k: Array, dt: Array) -> Array:
    """Classic RK4 step, mirroring ``lmpc::utils::rk4_function`` (utils.cpp:67-108)."""
    k1 = dynamics(x, u, k)
    k2 = dynamics(x + dt / 2.0 * k1, u, k)
    k3 = dynamics(x + dt / 2.0 * k2, u, k)
    k4 = dynamics(x + dt * k3, u, k)
    return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def euler(dynamics: Dynamics, x: Array, u: Array, k: Array, dt: Array) -> Array:
    """Explicit Euler step, mirroring ``lmpc::utils::euler_function`` (utils.cpp:110-123)."""
    return x + dt * dynamics(x, u, k)


def integrate(
    dynamics: Dynamics, x: Array, u: Array, k: Array, dt: Array,
    method: str = "rk4",
) -> Array:
    """Dispatch on integrator type (reference ``IntegratorType`` RK4/EULER)."""
    if method == "rk4":
        return rk4(dynamics, x, u, k, dt)
    if method == "euler":
        return euler(dynamics, x, u, k, dt)
    raise ValueError(f"unsupported integrator type: {method}")


def c2d(Ac: Array, Bc: Array, dt: Array) -> tuple[Array, Array]:
    """Exact continuous→discrete conversion of (A, B) via the augmented matrix
    exponential ``expm([[A, B], [0, 0]] * dt)``.

    Mirrors ``lmpc::utils::c2d_function`` (utils.cpp:52-65).
    """
    nx = Ac.shape[-1]
    nu = Bc.shape[-1]
    top = jnp.concatenate([Ac, Bc], axis=-1)
    bottom = jnp.zeros((nu, nx + nu), dtype=Ac.dtype)
    M = jnp.concatenate([top, bottom], axis=-2)
    eM = expm(M * dt)
    return eM[..., :nx, :nx], eM[..., :nx, nx:]
