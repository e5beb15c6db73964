"""Angle / abscissa wrapping and small geometric primitives.

Behavioral parity with the reference's ``lmpc_utils/utils.hpp:25-80`` and
``lmpc_utils/primitives.hpp`` (``align_yaw``, ``align_abscissa``,
``lateral_sign``, ``global_to_frenet``), re-expressed as shape-polymorphic
JAX functions: every function broadcasts over leading batch dimensions, so
the reference's ``casadi::Function::map(n)`` horizon-vectorization is just
array broadcasting here.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def wrap_to_pi(angle: Array) -> Array:
    """Wrap an angle to (-pi, pi] via the atan2 identity (branch-free)."""
    return jnp.arctan2(jnp.sin(angle), jnp.cos(angle))


def align_yaw(yaw_1: Array, yaw_2: Array) -> Array:
    """Shift ``yaw_1`` by a multiple of 2*pi to the representative nearest ``yaw_2``.

    Mirrors ``lmpc::utils::align_yaw`` (utils.hpp:25-31): the result is within
    pi of ``yaw_2`` and congruent to ``yaw_1`` mod 2*pi.
    """
    return wrap_to_pi(yaw_1 - yaw_2) + yaw_2


def align_abscissa(s1: Array, s2: Array, s_total: Array) -> Array:
    """Shift track abscissa ``s1`` by a multiple of the track length toward ``s2``.

    Mirrors ``lmpc::utils::align_abscissa`` (utils.hpp:36-42): the result is
    within ``s_total/2`` of ``s2`` and congruent to ``s1`` mod ``s_total``.
    """
    d = jnp.abs(s2 - s1) + s_total / 2.0
    l = d - jnp.mod(d, s_total)
    return s1 + l * jnp.sign(s2 - s1)


def lateral_sign(position: Array, pose: Array) -> Array:
    """Sign (+1 left / -1 right) of ``position`` relative to a pose (x, y, yaw).

    Cross-product test, mirroring ``lmpc::utils::lateral_sign``
    (utils.hpp:72-80).  ``position``: (..., 2); ``pose``: (..., 3).
    """
    yaw = pose[..., 2]
    return jnp.sign(
        jnp.cos(yaw) * (position[..., 1] - pose[..., 1])
        - jnp.sin(yaw) * (position[..., 0] - pose[..., 0])
    )


def norm_2(v: Array) -> Array:
    """2-norm over the trailing axis, broadcasting over leading batch dims.

    Mirrors ``lmpc::utils::norm_2_function`` (utils.cpp:45-50), which maps a
    column 2-norm across n vectors; here the map is array broadcasting.
    """
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=-1))


def global_to_frenet_rotation(p: Array, p0: Array, yaw: Array) -> Array:
    """Rotate point(s) ``p`` into the frame of ``p0`` with heading ``yaw``.

    Mirrors ``lmpc::utils::global_to_frenet`` (utils.hpp:45-60):
    ``R(-yaw) @ (p - p0)``.  ``p``/``p0``: (..., 2).
    """
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    d = p - p0
    # R(-yaw) = [[cos, sin], [-sin, cos]]
    return jnp.stack(
        [c * d[..., 0] + s * d[..., 1], -s * d[..., 0] + c * d[..., 1]],
        axis=-1,
    )


def body_to_spatial_velocity(v_body: Array, yaw: Array) -> Array:
    """Rotate a body-frame (vx, vy) velocity into the spatial/global frame."""
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    return jnp.stack(
        [c * v_body[..., 0] - s * v_body[..., 1],
         s * v_body[..., 0] + c * v_body[..., 1]],
        axis=-1,
    )


def spatial_to_body_velocity(v_spatial: Array, yaw: Array) -> Array:
    """Rotate a spatial-frame velocity into the body frame."""
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    return jnp.stack(
        [c * v_spatial[..., 0] + s * v_spatial[..., 1],
         -s * v_spatial[..., 0] + c * v_spatial[..., 1]],
        axis=-1,
    )
