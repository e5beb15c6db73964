"""Table-lookup interpolation (engine torque map, etc.).

Parity targets: ``lmpc_utils/lookup.cpp:23-76`` — 1-D linear and 2-D bilinear
interpolation with an optional extrapolation clamp.  The reference walks the
breakpoint list with a scalar loop; here index search is a vectorized
``searchsorted`` so the same function serves scalars and batches under jit.

Semantics match the reference exactly, including its edge behavior: the
interval index saturates at ``len(x) - 2``, and with ``extrapolate=False``
values outside the table clamp to the edge value.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _find_index(grid: Array, val: Array) -> Array:
    """Interval index such that grid[i] <= val < grid[i+1], saturated to
    [0, len(grid)-2].  Mirrors ``lmpc::utils::find_index`` (lookup.cpp:23-34).
    """
    idx = jnp.searchsorted(grid, val, side="left") - 1
    return jnp.clip(idx, 0, grid.shape[0] - 2)


def _fast_linear(x_min, x_max, y_min, y_max, x_val, extrapolate: bool):
    """Mirrors ``fast_linear_interpolate`` (lookup.cpp:36-49)."""
    yL, yR = y_min, y_max
    if not extrapolate:
        yR = jnp.where(x_val < x_min, yL, yR)
        yL = jnp.where(x_val > x_max, yR, yL)
    dydx = (yR - yL) / (x_max - x_min)
    return yL + dydx * (x_val - x_min)


def interp1d(x_grid: Array, y_grid: Array, x: Array, extrapolate: bool = False) -> Array:
    """1-D linear interpolation (``linear_interpolate``, lookup.cpp:51-57)."""
    i = _find_index(x_grid, x)
    return _fast_linear(x_grid[i], x_grid[i + 1], y_grid[i], y_grid[i + 1], x, extrapolate)


def bilinear_interpolate(
    x_grid: Array, y_grid: Array, z_table: Array, x: Array, y: Array,
    extrapolate: bool = False,
) -> Array:
    """2-D bilinear interpolation (``bilinear_interpolate``, lookup.cpp:59-76).

    ``z_table`` has shape (len(x_grid), len(y_grid)) — row-major over x, as in
    the reference's flattened ``z[x * ny + y]`` layout.
    """
    xi = _find_index(x_grid, x)
    yi = _find_index(y_grid, y)
    v1 = _fast_linear(
        y_grid[yi], y_grid[yi + 1], z_table[xi, yi], z_table[xi, yi + 1], y, extrapolate)
    v2 = _fast_linear(
        y_grid[yi], y_grid[yi + 1], z_table[xi + 1, yi], z_table[xi + 1, yi + 1], y, extrapolate)
    return _fast_linear(x_grid[xi], x_grid[xi + 1], v1, v2, x, extrapolate)
