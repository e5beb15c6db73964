"""Periodic cubic splines: host-side fit, device-side evaluation.

This is the TPU-native replacement for the reference's CasADi b-spline track
interpolants (``racing_trajectory.cpp:80-113``).  The reference emulates
periodicity by splicing 3 points before / 4 after the lap and fitting an
interpolating cubic b-spline; here we fit a true *periodic* cubic spline
(cyclic tridiagonal system, solved host-side with SciPy at load time) over
the same knots — identical in the interior up to boundary-condition decay —
and evaluate on device with static shapes:

    wrap s into the period  →  searchsorted interval lookup  →  Horner.

Evaluation broadcasts over any batch shape, so one jitted evaluation serves
the whole MPC horizon (the reference needed ``Function.map(N)``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import Array
from scipy.interpolate import CubicSpline


class PeriodicSpline(NamedTuple):
    """Device-resident piecewise-cubic polynomial with period ``period``.

    ``breaks``: (M+1,) ascending knots spanning one period.
    ``coeffs``: (4, M, d) polynomial coefficients per interval, highest power
    first (SciPy ``CubicSpline.c`` layout): value = ((c0*t + c1)*t + c2)*t + c3
    with t = s - breaks[i].  ``d`` is the number of interpolated channels.
    """

    breaks: Array        # (M+1,)
    coeffs: Array        # (4, M, d)
    s0: Array            # () scalar: period start
    period: Array        # () scalar: total length

    @property
    def num_channels(self) -> int:
        return self.coeffs.shape[-1]

    def _locate(self, s: Array) -> tuple[Array, Array]:
        sm = self.s0 + jnp.mod(s - self.s0, self.period)
        idx = jnp.clip(
            jnp.searchsorted(self.breaks, sm, side="right") - 1,
            0, self.coeffs.shape[1] - 1,
        )
        t = sm - self.breaks[idx]
        return idx, t

    def eval(self, s: Array) -> Array:
        """Value at abscissa ``s`` (any batch shape) → (..., d)."""
        idx, t = self._locate(s)
        c0, c1, c2, c3 = (self.coeffs[k, idx] for k in range(4))
        t = t[..., None]
        return ((c0 * t + c1) * t + c2) * t + c3

    def eval_d(self, s: Array) -> Array:
        """First derivative d/ds → (..., d)."""
        idx, t = self._locate(s)
        c0, c1, c2 = (self.coeffs[k, idx] for k in range(3))
        t = t[..., None]
        return (3.0 * c0 * t + 2.0 * c1) * t + c2

    def eval_d2(self, s: Array) -> Array:
        """Second derivative d2/ds2 → (..., d)."""
        idx, t = self._locate(s)
        c0, c1 = self.coeffs[0, idx], self.coeffs[1, idx]
        t = t[..., None]
        return 6.0 * c0 * t + 2.0 * c1


def fit_host_spline(
    s_knots: np.ndarray, values: np.ndarray, period: float,
) -> CubicSpline:
    """SciPy twin of :func:`fit_periodic_spline` for host-side setup paths.

    Scenario construction (benchmark batches, warm-start seeding) only needs
    a handful of spline evaluations on the host; paying a device dispatch —
    and on cold processes an XLA compile — for those is pure overhead.  The
    returned ``CubicSpline`` uses ``extrapolate='periodic'`` so any abscissa
    evaluates correctly without manual wrapping.
    """
    s_knots = np.asarray(s_knots, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    if values.ndim == 1:
        values = values[:, None]
    x = np.concatenate([s_knots, [s_knots[0] + period]])
    y = np.concatenate([values, values[:1]], axis=0)
    return CubicSpline(x, y, bc_type="periodic", axis=0,
                       extrapolate="periodic")


def fit_periodic_spline(
    s_knots: np.ndarray, values: np.ndarray, period: float,
    dtype=jnp.float32,
) -> PeriodicSpline:
    """Fit a periodic cubic spline through ``values`` at ``s_knots``.

    ``s_knots``: (M,) strictly increasing abscissae covering one period
    (the first knot need not be 0).  ``values``: (M,) or (M, d).  The closing
    knot at ``s_knots[0] + period`` is added automatically with the first
    value repeated (periodic closure).
    """
    s_knots = np.asarray(s_knots, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    if values.ndim == 1:
        values = values[:, None]
    if not np.all(np.diff(s_knots) > 0):
        raise ValueError("spline knots must be strictly increasing")
    x = np.concatenate([s_knots, [s_knots[0] + period]])
    y = np.concatenate([values, values[:1]], axis=0)
    cs = CubicSpline(x, y, bc_type="periodic", axis=0)
    return PeriodicSpline(
        breaks=jnp.asarray(x, dtype=dtype),
        coeffs=jnp.asarray(cs.c, dtype=dtype),
        s0=jnp.asarray(s_knots[0], dtype=dtype),
        period=jnp.asarray(period, dtype=dtype),
    )
