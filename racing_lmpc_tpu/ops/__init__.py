"""Math core: the TPU-native equivalent of the reference's ``lmpc_utils``."""

from racing_lmpc_tpu.ops.math import (
    align_yaw,
    align_abscissa,
    lateral_sign,
    global_to_frenet_rotation,
    norm_2,
    wrap_to_pi,
)
from racing_lmpc_tpu.ops.integrators import rk4, euler, c2d, integrate
from racing_lmpc_tpu.ops.lookup import interp1d, bilinear_interpolate
from racing_lmpc_tpu.ops.spline import PeriodicSpline, fit_periodic_spline

__all__ = [
    "align_yaw",
    "align_abscissa",
    "lateral_sign",
    "global_to_frenet_rotation",
    "norm_2",
    "wrap_to_pi",
    "rk4",
    "euler",
    "c2d",
    "integrate",
    "interp1d",
    "bilinear_interpolate",
    "PeriodicSpline",
    "fit_periodic_spline",
]
