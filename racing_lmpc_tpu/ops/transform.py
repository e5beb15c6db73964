"""Planar transform helpers: yaw <-> quaternion, yaw differences.

Parity target: ``lmpc_transform_helper/lmpc_transform_helper.hpp:41-70`` —
the tf2-wrapper surface reduced to its math (there is no tf tree to
broadcast to in-process; poses are exchanged as arrays/messages).
"""

from __future__ import annotations

import numpy as np

from racing_lmpc_tpu.ops.math import wrap_to_pi


def quaternion_from_heading(yaw: float) -> tuple[float, float, float, float]:
    """(qr, qi, qj, qk) for a pure-yaw rotation."""
    return (float(np.cos(yaw / 2.0)), 0.0, 0.0, float(np.sin(yaw / 2.0)))


def heading_from_quaternion(qr: float, qi: float, qj: float, qk: float) -> float:
    """Yaw extracted from a (unit) quaternion."""
    return float(np.arctan2(2.0 * (qr * qk + qi * qj),
                            1.0 - 2.0 * (qj * qj + qk * qk)))


def calc_yaw_difference(yaw_1: float, yaw_2: float) -> float:
    """Signed smallest difference yaw_2 - yaw_1, wrapped to (-pi, pi]."""
    return float(wrap_to_pi(np.asarray(yaw_2 - yaw_1)))


def pose_matrix(x: float, y: float, yaw: float) -> np.ndarray:
    """3x3 homogeneous planar transform."""
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, x], [s, c, y], [0.0, 0.0, 1.0]])
