"""Frenet-frame periodic track model and raceline map."""

from racing_lmpc_tpu.track.trajectory import RacingTrajectory, TrajectoryIndex
from racing_lmpc_tpu.track.trajectory_map import RacingTrajectoryMap

__all__ = ["RacingTrajectory", "TrajectoryIndex", "RacingTrajectoryMap"]
