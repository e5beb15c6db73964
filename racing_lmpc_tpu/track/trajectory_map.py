"""Directory of racelines, indexed by number prefix.

Parity target: ``racing_trajectory_map.cpp:29-60`` — loads every
``NN_name.txt`` in a directory into an int-indexed map for live raceline
switching.
"""

from __future__ import annotations

import re
from pathlib import Path

import jax.numpy as jnp

from racing_lmpc_tpu.track.trajectory import RacingTrajectory

_NAME_RE = re.compile(r"^(\d+)_(.+)\.txt$")


class RacingTrajectoryMap:
    def __init__(self, directory: str | Path, dtype=jnp.float32):
        self.trajectories: dict[int, RacingTrajectory] = {}
        self.names: dict[int, str] = {}
        directory = Path(directory)
        for f in sorted(directory.iterdir()):
            m = _NAME_RE.match(f.name)
            if not m:
                continue
            idx = int(m.group(1))
            self.trajectories[idx] = RacingTrajectory.from_file(f, dtype=dtype)
            self.names[idx] = m.group(2)
        if not self.trajectories:
            raise ValueError(f"no NN_name.txt trajectories found in {directory}")

    def get_trajectory(self, index: int) -> RacingTrajectory:
        return self.trajectories[index]

    def indices(self) -> list[int]:
        return sorted(self.trajectories)
