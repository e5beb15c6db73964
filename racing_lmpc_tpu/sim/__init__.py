"""Vehicle plant simulation: single-step and vectorized lap rollouts."""

from racing_lmpc_tpu.sim.simulator import RacingSimulator

__all__ = ["RacingSimulator"]
