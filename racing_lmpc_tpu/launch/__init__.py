"""Launch-equivalent scenario runners (reference: racing_lmpc_launch)."""

from racing_lmpc_tpu.launch.runner import (
    CoSimulation,
    sim_barc_lmpc,
    sim_barc_tracking_mpc,
    sim_putnam_short_lmpc,
    sim_putnam_short_tracking_mpc,
    sim_putnam_config_a_tracking_mpc,
)

__all__ = [
    "CoSimulation",
    "sim_barc_lmpc",
    "sim_barc_tracking_mpc",
    "sim_putnam_short_lmpc",
    "sim_putnam_short_tracking_mpc",
    "sim_putnam_config_a_tracking_mpc",
]
