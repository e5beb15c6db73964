"""Controllers and control-loop orchestration."""

from racing_lmpc_tpu.control.loop import MPCController, ControllerState
from racing_lmpc_tpu.control.legacy_lmpc import (
    RacingLMPCLegacy,
    RacingLMPCLegacyConfig,
)
from racing_lmpc_tpu.control.pid import PidController, PidCoefficients
from racing_lmpc_tpu.control.vanilla import VanillaController

__all__ = [
    "MPCController",
    "ControllerState",
    "PidController",
    "PidCoefficients",
    "RacingLMPCLegacy",
    "RacingLMPCLegacyConfig",
    "VanillaController",
]
