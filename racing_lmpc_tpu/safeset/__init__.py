"""Safe set: the LMPC terminal-constraint data structure."""

from racing_lmpc_tpu.safeset.safe_set import (
    SafeSetManager,
    SafeSetRecorder,
    SSQuery,
    SSResult,
    RegQuery,
    RegResult,
)

__all__ = [
    "SafeSetManager",
    "SafeSetRecorder",
    "SSQuery",
    "SSResult",
    "RegQuery",
    "RegResult",
]
