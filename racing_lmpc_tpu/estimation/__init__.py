"""State estimation."""

from racing_lmpc_tpu.estimation.ekf import (
    EKFStateEstimator,
    EKFAlreadyInitializedException,
    EKFUninitializedException,
    NoObservationRegisteredException,
    ObservationNameAlreadyExistsException,
    ObservationNameNotFoundException,
)

__all__ = [
    "EKFStateEstimator",
    "EKFAlreadyInitializedException",
    "EKFUninitializedException",
    "NoObservationRegisteredException",
    "ObservationNameAlreadyExistsException",
    "ObservationNameNotFoundException",
]
