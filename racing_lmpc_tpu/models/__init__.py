"""Vehicle dynamics models as pure JAX functions with AD Jacobians."""

from racing_lmpc_tpu.models.base import (
    BaseXIndex,
    BaseUIndex,
    VehicleModel,
    VehicleState,
    GRAVITY,
)
from racing_lmpc_tpu.models.single_track import SingleTrackPlanarModel, SimpleUIndex
from racing_lmpc_tpu.models.kinematic_bicycle import KinematicBicycleModel
from racing_lmpc_tpu.models.double_track import DoubleTrackPlanarModel
from racing_lmpc_tpu.models.factory import load_vehicle_model

__all__ = [
    "BaseXIndex",
    "BaseUIndex",
    "VehicleModel",
    "VehicleState",
    "GRAVITY",
    "SingleTrackPlanarModel",
    "SimpleUIndex",
    "KinematicBicycleModel",
    "DoubleTrackPlanarModel",
    "load_vehicle_model",
]
