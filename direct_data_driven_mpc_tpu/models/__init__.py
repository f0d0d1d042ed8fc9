"""Plant models: functional LTI core + stateful convenience classes."""

from direct_data_driven_mpc_tpu.models.lti_model import (
    LTIModel,
    LTISystemModel,
)
from direct_data_driven_mpc_tpu.ops.lti import LTIParams

__all__ = ["LTIModel", "LTISystemModel", "LTIParams"]
