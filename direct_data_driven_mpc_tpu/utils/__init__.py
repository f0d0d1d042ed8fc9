"""Config loading, parameter derivation, and RNG utilities."""

from direct_data_driven_mpc_tpu.utils.config import (
    load_yaml_config_params,
    get_data_driven_mpc_controller_params,
)

__all__ = [
    "load_yaml_config_params",
    "get_data_driven_mpc_controller_params",
]
