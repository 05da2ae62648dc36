from pemp_tpu.config.node import ConfigNode
from pemp_tpu.config.defaults import get_config, update_config, update_config_command
from pemp_tpu.config.hrnet_defaults import get_hrnet_config

__all__ = [
    "ConfigNode",
    "get_config",
    "update_config",
    "update_config_command",
    "get_hrnet_config",
]
