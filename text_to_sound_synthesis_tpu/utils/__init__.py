from .config import (
    Registry,
    instantiate_from_config,
    load_yaml_config,
    merge_opts_to_config,
    register,
    save_config_to_yaml,
)
