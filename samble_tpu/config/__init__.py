from samble_tpu.config.loader import Config, load_config, merge, load_yaml
from samble_tpu.config.validate import check_config

__all__ = ["Config", "load_config", "merge", "load_yaml", "check_config"]
