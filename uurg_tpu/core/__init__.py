from uurg_tpu.core.config import Config, load_config, config_from_dict
from uurg_tpu.core.registry import Registry
from uurg_tpu.core import tree
from uurg_tpu.core import rng
