from attention_models_tpu.utils.config import Config, load_config, config_from_cli
from attention_models_tpu.utils.prng import RngStream
