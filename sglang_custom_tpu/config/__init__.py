from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs

__all__ = ["ModelConfig", "ServerArgs"]
