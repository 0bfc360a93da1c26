from sglang_custom_tpu.utils.logging import configure_logger, get_logger

__all__ = ["configure_logger", "get_logger"]
