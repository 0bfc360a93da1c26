from sglang_custom_tpu.multimodal.processor import (
    MultimodalProcessor,
    QwenVLProcessor,
    create_processor,
    expand_image_tokens,
    qwen_mrope_positions,
    smart_resize,
)
from sglang_custom_tpu.multimodal.cache import MultimodalCache

__all__ = [
    "MultimodalProcessor",
    "QwenVLProcessor",
    "MultimodalCache",
    "create_processor",
    "expand_image_tokens",
    "qwen_mrope_positions",
    "smart_resize",
]
