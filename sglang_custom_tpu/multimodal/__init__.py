from sglang_custom_tpu.multimodal.processor import (
    MultimodalProcessor,
    expand_image_tokens,
)
from sglang_custom_tpu.multimodal.cache import MultimodalCache

__all__ = ["MultimodalProcessor", "MultimodalCache", "expand_image_tokens"]
