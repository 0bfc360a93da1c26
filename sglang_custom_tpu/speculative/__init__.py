from sglang_custom_tpu.speculative.eagle_worker import SpecRunner

__all__ = ["SpecRunner"]
