from sglang_custom_tpu.lora.lora_manager import LoRAManager

__all__ = ["LoRAManager"]
