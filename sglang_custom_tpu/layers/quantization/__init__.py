"""Quantization methods.

Analog of the reference's quantization registry
(reference: srt/layers/quantization/__init__.py:74-106
BASE_QUANTIZATION_METHODS — awq/gptq/fp8/int8/blockwise/compressed-tensors
QuantizationConfig + LinearMethodBase.create_weights/apply pattern).
TPU-first: a "method" here is (a) a load-time weight transform producing a
dict-of-arrays leaf and (b) a matmul implementation ``mm()`` dispatches to
by the leaf's dtype/scale shape (models/llama.py:111).
"""

from sglang_custom_tpu.layers.quantization.w4a16 import (
    pack_w4,
    quantize_w4a16,
    w4a16_matmul,
)
from sglang_custom_tpu.layers.quantization.fp8 import quantize_fp8, fp8_matmul
from sglang_custom_tpu.layers.quantization.int8 import (
    quantize_int8,
    int8_matmul,
)
from sglang_custom_tpu.layers.quantization.blockwise_fp8 import (
    quantize_fp8_blockwise,
    fp8_blockwise_matmul,
)

QUANTIZATION_METHODS = (
    "w4a16", "awq", "gptq", "fp8", "fp8_block", "int8", "compressed-tensors",
)

__all__ = [
    "QUANTIZATION_METHODS",
    "pack_w4",
    "quantize_w4a16",
    "w4a16_matmul",
    "quantize_fp8",
    "fp8_matmul",
    "quantize_int8",
    "int8_matmul",
    "quantize_fp8_blockwise",
    "fp8_blockwise_matmul",
]
