"""sglang_custom_tpu — a TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SGLang
(reference: Luoxiaogan/sglang_CUSTOM, surveyed in SURVEY.md): continuous
batching with chunked prefill, paged KV cache with RadixAttention prefix
caching, quantization, constrained decoding, speculative decoding and a
cache-aware multi-instance router — engineered TPU-first (SPMD over a
device mesh, bucketed jit programs instead of CUDA graphs, Pallas kernels
for the hot ops).
"""

from sglang_custom_tpu.version import __version__

__all__ = ["__version__"]
