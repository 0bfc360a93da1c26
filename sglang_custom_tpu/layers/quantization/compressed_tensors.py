"""compressed-tensors checkpoint import (llm-compressor / vLLM format).

Analog of the reference's compressed-tensors support (reference:
layers/quantization/compressed_tensors/compressed_tensors.py
CompressedTensorsConfig.get_scheme — W8A8-int8 / FP8 schemes mapped onto
scaled-mm linear methods). Checkpoints store each linear's ``weight``
already quantized (int8 or float8_e4m3) with a ``weight_scale`` companion;
here they convert into the same dict leaves our int8 / fp8 matmuls
dispatch on (models/llama.py:111 mm), so serving needs no
compressed-tensors runtime at all.
"""

from __future__ import annotations

import numpy as np


def parse_ct_scheme(qc: dict) -> str:
    """Map a HF ``quantization_config`` (quant_method=compressed-tensors)
    to a supported scheme name: "int8" or "fp8".

    Reads the first config group's weight spec (num_bits + type), the same
    resolution order as the reference's ``get_scheme``.
    """
    groups = qc.get("config_groups") or {}
    for g in groups.values():
        w = g.get("weights") or {}
        bits = w.get("num_bits", 8)
        ty = w.get("type", "int")
        if bits != 8:
            raise ValueError(
                f"compressed-tensors: only 8-bit weights supported, got {bits}"
            )
        if w.get("strategy") == "group":
            raise ValueError(
                "compressed-tensors: group-strategy weights unsupported "
                "(use channel/tensor)"
            )
        return "fp8" if ty == "float" else "int8"
    # No groups (e.g. pure fp8 dynamic config variant)
    return "fp8"


def convert_ct_tensors(weight: np.ndarray, weight_scale, weight_zero_point=None) -> dict:
    """torch-layout quantized linear -> our matmul leaf.

    ``weight`` is [N, K] (torch out-major) int8 or float8_e4m3;
    ``weight_scale`` is scalar, [N] or [N, 1]. Returns
    {"qweight": [K, N], "scales": [N] f32} matching quantize_int8 /
    quantize_fp8 layouts.
    """
    if weight_zero_point is not None and np.any(
        np.asarray(weight_zero_point) != 0
    ):
        raise NotImplementedError(
            "compressed-tensors: asymmetric weight zero-points unsupported"
        )
    N = weight.shape[0]
    if weight_scale is None:
        raise FileNotFoundError("compressed-tensors: missing weight_scale")
    s = np.asarray(weight_scale, dtype=np.float32).reshape(-1)
    if s.size == 1:
        s = np.full((N,), float(s[0]), np.float32)
    assert s.size == N, (s.size, N)
    qweight = np.ascontiguousarray(weight.T)  # [K, N], dtype preserved
    return {"qweight": qweight, "scales": s}
