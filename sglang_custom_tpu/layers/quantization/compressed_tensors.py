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

    Validates EVERY config group (checkpoints can carry several); all
    groups must resolve to the same supported scheme — a later group with
    an unsupported 4-bit/group spec must fail here, not load garbage
    (round-3 advisor finding). Resolution mirrors the reference's
    ``get_scheme``.
    """
    groups = qc.get("config_groups") or {}
    schemes = set()
    for gname, g in groups.items():
        w = g.get("weights") or {}
        bits = w.get("num_bits", 8)
        ty = w.get("type", "int")
        if bits != 8:
            raise ValueError(
                f"compressed-tensors: only 8-bit weights supported, "
                f"group {gname!r} has {bits}"
            )
        if w.get("strategy") == "group":
            raise ValueError(
                f"compressed-tensors: group-strategy weights unsupported "
                f"(group {gname!r}; use channel/tensor)"
            )
        schemes.add("fp8" if ty == "float" else "int8")
    if len(schemes) > 1:
        raise ValueError(
            f"compressed-tensors: mixed schemes across config groups "
            f"unsupported: {sorted(schemes)}"
        )
    if schemes:
        return schemes.pop()
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
