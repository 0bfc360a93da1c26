"""BitsAndBytes checkpoint loading (nf4 / fp4 / LLM.int8).

Capability analog of the reference's BitsAndBytesModelLoader
(reference: srt/model_loader/loader.py:765 — loads bnb-quantized HF
checkpoints and dequantizes per-layer through bitsandbytes CUDA kernels).
TPU re-design: there is no bitsandbytes runtime here and no nf4 compute on
the MXU, so the packed tensors are dequantized **on the host at load time**
from their serialized quant state — the lookup tables and absmax scales the
checkpoint itself carries — and flow into the normal staging path, where
they can be re-quantized to the TPU-native W4A16 group layout
(``--quantization w4a16``) or served bf16.

Serialized layout (one quantized ``X.weight``):
- ``X.weight``                packed uint8, 2 nibbles/byte (4-bit) or int8
- ``X.weight.absmax``         per-block scale (uint8 when double-quantized)
- ``X.weight.quant_map``      float32[16] nf4/fp4 code table
- ``X.weight.nested_absmax``  float32 per-256-block scale of absmax
- ``X.weight.nested_quant_map`` float32[256] code table for absmax
- ``X.weight.quant_state.bitsandbytes__nf4`` JSON bytes: blocksize, shape,
  nested offset, dtypes
- LLM.int8: ``X.weight`` int8 + ``X.SCB`` float32 per-row scale
"""

from __future__ import annotations

import json

import numpy as np

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

_STATE_SUFFIXES = (
    ".quant_state.bitsandbytes__nf4",
    ".quant_state.bitsandbytes__fp4",
)


def _dequant_absmax(raw: dict, base: str, state: dict) -> np.ndarray:
    """absmax is itself blockwise-int8 quantized when double_quant."""
    absmax = raw[base + ".absmax"]
    if absmax.dtype != np.uint8:
        return absmax.astype(np.float32)
    nested_map = raw[base + ".nested_quant_map"].astype(np.float32)
    nested_absmax = raw[base + ".nested_absmax"].astype(np.float32)
    nbs = int(state.get("nested_blocksize", 256))
    offset = float(state.get("nested_offset", 0.0))
    idx = np.arange(absmax.size) // nbs
    return nested_map[absmax.reshape(-1)] * nested_absmax[idx] + offset


def dequantize_4bit(raw: dict, base: str, state: dict) -> np.ndarray:
    """Packed nf4/fp4 -> float32 [out, in] (torch weight convention)."""
    packed = raw[base].reshape(-1)
    qmap = raw[base + ".quant_map"].astype(np.float32)
    absmax = _dequant_absmax(raw, base, state)
    bs = int(state.get("blocksize", 64))
    # 2 nibbles per byte, high nibble first (bitsandbytes pack order)
    nibbles = np.empty(packed.size * 2, np.uint8)
    nibbles[0::2] = packed >> 4
    nibbles[1::2] = packed & 0xF
    shape = state["shape"]
    n = int(np.prod(shape))
    vals = qmap[nibbles[:n]] * absmax[np.arange(n) // bs]
    return vals.reshape(shape).astype(np.float32)


def dequantize_int8(w: np.ndarray, scb: np.ndarray) -> np.ndarray:
    """LLM.int8 rowwise: w_int8 * SCB / 127 -> float32 [out, in]."""
    return w.astype(np.float32) * (
        scb.astype(np.float32)[:, None] / 127.0
    )


class BnbStateDict:
    """Reads bnb safetensors files and presents the DEQUANTIZED float
    view with the `safe_open` interface (keys / get_tensor) so the normal
    load_weights staging loop consumes it unchanged."""

    def __init__(self, files):
        import torch
        from safetensors import safe_open

        raw = {}
        for f in files:
            with safe_open(f, framework="pt") as st:
                for name in st.keys():
                    t = st.get_tensor(name)
                    raw[name] = (
                        t.numpy() if t.dtype != torch.bfloat16
                        else t.float().numpy()
                    )

        self._t = {}
        states = {}
        for name, t in raw.items():
            for suf in _STATE_SUFFIXES:
                if name.endswith(suf):
                    base = name[: -len(suf)]
                    states[base] = json.loads(bytes(t.reshape(-1)))
        n4 = n8 = 0
        for base, state in states.items():
            self._t[base] = dequantize_4bit(raw, base, state)
            n4 += 1
        for name, t in raw.items():
            if name in self._t:
                continue
            if name.endswith(
                (".absmax", ".quant_map", ".nested_absmax",
                 ".nested_quant_map", ".SCB") + _STATE_SUFFIXES
            ):
                continue
            if t.dtype == np.int8 and name + ".SCB" in raw:
                self._t[name] = dequantize_int8(t, raw[name + ".SCB"])
                n8 += 1
            elif t.dtype == np.int8 and name.endswith(".weight") and (
                name[: -len(".weight")] + ".SCB" in raw
            ):
                self._t[name] = dequantize_int8(
                    t, raw[name[: -len(".weight")] + ".SCB"]
                )
                n8 += 1
            else:
                self._t[name] = t
        logger.info(
            "bitsandbytes checkpoint: dequantized %d 4-bit + %d int8 "
            "tensors on host", n4, n8,
        )

    # safe_open interface -------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def keys(self):
        return self._t.keys()

    def get_tensor(self, name):
        import torch

        return torch.from_numpy(np.ascontiguousarray(self._t[name]))
