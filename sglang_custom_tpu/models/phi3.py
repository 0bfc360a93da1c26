"""Phi-3 family: llama-structured decoder with fused checkpoint tensors.

Re-design of the reference's phi3 support (reference: srt/models/phi3_small.py
and the Phi3 entries of srt/models/llama.py's weight mapping): the compute
graph is exactly models/llama.py (same scanned layers); only the HF
checkpoint layout differs — ``self_attn.qkv_proj`` and ``mlp.gate_up_proj``
ship fused and are split by row-slice at load (model_loader/loader.py's
sliced multi-destination map entries).

Note: long-context Phi-3 variants use "longrope" scaling, which is not yet
implemented (rope_inv_freq falls back to unscaled frequencies); the 4k
base models use standard RoPE and match HF exactly.
"""

from __future__ import annotations

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models import llama

param_shapes = llama.param_shapes
param_shardings = llama.param_shardings
forward = llama.forward
forward_features = llama.forward_features
compute_last_logits = llama.compute_last_logits


def hf_key_map(cfg: ModelConfig) -> dict:
    D = cfg.head_dim
    nq = cfg.num_q_heads * D
    nkv = cfg.num_kv_heads * D
    I = cfg.intermediate_size
    m = {
        "model.embed_tokens.weight": (("embed",), None, False),
        "model.norm.weight": (("final_norm",), None, False),
        "lm_head.weight": (("lm_head",), None, True),
    }
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        m[p + "input_layernorm.weight"] = (("layers", "input_norm"), l, False)
        m[p + "self_attn.qkv_proj.weight"] = [
            (("layers", "q_proj"), l, True, (0, nq)),
            (("layers", "k_proj"), l, True, (nq, nq + nkv)),
            (("layers", "v_proj"), l, True, (nq + nkv, nq + 2 * nkv)),
        ]
        m[p + "self_attn.o_proj.weight"] = (("layers", "o_proj"), l, True)
        m[p + "post_attention_layernorm.weight"] = (
            ("layers", "post_norm"), l, False,
        )
        m[p + "mlp.gate_up_proj.weight"] = [
            (("layers", "gate_proj"), l, True, (0, I)),
            (("layers", "up_proj"), l, True, (I, 2 * I)),
        ]
        m[p + "mlp.down_proj.weight"] = (("layers", "down_proj"), l, True)
    return m
