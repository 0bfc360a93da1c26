"""Model configuration normalized from HuggingFace configs.

Analog of the reference's ``configs/model_config.py`` (HF config
normalization + quantization detection). Kept minimal and functional: a
frozen dataclass that the model code and KV-cache sizing consume.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    architecture: str
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float
    rope_theta: float
    max_position_embeddings: int
    tie_word_embeddings: bool = False
    rope_scaling: Optional[dict] = None
    quantization: Optional[str] = None
    # MoE (0 experts == dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    # qwen2-style attention bias
    attention_bias: bool = False
    # qwen3-style per-head RMS norm on q/k before RoPE
    qk_norm: bool = False
    # mixtral/qwen-moe router normalizes top-k weights to sum to 1
    norm_topk_prob: bool = True

    @property
    def q_per_kv(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    # quantized-checkpoint metadata (from HF quantization_config)
    quant_group_size: int = 128

    @staticmethod
    def from_hf_dict(cfg: dict) -> "ModelConfig":
        arch = (cfg.get("architectures") or ["LlamaForCausalLM"])[0]
        n_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // n_heads
        rope_scaling = cfg.get("rope_scaling")
        quantization = None
        group_size = 128
        qc = cfg.get("quantization_config")
        if qc:
            quantization = qc.get("quant_method")
            group_size = qc.get("group_size", 128)
            bits = qc.get("bits", qc.get("w_bit", 4))
            if quantization in ("awq", "gptq") and bits != 4:
                raise ValueError(f"{quantization} bits={bits} unsupported")
        return ModelConfig(
            architecture=arch,
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_q_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            intermediate_size=cfg["intermediate_size"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            rope_scaling=rope_scaling,
            num_experts=cfg.get("num_experts", cfg.get("num_local_experts", 0)) or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0) or 0,
            attention_bias=cfg.get("attention_bias", False)
            or arch.startswith("Qwen2"),
            qk_norm=arch.startswith("Qwen3"),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            quantization=quantization,
            quant_group_size=group_size,
        )

    @staticmethod
    def from_model_path(model_path: str) -> "ModelConfig":
        cfg_path = os.path.join(model_path, "config.json")
        with open(cfg_path) as f:
            return ModelConfig.from_hf_dict(json.load(f))
