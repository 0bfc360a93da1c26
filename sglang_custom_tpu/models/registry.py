"""Architecture -> model-module registry.

Analog of the reference's model registry (reference: srt/models/registry.py
— maps HF `architectures[0]` to a model class). Here a "model" is a module
of pure functions:

    param_shapes(cfg)            -> pytree of ShapeDtypeStruct
    param_shardings(cfg, mesh)   -> pytree of NamedSharding
    forward(params, cfg, meta, kv, backend) -> (hidden, kv)
    compute_last_logits(params, hidden, meta) -> [B, V] f32
    hf_key_map(cfg) -> {hf_name: (path, layer_index|(l,e)|None, transpose)}
"""

from __future__ import annotations

import types
from typing import Dict

from sglang_custom_tpu.models import (
    classify,
    deepseek,
    gemma,
    glm,
    llama,
    llama4,
    internvl,
    llava,
    qwen2_5_vl,
    mixtral,
    phi3,
)


def _llama_like() -> types.ModuleType:
    return llama


MODEL_REGISTRY: Dict[str, types.ModuleType] = {
    "LlamaForCausalLM": llama,
    "MistralForCausalLM": llama,
    "Qwen2ForCausalLM": llama,
    "Qwen3ForCausalLM": llama,
    "Llama4ForCausalLM": llama4,
    # text tower of the multimodal wrapper (config rewrite analog of
    # Gemma3ForConditionalGeneration below)
    "Llama4ForConditionalGeneration": llama4,
    "MixtralForCausalLM": mixtral,
    "Qwen3MoeForCausalLM": mixtral,
    "Qwen2MoeForCausalLM": mixtral,
    "Phi3ForCausalLM": phi3,
    "GlmForCausalLM": glm,
    "Glm4ForCausalLM": glm,
    "DeepseekV2ForCausalLM": deepseek,
    "DeepseekV3ForCausalLM": deepseek,
    "Gemma2ForCausalLM": gemma,
    "Gemma3ForCausalLM": gemma,
    # multimodal wrapper: ModelConfig.from_hf_dict rewrites it to the text
    # tower (Gemma3ForCausalLM), but register for direct lookups too
    "Gemma3ForConditionalGeneration": gemma,
    # vision-language (reference: srt/models/llava.py, qwen2_5_vl.py)
    "Qwen2_5_VLForConditionalGeneration": qwen2_5_vl,
    "InternVLForConditionalGeneration": internvl,
    "LlavaForConditionalGeneration": llava,
    "LlavaLlamaForCausalLM": llava,
    # reward / sequence classification (reference: srt/models/qwen2_rm.py,
    # llama_classification.py, internlm2_reward.py)
    "LlamaForSequenceClassification": classify,
    "Qwen2ForSequenceClassification": classify,
    "Qwen2ForRewardModel": classify,
    # InternLM2ForRewardModel is intentionally NOT registered: InternLM2
    # checkpoints use tok_embeddings / attention.wqkv (kv-group-interleaved
    # fused qkv) / feed_forward.w1-w3 names that the llama key map cannot
    # express; registering it would silently serve zero weights (round-3
    # advisor finding). Add it back only with a real InternLM2 key map.
}


def get_model(architecture: str) -> types.ModuleType:
    try:
        return MODEL_REGISTRY[architecture]
    except KeyError:
        raise ValueError(
            f"unsupported architecture {architecture!r}; "
            f"known: {sorted(MODEL_REGISTRY)}"
        ) from None
