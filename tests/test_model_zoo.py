"""Golden-model tests for the model zoo: each architecture's greedy output
must match HuggingFace transformers exactly (fp32 CPU vs fp32 CPU).

Reference analog: test/srt/models/test_generation_models.py with
HFRunner/SRTRunner (python/sglang/test/runners.py:129,482).
"""

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

PROMPTS = [[1, 7, 23, 45], [2, 9, 9, 9, 100, 101]]


def _golden_check(hf_model, path, max_new=10, num_pages=256):
    eng = Engine(
        server_args=ServerArgs(
            model_path=path, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True,
        ),
        num_pages=num_pages,
    )
    try:
        ours = eng.generate(
            input_ids=PROMPTS,
            sampling_params={"max_new_tokens": max_new, "temperature": 0.0,
                             "ignore_eos": True},
        )
        for prompt, out in zip(PROMPTS, ours):
            with torch.no_grad():
                hf = hf_model.generate(
                    torch.tensor([prompt]), max_new_tokens=max_new,
                    do_sample=False,
                )
            expect = hf[0, len(prompt):].tolist()
            assert out["output_ids"] == expect, (
                f"{type(hf_model).__name__}: {out['output_ids']} != {expect}"
            )
    finally:
        eng.shutdown()


def _save(model, tmp_path_factory, name):
    path = tmp_path_factory.mktemp(name)
    model.to(torch.float32).save_pretrained(path, safe_serialization=True)
    return str(path)


def test_qwen2_golden(tmp_path_factory):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    m = Qwen2ForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_qwen2"))


def test_qwen3_golden(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    m = Qwen3ForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_qwen3"))


def test_mistral_golden(tmp_path_factory):
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        sliding_window=None,
    )
    torch.manual_seed(3)
    m = MistralForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_mistral"))


def test_mixtral_golden(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        sliding_window=None,
    )
    torch.manual_seed(4)
    m = MixtralForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_mixtral"))


def test_qwen3_moe_golden(tmp_path_factory):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=512, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[],
    )
    torch.manual_seed(5)
    m = Qwen3MoeForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_qwen3moe"))


def test_gemma2_golden(tmp_path_factory):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    torch.manual_seed(6)
    m = Gemma2ForCausalLM(cfg)
    # long prompt so the sliding window actually truncates attention
    global PROMPTS
    old = PROMPTS
    PROMPTS = [list(range(2, 30)), [1, 5, 9]]
    try:
        _golden_check(m, _save(m, tmp_path_factory, "tiny_gemma2"))
    finally:
        PROMPTS = old


def test_gemma3_golden(tmp_path_factory):
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    cfg = Gemma3TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        sliding_window=8, sliding_window_pattern=3,
        query_pre_attn_scalar=16,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
    )
    torch.manual_seed(7)
    m = Gemma3ForCausalLM(cfg)
    global PROMPTS
    old = PROMPTS
    PROMPTS = [list(range(2, 30)), [1, 5, 9]]
    try:
        _golden_check(m, _save(m, tmp_path_factory, "tiny_gemma3"))
    finally:
        PROMPTS = old


def test_deepseek_v2_golden(tmp_path_factory):
    """MLA (q_lora path) + DeepSeek MoE with shared experts, greedy router."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy",
        routed_scaling_factor=1.0, norm_topk_prob=False,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(8)
    m = DeepseekV2ForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_dsv2"))


def test_deepseek_v3_golden(tmp_path_factory):
    """MLA + noaux_tc sigmoid router with e_score_correction_bias."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    m = DeepseekV3ForCausalLM(cfg)
    # bias non-zero so noaux_tc selection differs from plain scores
    with torch.no_grad():
        for layer in m.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_dsv3"))


def test_phi3_golden(tmp_path_factory):
    """Fused qkv_proj / gate_up_proj checkpoint split at load."""
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
    )
    torch.manual_seed(10)
    m = Phi3ForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_phi3"))


def test_glm4_golden(tmp_path_factory):
    """Partial interleaved rope + sandwich norms + qkv bias."""
    from transformers import Glm4Config, Glm4ForCausalLM

    cfg = Glm4Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
    )
    torch.manual_seed(11)
    m = Glm4ForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_glm4"))


def test_glm_golden(tmp_path_factory):
    from transformers import GlmConfig, GlmForCausalLM

    cfg = GlmConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
    )
    torch.manual_seed(12)
    m = GlmForCausalLM(cfg)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_glm"))


def test_llama4_golden(tmp_path_factory):
    """Llama-4 text: interleaved MoE (sigmoid top-1 routing + shared
    expert), NoPE layers with attention temperature tuning, L2 qk-norm
    (reference: srt/models/llama4.py)."""
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    cfg = Llama4TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=48,
        intermediate_size_mlp=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=512,
        tie_word_embeddings=False, attn_temperature_tuning=True,
        use_qk_norm=True,
    )
    torch.manual_seed(11)
    m = Llama4ForCausalLM(cfg)
    global PROMPTS
    old = PROMPTS
    PROMPTS = [list(range(2, 30)), [1, 5, 9]]
    try:
        _golden_check(m, _save(m, tmp_path_factory, "tiny_llama4"))
    finally:
        PROMPTS = old


def test_qwen2_moe_golden(tmp_path_factory):
    """Qwen2-MoE: routed experts + dense shared expert with sigmoid gate
    (reference: srt/models/qwen2_moe.py)."""
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg = Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=False, mlp_only_layers=[],
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    import torch

    torch.manual_seed(0)
    m = Qwen2MoeForCausalLM(cfg).to(torch.float32)
    _golden_check(m, _save(m, tmp_path_factory, "tiny_qwen2moe"))
