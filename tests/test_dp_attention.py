"""DP-attention + two-batch overlap numerics on the virtual CPU mesh.

The reference gates dp-attention behind multi-GPU MLA serving
(srt/layers/dp_attention.py, tested via test/srt multi-GPU tiers); here the
whole engine runs with tp=2/tp=4 on the 8-device CPU mesh and greedy
outputs are diffed against the single-device baseline. Capacity is set
drop-free (capacity_factor >= tp) so expert-parallel execution must be
bit-compatible with the dense GSPMD MoE path.
"""

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

PROMPTS = [[1, 44, 7, 99, 3, 250], [9, 8, 7, 101], [5] * 24, [12, 13]]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv2_dp")
    cfg = DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy",
        routed_scaling_factor=1.0, norm_topk_prob=False,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    DeepseekV2ForCausalLM(cfg).to(torch.float32).save_pretrained(
        str(path), safe_serialization=True
    )
    return str(path)


def run_engine(ckpt, tp, dp_attention, tbo=1):
    eng = Engine(
        server_args=ServerArgs(
            model_path=ckpt, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True, tp_size=tp,
            attention_backend="xla", context_length=256,
            enable_dp_attention=dp_attention,
            # drop-free capacity: every assignment fits on its chip
            dp_attention_capacity_factor=float(max(tp, 1)),
            tbo_microbatches=tbo,
        ),
        num_pages=128,
    )
    outs = eng.generate(
        input_ids=PROMPTS,
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
        },
    )
    eng.check_memory()
    eng.shutdown()
    return [o["output_ids"] for o in outs]


@pytest.fixture(scope="module")
def baseline(ckpt):
    return run_engine(ckpt, tp=1, dp_attention=False)


@pytest.mark.parametrize("tp", [2, 4])
def test_dp_attention_matches_baseline(ckpt, baseline, tp):
    got = run_engine(ckpt, tp=tp, dp_attention=True)
    assert got == baseline


def test_two_batch_overlap_matches_baseline(ckpt, baseline):
    got = run_engine(ckpt, tp=2, dp_attention=True, tbo=2)
    assert got == baseline


def test_dp_attention_rejects_non_mla(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_nodp")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    LlamaForCausalLM(cfg).save_pretrained(str(path), safe_serialization=True)
    with pytest.raises(ValueError, match="dp-attention"):
        Engine(
            server_args=ServerArgs(
                model_path=str(path), dtype="float32", device="cpu",
                skip_tokenizer_init=True, tp_size=2,
                enable_dp_attention=True, context_length=128,
            ),
            num_pages=32,
        )
