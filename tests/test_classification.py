"""Reward / sequence-classification serving (models/classify.py).

Reference analog: srt/models/llama_classification.py + qwen2_rm.py served
through the embedding path; test mirrors test/srt classification coverage
by pinning Engine.encode scores against the HF model's logits.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForSequenceClassification

    path = tmp_path_factory.mktemp("tiny_llama_cls")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_labels=3, pad_token_id=0,
    )
    torch.manual_seed(0)
    m = LlamaForSequenceClassification(cfg).to(torch.float32)
    m.save_pretrained(path, safe_serialization=True)
    return str(path), m


def test_classification_scores_match_hf(ckpt):
    import torch

    path, hf = ckpt
    eng = Engine(
        server_args=ServerArgs(model_path=path, dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True),
        num_pages=64,
    )
    assert eng.model_config.num_labels == 3
    assert eng.model_config.is_embedding

    prompts = [[5, 9, 200, 3], [7, 40, 11, 13, 2, 99]]
    outs = eng.encode(input_ids=prompts)
    eng.check_memory()
    eng.shutdown()

    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            want = hf(torch.tensor([ids])).logits[0].numpy()
        got = np.asarray(out["embedding"], np.float32)
        assert got.shape == (3,)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_reward_model_key_map():
    """Qwen2ForRewardModel maps the nn.Sequential score.0/score.2 MLP head
    (reference: qwen2_rm.py:44-48); linear classifiers keep score/v_head."""
    from sglang_custom_tpu.config.model_config import ModelConfig
    from sglang_custom_tpu.models import classify

    kw = dict(
        vocab_size=128, hidden_size=32, num_layers=1, num_q_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=64, rms_norm_eps=1e-6,
        rope_theta=1e4, max_position_embeddings=128, num_labels=1,
    )
    cfg = ModelConfig(architecture="Qwen2ForRewardModel", **kw)
    m = classify.hf_key_map(cfg)
    assert m["score.0.weight"] == (("score_w0",), None, True)
    assert m["score.2.weight"] == (("score_head",), None, True)
    assert "score.weight" not in m  # would silently shadow the MLP head
    shapes = classify.param_shapes(cfg)
    assert shapes["score_w0"].shape == (32, 32)
    assert shapes["score_head"].shape == (32, 1)

    lin = ModelConfig(architecture="LlamaForSequenceClassification", **kw)
    ml = classify.hf_key_map(lin)
    assert ml["score.weight"] == (("score_head",), None, True)
    assert ml["v_head.weight"] == (("score_head",), None, True)


def test_reward_mlp_head_matches_torch():
    """pooled_head with the MLP params reproduces the reference head:
    Linear -> ReLU -> Linear (qwen2_rm.py forward)."""
    import numpy as np
    import torch

    from sglang_custom_tpu.models.classify import pooled_head

    H, n, B = 32, 1, 4
    torch.manual_seed(0)
    seq = torch.nn.Sequential(
        torch.nn.Linear(H, H), torch.nn.ReLU(), torch.nn.Linear(H, n)
    ).float()
    pooled = torch.randn(B, H)
    want = seq(pooled).detach().numpy()

    params = {
        "score_w0": seq[0].weight.detach().numpy().T,
        "score_b0": seq[0].bias.detach().numpy(),
        "score_head": seq[2].weight.detach().numpy().T,
        "score_bias": seq[2].bias.detach().numpy(),
    }
    got = np.asarray(pooled_head(params, pooled.numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
