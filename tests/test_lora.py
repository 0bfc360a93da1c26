"""Batched multi-adapter LoRA serving tests.

Reference analog: test/srt/models/lora/test_lora.py — adapter outputs
compared against the base model with the LoRA delta merged into its
weights (W' = W + (alpha/r) * B @ A).
"""

import json

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

PROMPTS = [[1, 7, 23, 45], [2, 9, 9, 100, 101]]
TARGETS = ["q_proj", "v_proj", "gate_proj"]


def _make_adapter(tmp_path, hf_model, r=4, alpha=8, seed=0):
    """Write a PEFT-format adapter dir and return (path, merged hf model)."""
    import copy

    from safetensors.numpy import save_file

    rng = np.random.RandomState(seed)
    cfg = hf_model.config
    weights = {}
    merged = copy.deepcopy(hf_model)
    for l, layer in enumerate(merged.model.layers):
        for t in TARGETS:
            mod = (
                getattr(layer.self_attn, t, None)
                or getattr(layer.mlp, t, None)
            )
            din = mod.weight.shape[1]
            dout = mod.weight.shape[0]
            A = (rng.randn(r, din) * 0.05).astype(np.float32)
            B = (rng.randn(dout, r) * 0.05).astype(np.float32)
            prefix = "self_attn" if hasattr(layer.self_attn, t) else "mlp"
            stem = f"base_model.model.model.layers.{l}.{prefix}.{t}"
            weights[stem + ".lora_A.weight"] = A
            weights[stem + ".lora_B.weight"] = B
            with torch.no_grad():
                mod.weight += torch.tensor((alpha / r) * (B @ A))
    path = tmp_path / "adapter"
    path.mkdir()
    save_file(weights, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha, "target_modules": TARGETS})
    )
    return str(path), merged


@pytest.fixture(scope="module")
def lora_setup(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    base = LlamaForCausalLM(cfg).to(torch.float32)
    root = tmp_path_factory.mktemp("lora")
    base_path = root / "base"
    base.save_pretrained(base_path, safe_serialization=True)
    adapter_path, merged = _make_adapter(root, base)
    eng = Engine(
        server_args=ServerArgs(
            model_path=str(base_path), dtype="float32", device="cpu",
            page_size=16, skip_tokenizer_init=True, enable_lora=True,
            max_lora_rank=8,
        ),
        num_pages=256,
    )
    yield eng, base, merged, adapter_path
    eng.shutdown()


def _hf_greedy(model, prompt, n):
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False
        )
    return out[0, len(prompt):].tolist()


def test_lora_matches_merged_model(lora_setup):
    eng, base, merged, adapter = lora_setup
    outs = eng.generate(
        input_ids=PROMPTS,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
        lora_path=adapter,
    )
    for prompt, out in zip(PROMPTS, outs):
        assert out["output_ids"] == _hf_greedy(merged, prompt, 8)
    eng.check_memory()


def test_mixed_lora_and_base_batch(lora_setup):
    """One request with the adapter, one without, in the same batch: the
    base request must match the base model exactly (slot 0 = zero adapter)."""
    eng, base, merged, adapter = lora_setup
    outs = eng.generate(
        input_ids=PROMPTS,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
        lora_path=[adapter, None],
    )
    assert outs[0]["output_ids"] == _hf_greedy(merged, PROMPTS[0], 8)
    assert outs[1]["output_ids"] == _hf_greedy(base, PROMPTS[1], 8)
    eng.check_memory()


def test_lora_load_unload(lora_setup):
    eng, base, merged, adapter = lora_setup
    res = eng.load_lora_adapter("named", adapter)
    assert res["success"]
    out = eng.generate(
        input_ids=PROMPTS[0],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                         "ignore_eos": True},
        lora_path="named",
    )
    assert out["output_ids"] == _hf_greedy(merged, PROMPTS[0], 4)
    assert eng.unload_lora_adapter("named")["success"]
    # after unload the name is gone; a fresh path load still works
    assert not eng.unload_lora_adapter("named")["success"]


def test_lora_with_penalties(lora_setup):
    """LoRA composes with the penalized sampling path."""
    eng, base, merged, adapter = lora_setup
    out = eng.generate(
        input_ids=PROMPTS[0],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True, "repetition_penalty": 1.1},
        lora_path=adapter,
    )
    assert len(out["output_ids"]) == 6
    eng.check_memory()
