"""Test configuration: run everything on a virtual 8-device CPU platform.

Mirrors the reference's distributed-test strategy (SURVEY.md §4: single-host
multi-chip as the distributed tier) using XLA's host-platform device count.
Must run before jax initializes a backend.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_llama_path(tmp_path_factory):
    """Create a tiny random HF Llama checkpoint on disk (golden-model source).

    Reference analog: tests use tiny models + HFRunner golden comparison
    (python/sglang/test/runners.py:129)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM, GPT2TokenizerFast

    path = tmp_path_factory.mktemp("tiny_llama")
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model = model.to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="session")
def hf_tiny_model(tiny_llama_path):
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(tiny_llama_path, torch_dtype=torch.float32)
    model.eval()
    return model
