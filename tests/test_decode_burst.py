"""Decode-burst (multi-iteration device decode) correctness.

The burst path must produce byte-identical greedy outputs to single-step
decode — it is the same computation with the host round-trip removed.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_burst")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    return str(path)


def _mk_engine(ckpt, burst):
    return Engine(
        server_args=ServerArgs(
            model_path=ckpt, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True, decode_burst_size=burst,
        ),
        num_pages=128,
    )


def test_burst_matches_single_greedy(ckpt):
    prompts = [[1, 5, 9, 200], [7, 8], list(range(3, 40))]
    sp = {"max_new_tokens": 21, "temperature": 0.0, "ignore_eos": True}

    eng1 = _mk_engine(ckpt, burst=1)
    base = eng1.generate(input_ids=prompts, sampling_params=sp)
    eng1.shutdown()

    eng4 = _mk_engine(ckpt, burst=4)
    out = eng4.generate(input_ids=prompts, sampling_params=sp)
    # run a second wave to exercise page-boundary crossing within bursts
    out2 = eng4.generate(
        input_ids=[9, 9, 9, 9], sampling_params={**sp, "max_new_tokens": 40}
    )
    assert len(out2["output_ids"]) == 40
    import time
    deadline = time.monotonic() + 30
    while eng4.scheduler.has_work and time.monotonic() < deadline:
        time.sleep(0.05)
    eng4.check_memory()
    eng4.shutdown()

    for b, o in zip(base, out):
        assert b["output_ids"] == o["output_ids"]


def test_burst_with_eos_stop(ckpt):
    """A row finishing mid-burst discards the rest of its burst tokens."""
    eng = _mk_engine(ckpt, burst=4)
    base = eng.generate(
        input_ids=[2, 4, 6],
        sampling_params={"max_new_tokens": 16, "temperature": 0.0,
                         "ignore_eos": True},
    )
    t5 = base["output_ids"][5]  # make the 6th token a stop -> mid-burst stop
    # only trigger if t5 doesn't appear earlier
    if t5 not in base["output_ids"][:5]:
        out = eng.generate(
            input_ids=[2, 4, 6],
            sampling_params={"max_new_tokens": 16, "temperature": 0.0,
                             "stop_token_ids": [t5]},
        )
        assert out["output_ids"] == base["output_ids"][:6]
        assert out["meta_info"]["finish_reason"]["type"] == "stop"
    eng.shutdown()


def test_burst_logprobs(ckpt):
    eng = _mk_engine(ckpt, burst=4)
    out = eng.generate(
        input_ids=[3, 4, 5],
        sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                         "ignore_eos": True, "return_logprob": True},
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 12 and all(lp <= 0.0 for lp in lps)
    eng.shutdown()
