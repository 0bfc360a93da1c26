"""Penalty / min_new_tokens / logprob sampling tests.

Reference analog: test/srt/sampling/penaltylib tests + sampling params
coverage in test_srt_endpoint.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine
from sglang_custom_tpu.layers.sampler import PenaltyMeta, apply_penalties


def test_apply_penalties_math():
    B, V = 2, 8
    logits = jnp.asarray(np.zeros((B, V), np.float32))
    pm = PenaltyMeta(
        output_ids=jnp.asarray([[1, 2, 1, 0], [3, 0, 0, 0]], jnp.int32),
        output_len=jnp.asarray([3, 1], jnp.int32),
        frequency_penalty=jnp.asarray([0.5, 0.0], jnp.float32),
        presence_penalty=jnp.asarray([0.25, 0.0], jnp.float32),
        repetition_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
        block_eos=jnp.asarray([False, True]),
        eos_ids=jnp.asarray([[-1, -1], [5, 7]], jnp.int32),
        vocab_mask=jnp.full((2, 1), 0xFFFFFFFF, jnp.uint32),
        bias_ids=jnp.full((2, 1), -1, jnp.int32),
        bias_vals=jnp.zeros((2, 1), jnp.float32),
    )
    out = np.asarray(apply_penalties(logits, pm))
    # row 0: token 1 appears twice -> -2*0.5 - 0.25; token 2 once -> -0.75
    np.testing.assert_allclose(out[0, 1], -1.25, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], -0.75, atol=1e-6)
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)  # only 2 valid tokens? no: output_len=3 -> ids 1,2,1
    # row 1: blocked eos tokens 5 and 7
    assert out[1, 5] < -1e29 and out[1, 7] < -1e29
    np.testing.assert_allclose(out[1, 3], 0.0, atol=1e-6)  # rep=1, freq=pres=0


def test_repetition_penalty_math():
    logits = jnp.asarray([[2.0, -2.0, 1.0]], jnp.float32)
    pm = PenaltyMeta(
        output_ids=jnp.asarray([[0, 1]], jnp.int32),
        output_len=jnp.asarray([2], jnp.int32),
        frequency_penalty=jnp.zeros((1,), jnp.float32),
        presence_penalty=jnp.zeros((1,), jnp.float32),
        repetition_penalty=jnp.asarray([2.0], jnp.float32),
        block_eos=jnp.asarray([False]),
        eos_ids=jnp.asarray([[-1]], jnp.int32),
        vocab_mask=jnp.full((1, 1), 0xFFFFFFFF, jnp.uint32),
        bias_ids=jnp.full((1, 1), -1, jnp.int32),
        bias_vals=jnp.zeros((1, 1), jnp.float32),
    )
    out = np.asarray(apply_penalties(logits, pm))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0], atol=1e-6)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_samp")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    args = ServerArgs(
        model_path=str(path), dtype="float32", device="cpu",
        page_size=16, skip_tokenizer_init=True,
    )
    eng = Engine(server_args=args, num_pages=256)
    yield eng
    eng.shutdown()


def test_stop_token_and_min_new_tokens(engine):
    base = engine.generate(
        input_ids=[7, 8, 9],
        sampling_params={"max_new_tokens": 10, "temperature": 0.0},
    )
    t1 = base["output_ids"][0]
    stopped = engine.generate(
        input_ids=[7, 8, 9],
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "stop_token_ids": [t1],
        },
    )
    assert stopped["output_ids"] == [t1]
    assert stopped["meta_info"]["finish_reason"]["type"] == "stop"

    forced = engine.generate(
        input_ids=[7, 8, 9],
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0,
            "stop_token_ids": [t1], "min_new_tokens": 5,
        },
    )
    assert len(forced["output_ids"]) >= 5
    assert t1 not in forced["output_ids"][:4]


def test_frequency_penalty_reduces_repeats(engine):
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
    base = engine.generate(input_ids=[5, 5, 5], sampling_params=sp)
    pen = engine.generate(
        input_ids=[5, 5, 5],
        sampling_params={**sp, "frequency_penalty": 2.0},
    )
    def max_count(ids):
        return max(ids.count(t) for t in set(ids))
    assert max_count(pen["output_ids"]) <= max_count(base["output_ids"])
    assert len(set(pen["output_ids"])) >= len(set(base["output_ids"]))


def test_return_logprob(engine):
    out = engine.generate(
        input_ids=[3, 4, 5],
        sampling_params={
            "max_new_tokens": 6, "temperature": 0.0,
            "ignore_eos": True, "return_logprob": True,
        },
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == len(out["output_ids"]) == 6
    assert all(lp <= 0.0 for lp in lps)

    out2 = engine.generate(
        input_ids=[3, 4, 5], sampling_params={"max_new_tokens": 6}
    )
    assert "output_token_logprobs" not in out2["meta_info"]


def test_mixed_penalty_batch(engine):
    """Penalized and non-penalized requests in one continuous batch."""
    outs = engine.generate(
        input_ids=[[1, 2, 3], [4, 5, 6], [7, 8, 9]],
        sampling_params=[
            {"max_new_tokens": 8, "ignore_eos": True},
            {"max_new_tokens": 8, "ignore_eos": True,
             "frequency_penalty": 1.5},
            {"max_new_tokens": 8, "ignore_eos": True,
             "repetition_penalty": 1.5},
        ],
    )
    assert all(len(o["output_ids"]) == 8 for o in outs)


def test_logit_bias_forces_token(engine):
    """OpenAI logit_bias: a +100 bias on one token makes greedy pick it
    (reference: sampling_batch_info apply_logits_bias)."""
    out = engine.generate(
        input_ids=[3, 4, 5],
        sampling_params={
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True,
            "logit_bias": {7: 100.0},
        },
    )
    assert out["output_ids"] == [7, 7, 7, 7]

    # a -100 bias removes a token from greedy support
    base = engine.generate(
        input_ids=[3, 4, 5],
        sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                         "ignore_eos": True},
    )
    banned = base["output_ids"][0]
    out2 = engine.generate(
        input_ids=[3, 4, 5],
        sampling_params={
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True,
            "logit_bias": {banned: -1000.0},
        },
    )
    assert banned not in out2["output_ids"]


def _force_token_3(logits, req):
    logits = logits.copy()
    logits[3] += 1000.0
    return logits


def test_custom_logit_processor(engine):
    """Callable custom logit processor drives the host-sampling cold path
    (reference: srt/sampling/custom_logit_processor.py)."""
    out = engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={
            "max_new_tokens": 3, "temperature": 0.0, "ignore_eos": True,
            "custom_logit_processor": _force_token_3,
        },
    )
    assert out["output_ids"] == [3, 3, 3]

    # importable "module:function" form (the HTTP-friendly spelling) is
    # gated: it imports arbitrary modules server-side, so it must be
    # rejected unless --enable-custom-logit-processor is set (reference:
    # server_args.py enable_custom_logit_processor)
    spec = {
        "max_new_tokens": 3, "temperature": 0.0, "ignore_eos": True,
        "custom_logit_processor":
            "tests.test_sampling_features:_force_token_3",
    }
    with pytest.raises(ValueError, match="enable-custom-logit-processor"):
        engine.generate(input_ids=[5, 6, 7], sampling_params=spec)
    engine.server_args.enable_custom_logit_processor = True
    try:
        out2 = engine.generate(input_ids=[5, 6, 7], sampling_params=spec)
    finally:
        engine.server_args.enable_custom_logit_processor = False
    assert out2["output_ids"] == [3, 3, 3]


def test_custom_processor_mixed_batch(engine):
    """A processor request and a plain request share a continuous batch;
    the plain request's stream must be unaffected."""
    plain = engine.generate(
        input_ids=[9, 8, 7],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
    )
    outs = engine.generate(
        input_ids=[[9, 8, 7], [5, 6, 7]],
        sampling_params=[
            {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
            {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
             "custom_logit_processor": _force_token_3},
        ],
    )
    assert outs[0]["output_ids"] == plain["output_ids"]
    assert outs[1]["output_ids"] == [3] * 6
