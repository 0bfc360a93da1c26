"""Retraction + overlap state-machine tests (round-3 VERDICT #4).

The overlap scheduler's most intricate state is the interaction between
memory-pressure retraction, in-flight device rows (virtual lengths,
generation-stamped invalidation), and chunked prefill. These tests force a
tiny KV pool while the overlap pipeline is full and assert: no page leaks,
no stale-token corruption, and byte-identical greedy output vs an
unpressured run (reference semantics: test/srt/test_retract_decode.py,
schedule_batch.py:1362 retract_decode).
"""

import time

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_retract")
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


def _mk(ckpt, num_pages, **kw):
    args = ServerArgs(
        model_path=ckpt, dtype="float32", device="cpu", page_size=16,
        skip_tokenizer_init=True, **kw,
    )
    return Engine(server_args=args, num_pages=num_pages)


def _drain(eng, deadline_s=60):
    deadline = time.monotonic() + deadline_s
    while eng.scheduler.has_work and time.monotonic() < deadline:
        time.sleep(0.02)
    assert not eng.scheduler.has_work, "scheduler did not drain"


SP = {"max_new_tokens": 48, "temperature": 0.0, "ignore_eos": True}


def _prompts(n, length=32):
    rng = np.random.RandomState(7)
    return [list(rng.randint(1, 500, size=length)) for _ in range(n)]


def test_retraction_under_overlap_matches_unpressured(ckpt):
    """Greedy outputs under forced retraction == outputs with ample memory,
    and the tiny pool ends leak-free."""
    prompts = _prompts(4)

    big = _mk(ckpt, num_pages=256)
    base = big.generate(input_ids=prompts, sampling_params=SP)
    big.shutdown()

    # 4 reqs x (32 prompt + 48 out) = 320 tokens = 20 pages > 14 -> pressure
    # mid-decode, while the overlap pipeline has dispatched rows in flight.
    small = _mk(ckpt, num_pages=14)
    out = small.generate(input_ids=prompts, sampling_params=SP)
    assert small.scheduler.num_retractions > 0, (
        "test geometry no longer forces retraction"
    )
    _drain(small)
    small.check_memory()  # no page leaks, tree consistent
    small.shutdown()

    for b, o in zip(base, out):
        assert b["output_ids"] == o["output_ids"], "retraction corrupted output"


def test_retraction_with_burst_overlap(ckpt):
    """Same under decode-burst: a retracted row's uncollected burst tokens
    must be discarded (generation stamp), then regenerated identically."""
    prompts = _prompts(4)
    sp = dict(SP)

    big = _mk(ckpt, num_pages=256, decode_burst_size=4)
    base = big.generate(input_ids=prompts, sampling_params=sp)
    big.shutdown()

    small = _mk(ckpt, num_pages=14, decode_burst_size=4)
    out = small.generate(input_ids=prompts, sampling_params=sp)
    assert small.scheduler.num_retractions > 0
    _drain(small)
    small.check_memory()
    small.shutdown()

    for b, o in zip(base, out):
        assert b["output_ids"] == o["output_ids"]


def test_chunked_prefill_while_overlapped(ckpt):
    """A long prompt chunk-prefills while other rows decode through the
    overlap pipeline; outputs must match the unconstrained run."""
    long_prompt = list(np.random.RandomState(3).randint(1, 500, size=96))
    short = _prompts(2, length=8)
    prompts = short + [long_prompt]

    big = _mk(ckpt, num_pages=256)
    base = big.generate(input_ids=prompts, sampling_params=SP)
    big.shutdown()

    eng = _mk(ckpt, num_pages=256, chunked_prefill_size=32,
              max_prefill_tokens=32)
    out = eng.generate(input_ids=prompts, sampling_params=SP)
    _drain(eng)
    eng.check_memory()
    eng.shutdown()

    for b, o in zip(base, out):
        assert b["output_ids"] == o["output_ids"]


def test_chunked_prefill_under_pressure(ckpt):
    """Chunked prefill + retraction together: the chunked request survives
    decode-side retraction and completes correctly."""
    long_prompt = list(np.random.RandomState(5).randint(1, 500, size=64))
    prompts = _prompts(3, length=24) + [long_prompt]

    big = _mk(ckpt, num_pages=256)
    base = big.generate(input_ids=prompts, sampling_params=SP)
    big.shutdown()

    eng = _mk(ckpt, num_pages=16, chunked_prefill_size=32,
              max_prefill_tokens=32)
    out = eng.generate(input_ids=prompts, sampling_params=SP)
    _drain(eng)
    eng.check_memory()
    eng.shutdown()

    for b, o in zip(base, out):
        assert b["output_ids"] == o["output_ids"]


def test_abort_while_inflight(ckpt):
    """Aborting a request whose rows are dispatched-but-uncollected must not
    corrupt the others or leak pages."""
    prompts = _prompts(3)
    eng = _mk(ckpt, num_pages=64)

    base = eng.generate(input_ids=prompts, sampling_params=SP)

    # Resubmit async, then abort one mid-flight.
    ids, sps, _ = eng._normalize_inputs(None, prompts, SP)
    states = eng._submit(ids, sps)
    time.sleep(0.1)  # let the pipeline fill
    victim_rid = states[1].req.rid
    eng.abort_request(victim_rid)
    _drain(eng)
    eng.check_memory()

    # Remaining rows still produced the right tokens.
    for i in (0, 2):
        st = states[i]
        deadline = time.monotonic() + 30
        while not st.req.finished and time.monotonic() < deadline:
            time.sleep(0.02)
        assert st.req.output_ids == base[i]["output_ids"]
    eng.shutdown()
