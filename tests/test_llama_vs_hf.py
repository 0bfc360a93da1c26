"""Golden-model comparison vs HuggingFace transformers.

Reference analog: HFRunner vs SRTRunner diffing
(python/sglang/test/runners.py:129,482 used by
test/srt/models/test_generation_models.py) — same prompts through the HF
model on CPU and through our engine; compare logits and greedy decodes.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def engine(tiny_llama_path):
    args = ServerArgs(
        model_path=tiny_llama_path,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=512,
        schedule_policy="fcfs",
    )
    return Engine(server_args=args, num_pages=256)


def hf_greedy(hf_tiny_model, input_ids, n):
    import torch

    ids = torch.tensor([input_ids])
    with torch.no_grad():
        out = hf_tiny_model.generate(
            ids, max_new_tokens=n, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )
    return out[0, len(input_ids):].tolist()


def test_greedy_single_matches_hf(engine, hf_tiny_model):
    prompt = [1, 5, 9, 200, 404, 17, 3, 77]
    ours = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True},
    )
    theirs = hf_greedy(hf_tiny_model, prompt, 16)
    assert ours["output_ids"] == theirs
    engine.check_memory()


def test_greedy_batch_mixed_lengths(engine, hf_tiny_model):
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 500, size=n)) for n in (3, 17, 31, 64)]
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True},
    )
    for p, o in zip(prompts, outs):
        assert o["output_ids"] == hf_greedy(hf_tiny_model, p, 12), f"prompt len {len(p)}"
    engine.check_memory()


def test_prefix_cache_reuse_matches(engine, hf_tiny_model):
    rng = np.random.RandomState(1)
    shared = list(rng.randint(1, 500, size=40))
    p1 = shared + [7, 8, 9]
    p2 = shared + [100, 101]
    o1 = engine.generate(
        input_ids=p1,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    # Second call should hit the radix cache for the shared prefix.
    o2 = engine.generate(
        input_ids=p2,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    assert o2["meta_info"]["cached_tokens"] >= 40 - engine.server_args.page_size
    assert o1["output_ids"] == hf_greedy(hf_tiny_model, p1, 8)
    assert o2["output_ids"] == hf_greedy(hf_tiny_model, p2, 8)
    engine.check_memory()


def test_chunked_prefill_matches(tiny_llama_path, hf_tiny_model):
    args = ServerArgs(
        model_path=tiny_llama_path,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=512,
        chunked_prefill_size=16,  # force chunking of a 50-token prompt
        schedule_policy="fcfs",
    )
    eng = Engine(server_args=args, num_pages=256)
    rng = np.random.RandomState(2)
    prompt = list(rng.randint(1, 500, size=50))
    ours = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    assert ours["output_ids"] == hf_greedy(hf_tiny_model, prompt, 8)
    eng.check_memory()


def test_max_new_tokens_finish_reason(engine):
    out = engine.generate(
        input_ids=[1, 2, 3],
        sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 5
    assert out["meta_info"]["finish_reason"]["type"] == "length"


def test_stop_token(engine, hf_tiny_model):
    prompt = [1, 5, 9, 200, 404, 17, 3, 77]
    full = hf_greedy(hf_tiny_model, prompt, 16)
    # Pick a stop position whose token has no earlier occurrence, so the
    # truncation point is unambiguous.
    stop_pos = next(i for i in range(2, 16) if full[i] not in full[:i])
    out = engine.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 0.0,
            "stop_token_ids": [full[stop_pos]],
            "ignore_eos": True,
        },
    )
    assert out["output_ids"] == full[: stop_pos + 1]
    assert out["meta_info"]["finish_reason"]["type"] == "stop"
