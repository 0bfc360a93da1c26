"""dp_size>1 serving: replicas behind one Engine (round-3 VERDICT #3).

Reference semantics: managers/data_parallel_controller.py:57 (per-replica
TP groups, round-robin :249 / shortest-queue :266 balancing) and
test/srt/test_data_parallelism.py (dp=2 outputs match dp=1). Runs on the
CPU test mesh (8 virtual devices from tests/conftest.py).
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_dp")
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


def _mk(ckpt, dp, policy="shortest_queue", **kw):
    return Engine(
        server_args=ServerArgs(
            model_path=ckpt, page_size=16, skip_tokenizer_init=True,
            context_length=256, dtype="float32", dp_size=dp,
            dp_balance_policy=policy, **kw,
        ),
        num_pages=256,
    )


PROMPTS = [[1 + i, 7, 9 + i, 200, 3] for i in range(8)]
SP = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}


def test_dp2_matches_dp1(ckpt):
    eng1 = _mk(ckpt, dp=1)
    want = [
        eng1.generate(input_ids=p, sampling_params=dict(SP))["output_ids"]
        for p in PROMPTS
    ]
    eng1.shutdown()

    eng2 = _mk(ckpt, dp=2)
    assert eng2.dp_controller is not None
    assert len(eng2.replicas) == 2
    got = eng2.generate(
        input_ids=PROMPTS, sampling_params=[dict(SP) for _ in PROMPTS]
    )
    for w, g in zip(want, got):
        assert g["output_ids"] == w
    eng2.check_memory()
    eng2.shutdown()


def test_round_robin_uses_both_replicas(ckpt):
    eng = _mk(ckpt, dp=2, policy="round_robin")
    outs = eng.generate(
        input_ids=PROMPTS, sampling_params=[dict(SP) for _ in PROMPTS]
    )
    assert len(outs) == len(PROMPTS)
    stats = eng.scheduler_thread.stats()
    per = stats["per_replica"]
    assert len(per) == 2
    assert all(p["num_generated_tokens"] > 0 for p in per), per
    # aggregate view sums replicas
    assert stats["num_generated_tokens"] == sum(
        p["num_generated_tokens"] for p in per
    )
    eng.shutdown()


def test_dp_abort_and_flush(ckpt):
    eng = _mk(ckpt, dp=2)
    # aborting an unknown rid must not blow up (broadcast path)
    eng.abort_request("nope")
    outs = eng.generate(
        input_ids=PROMPTS[:4], sampling_params=[dict(SP) for _ in range(4)]
    )
    assert all(len(o["output_ids"]) == 12 for o in outs)
    import time

    deadline = time.time() + 10
    while time.time() < deadline and any(
        s.has_work for _, s in eng._replica_views()
    ):
        time.sleep(0.02)
    eng.flush_cache()
    eng.check_memory()
    eng.shutdown()


def test_dp_streaming(ckpt):
    eng = _mk(ckpt, dp=2)
    chunks = list(
        eng.generate(
            input_ids=PROMPTS[:4],
            sampling_params=[dict(SP) for _ in range(4)],
            stream=True,
        )
    )
    finished = [c for c in chunks if c.get("finished")]
    assert len(finished) == 4
    eng.shutdown()
