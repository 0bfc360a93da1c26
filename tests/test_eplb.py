"""Runtime EPLB: live expert-placement rebalance on a serving engine.

Reference analog: srt/eplb/eplb_manager.py + expert_location_updater.py —
record routing load, recompute placement, move expert weights without
restarting. Correctness contract: the permuted model computes the
IDENTICAL function (softmax/top-k commute with router permutation), so
outputs never change and the KV cache stays valid.
"""

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def moe_ckpt(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    path = tmp_path_factory.mktemp("eplb_mixtral")
    cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        sliding_window=None,
    )
    torch.manual_seed(4)
    MixtralForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    return str(path)


SP = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
PROMPTS = [[5, 9, 200, 3, 17], [7, 40, 11], [1, 2, 3, 4, 5, 6]]


def test_live_rebalance_preserves_outputs(moe_ckpt):
    eng = Engine(
        server_args=ServerArgs(
            model_path=moe_ckpt, dtype="float32", device="cpu",
            page_size=16, skip_tokenizer_init=True, enable_eplb=True,
            eplb_min_recorded_steps=2,
        ),
        num_pages=128,
    )
    try:
        assert eng.eplb_manager is not None
        base = [
            eng.generate(input_ids=list(p), sampling_params=dict(SP))
            for p in PROMPTS
        ]

        # not enough data yet -> graceful refusal
        r = eng.rebalance_experts()
        assert not r["success"]

        assert eng.start_expert_distribution_record()["success"]
        for p in PROMPTS:
            eng.generate(input_ids=list(p), sampling_params=dict(SP))
        dump = eng.dump_expert_distribution_record()
        assert dump["success"] and dump["num_steps"] >= 2
        eng.stop_expert_distribution_record()

        r = eng.rebalance_experts()
        assert r["success"], r
        assert r["imbalance_after"] <= r["imbalance_before"] + 1e-9
        # placement actually changed OR load was already perfectly even
        meta = eng.eplb_manager.meta
        ident = np.tile(np.arange(meta.num_experts), (meta.num_layers, 1))
        moved = not np.array_equal(meta.physical_to_logical, ident)
        assert moved or r["imbalance_before"] == pytest.approx(1.0, abs=1e-6)

        # the permuted model serves bit-identically, prefix cache intact
        eng.flush_cache()
        for p, b in zip(PROMPTS, base):
            out = eng.generate(input_ids=list(p), sampling_params=dict(SP))
            assert out["output_ids"] == b["output_ids"]

        # second record/rebalance cycle composes placements correctly
        eng.start_expert_distribution_record()
        for p in PROMPTS:
            eng.generate(input_ids=list(p), sampling_params=dict(SP))
        r2 = eng.rebalance_experts()
        assert r2["success"], r2
        eng.flush_cache()
        out = eng.generate(
            input_ids=list(PROMPTS[0]), sampling_params=dict(SP)
        )
        assert out["output_ids"] == base[0]["output_ids"]
        eng.check_memory()
    finally:
        eng.shutdown()
