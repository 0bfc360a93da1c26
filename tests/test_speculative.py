"""Speculative decoding tests.

Correctness contract: greedy speculative output must EXACTLY equal greedy
non-speculative output — acceptance only affects speed, never the token
stream (reference test strategy: test/srt/test_eagle_infer.py compares
outputs with and without speculation).
"""

import json
import os
import tempfile

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


def _write_cfg(d, **kw):
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": 256,
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_hidden_layers": 4,
        "num_attention_heads": 8,
        "num_key_value_heads": 4,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "max_position_embeddings": 512,
    }
    cfg.update(kw)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    return d


@pytest.fixture(scope="module")
def paths():
    base = tempfile.mkdtemp()
    target = _write_cfg(os.path.join(base, "target"))
    eagle = _write_cfg(
        os.path.join(base, "eagle"), num_hidden_layers=1
    )
    small = _write_cfg(
        os.path.join(base, "small"), num_hidden_layers=2, hidden_size=128
    )
    return target, eagle, small


DS_KW = dict(
    vocab_size=256, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=48, num_attention_heads=4,
    num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=24,
    qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
    n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
    first_k_dense_replace=1, topk_method="greedy",
    routed_scaling_factor=1.0, norm_topk_prob=False,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def ds_paths():
    base = tempfile.mkdtemp()
    target = _write_cfg(
        os.path.join(base, "ds_target"),
        architectures=["DeepseekV2ForCausalLM"], num_hidden_layers=3,
        **DS_KW,
    )
    # NextN draft: single MoE decoder layer on the same MLA geometry
    # (reference: deepseek_nextn.py — first_k_dense_replace=0 so the one
    # layer is the MoE layer, as in real DSv3 MTP modules)
    nextn = _write_cfg(
        os.path.join(base, "ds_nextn"),
        architectures=["DeepseekV2ForCausalLM"], num_hidden_layers=1,
        **{**DS_KW, "first_k_dense_replace": 0},
    )
    return target, nextn


def _make_engine(target, spec_algo=None, draft=None, **kw):
    args = ServerArgs(
        model_path=target,
        load_format="dummy",
        device="cpu",
        dtype="float32",
        kv_cache_dtype="float32",
        page_size=16,
        skip_tokenizer_init=True,
        context_length=256,
        speculative_algorithm=spec_algo,
        speculative_draft_model_path=draft,
        decode_burst_size=1,
        **{"speculative_num_draft_tokens": 4, **kw},
    )
    return Engine(server_args=args, num_pages=128)


PROMPTS = [
    [1, 5, 9, 200, 17],
    [3, 3, 7],
    [11, 42, 42, 42, 99, 100, 101, 7, 8],
]


def _greedy_outputs(eng, max_new=24):
    outs = []
    for p in PROMPTS:
        o = eng.generate(
            input_ids=list(p),
            sampling_params={"max_new_tokens": max_new, "temperature": 0.0,
                             "ignore_eos": True},
        )
        outs.append(o["output_ids"])
    return outs


class TestEagleSpec:
    def test_greedy_matches_baseline(self, paths):
        target, eagle, _ = paths
        base = _make_engine(target)
        expected = _greedy_outputs(base)
        base.shutdown()

        eng = _make_engine(target, spec_algo="eagle", draft=eagle)
        got = _greedy_outputs(eng)
        assert got == expected
        # all feature slots returned
        eng.scheduler.check_memory()
        assert len(eng.spec_runner._free_slots) == eng.spec_runner.max_slots
        eng.shutdown()

    def test_batched_spec(self, paths):
        target, eagle, _ = paths
        eng = _make_engine(target, spec_algo="eagle", draft=eagle)
        outs = eng.generate(
            input_ids=[list(p) for p in PROMPTS],
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(outs) == 3
        for o in outs:
            assert len(o["output_ids"]) == 12
        assert eng.spec_runner.num_spec_steps > 0
        eng.shutdown()

    def test_sampled_spec_runs(self, paths):
        target, eagle, _ = paths
        eng = _make_engine(target, spec_algo="eagle", draft=eagle)
        o = eng.generate(
            input_ids=[2, 4, 6, 8],
            sampling_params={"max_new_tokens": 16, "temperature": 0.8,
                             "top_p": 0.9, "ignore_eos": True},
        )
        assert len(o["output_ids"]) == 16
        eng.shutdown()

    def test_spec_with_penalties_falls_back(self, paths):
        """Penalty requests bypass the spec path but still work."""
        target, eagle, _ = paths
        eng = _make_engine(target, spec_algo="eagle", draft=eagle)
        o = eng.generate(
            input_ids=[2, 4, 6, 8],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "frequency_penalty": 0.5, "ignore_eos": True},
        )
        assert len(o["output_ids"]) == 8
        eng.scheduler.check_memory()
        eng.shutdown()

    def test_prefix_cache_with_spec(self, paths):
        target, eagle, _ = paths
        eng = _make_engine(target, spec_algo="eagle", draft=eagle)
        p = list(range(2, 60))
        o1 = eng.generate(input_ids=p, sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True})
        o2 = eng.generate(input_ids=p, sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True})
        assert o2["meta_info"]["cached_tokens"] > 0
        assert o1["output_ids"] == o2["output_ids"]
        eng.shutdown()


class TestNextNSpec:
    """DeepSeek NextN/MTP draft on the MLA backend (reference:
    srt/models/deepseek_nextn.py; VERDICT r3 #9). Greedy spec output must
    EXACTLY match greedy non-spec output — acceptance affects speed only."""

    def test_greedy_matches_baseline_mla(self, ds_paths):
        target, nextn = ds_paths
        base = _make_engine(target)
        expected = _greedy_outputs(base, max_new=16)
        base.shutdown()

        eng = _make_engine(target, spec_algo="nextn", draft=nextn)
        got = _greedy_outputs(eng, max_new=16)
        assert got == expected
        assert eng.spec_runner.num_spec_steps > 0
        # accept-length stat exists and is sane (1 = bonus token only)
        assert eng.spec_runner.avg_accept_len >= 1.0
        eng.scheduler.check_memory()
        assert len(eng.spec_runner._free_slots) == eng.spec_runner.max_slots
        eng.shutdown()

    def test_nextn_param_alignment(self, ds_paths):
        """NextN key map covers the HF layers.{n}.* naming and the module
        exposes the eh_proj/enorm/hnorm head (deepseek_nextn.py:64-68)."""
        from sglang_custom_tpu.config.model_config import ModelConfig
        from sglang_custom_tpu.models import deepseek_nextn

        _, nextn = ds_paths
        cfg = ModelConfig.from_model_path(nextn)
        shapes = deepseek_nextn.param_shapes(cfg)
        assert shapes["eh_proj"].shape == (2 * cfg.hidden_size,
                                           cfg.hidden_size)
        m = deepseek_nextn.hf_key_map(cfg)
        assert "model.layers.1.eh_proj.weight" in m
        assert "model.layers.1.shared_head.norm.weight" in m


class TestStandaloneDraftSpec:
    def test_greedy_matches_baseline(self, paths):
        target, _, small = paths
        base = _make_engine(target)
        expected = _greedy_outputs(base, max_new=16)
        base.shutdown()

        eng = _make_engine(target, spec_algo="draft", draft=small)
        got = _greedy_outputs(eng, max_new=16)
        assert got == expected
        eng.scheduler.check_memory()
        eng.shutdown()

    def test_accept_stats(self, paths):
        target, _, small = paths
        eng = _make_engine(target, spec_algo="draft", draft=small)
        _greedy_outputs(eng, max_new=8)
        assert eng.spec_runner.avg_accept_len >= 1.0
        eng.shutdown()


class TestChunkedPrefillSpec:
    def test_chunked_prefill_greedy(self, paths):
        target, eagle, _ = paths
        base = _make_engine(target)
        p = list(np.arange(2, 120) % 250)
        expected = base.generate(input_ids=p, sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True,
        })["output_ids"]
        base.shutdown()

        eng = _make_engine(target, spec_algo="eagle", draft=eagle,
                           chunked_prefill_size=32)
        got = eng.generate(input_ids=p, sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True,
        })["output_ids"]
        assert got == expected
        eng.shutdown()

class TestTreeSpec:
    """EAGLE-style static TREE speculation (round 2; reference:
    build_eagle_tree.py + tree verify eagle_worker.py:636)."""

    def test_topology_invariants(self):
        from sglang_custom_tpu.speculative.tree import build_topology

        t = build_topology(topk=4, depth=3, budget=8)
        assert t.n_nodes == 8 and t.max_depth <= 3
        # parents precede children; depth-1 nodes have the root as parent
        for i, p in enumerate(t.parent):
            assert p <= i  # verify index of node i+1 is > parent's
        assert t.children[0, 0] == 1  # root's top-0 child is node 1
        # ancestor matrix: every node's path is ancestor-closed
        for i in range(t.n_nodes):
            v = i + 1
            p = t.parent[i]
            assert t.ancestors[v, v] and t.ancestors[v, p]
        # chain degenerate case
        c = build_topology(topk=1, depth=3, budget=8)
        assert c.is_chain and c.n_nodes == 3

    def test_tree_greedy_matches_baseline(self, paths):
        target, eagle, _ = paths
        base = _make_engine(target)
        expected = _greedy_outputs(base)
        base.shutdown()

        eng = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            speculative_eagle_topk=4, speculative_num_steps=3,
            speculative_num_draft_tokens=8,
        )
        got = _greedy_outputs(eng)
        assert got == expected
        eng.scheduler.check_memory()
        eng.shutdown()

    def test_tree_standalone_draft_matches_baseline(self, paths):
        target, _, small = paths
        base = _make_engine(target)
        expected = _greedy_outputs(base)
        base.shutdown()

        eng = _make_engine(
            target, spec_algo="draft", draft=small,
            speculative_eagle_topk=2, speculative_num_steps=3,
            speculative_num_draft_tokens=6,
        )
        got = _greedy_outputs(eng)
        assert got == expected
        eng.shutdown()

    def test_accept_length_floor_perfect_draft(self, paths):
        """Accept-length regression floor (VERDICT round 1 weak #7): with
        the draft == the target model and greedy sampling, every draft
        node on the backbone matches the target sample, so each spec step
        must accept the full chain depth (accept length = depth + 1)."""
        target, _, _ = paths
        eng = _make_engine(
            target, spec_algo="draft", draft=target,
            speculative_eagle_topk=1, speculative_num_steps=3,
            speculative_num_draft_tokens=3,
        )
        _greedy_outputs(eng, max_new=16)
        # exactness of the dummy weights: identical models, identical
        # inputs -> identical argmax; floor leaves margin for the final
        # short step of each request.
        assert eng.spec_runner.avg_accept_len >= 3.0, (
            eng.spec_runner.avg_accept_len
        )
        eng.shutdown()

    def test_tree_sampled_runs(self, paths):
        target, eagle, _ = paths
        eng = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            speculative_eagle_topk=4, speculative_num_steps=2,
            speculative_num_draft_tokens=6,
        )
        o = eng.generate(
            input_ids=[2, 4, 6, 8],
            sampling_params={"max_new_tokens": 16, "temperature": 0.8,
                             "top_p": 0.9, "ignore_eos": True},
        )
        assert len(o["output_ids"]) == 16
        eng.scheduler.check_memory()
        eng.shutdown()


class TestPallasTreeBackend:
    """The spec tree path through the PALLAS extend kernel (interpret mode
    on CPU) — the production TPU configuration (round-3 VERDICT #2: no
    more XLA fallback for tree masks)."""

    def test_tree_spec_pallas_matches_baseline(self, tmp_path):
        # head_dim 64 so the Pallas kernels support the geometry
        target = _write_cfg(
            str(tmp_path / "t64"), hidden_size=128,
            num_attention_heads=2, num_key_value_heads=2,
            num_hidden_layers=2,
        )
        eagle = _write_cfg(
            str(tmp_path / "e64"), hidden_size=128,
            num_attention_heads=2, num_key_value_heads=2,
            num_hidden_layers=1,
        )
        base = _make_engine(target, attention_backend="pallas")
        expected = _greedy_outputs(base)
        base.shutdown()

        eng = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            attention_backend="pallas",
            speculative_eagle_topk=2, speculative_num_steps=2,
            speculative_num_draft_tokens=4,
        )
        from sglang_custom_tpu.layers.attention.pallas_backend import (
            PallasAttentionBackend,
        )

        assert isinstance(
            eng.spec_runner.verify_backend, PallasAttentionBackend
        )
        got = _greedy_outputs(eng)
        assert got == expected
        eng.scheduler.check_memory()
        eng.shutdown()


class TestSpecBurst:
    """Fused multi-step spec burst (speculative_burst_size > 1): S
    draft->verify->accept chains per dispatch with on-device
    token/position feedback must reproduce the per-step path exactly."""

    def test_burst_greedy_matches_baseline(self, paths):
        target, eagle, _ = paths
        base = _make_engine(target)
        expected = _greedy_outputs(base)
        base.shutdown()

        eng = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            speculative_burst_size=4,
        )
        got = _greedy_outputs(eng)
        assert got == expected
        eng.scheduler.check_memory()
        eng.shutdown()

    def test_burst_equals_single_step(self, paths):
        target, eagle, _ = paths
        e1 = _make_engine(target, spec_algo="eagle", draft=eagle)
        a = _greedy_outputs(e1)
        acc1 = e1.spec_runner.avg_accept_len
        e1.shutdown()
        e4 = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            speculative_burst_size=4,
        )
        b = _greedy_outputs(e4)
        assert a == b
        e4.scheduler.check_memory()
        e4.shutdown()


class TestSimulatedAcceptance:
    """speculative_simulate_acc is the bench's regime-map instrument; the
    burst unpack once misread sim_p (r5: read before the f32 block the
    host packs first) and silently rejected every draft. Pin the accept
    length at sim_p=1.0 for both the per-step and burst paths."""

    @pytest.mark.parametrize("burst", [1, 4])
    def test_full_accept_reaches_depth(self, paths, burst):
        target, eagle, _ = paths
        eng = _make_engine(
            target, spec_algo="eagle", draft=eagle,
            speculative_simulate_acc=True,
            speculative_burst_size=burst,
        )
        _greedy_outputs(eng, max_new=16)
        # chain depth 3 + bonus = 4 emitted per accepted step
        assert eng.spec_runner.avg_accept_len > 3.0
        eng.shutdown()
