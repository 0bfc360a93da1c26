"""Hierarchical (host-offload) KV cache tests.

Reference analog: test/srt/test_hicache.py — evict under HBM pressure,
verify the prefix comes back from the host tier with identical outputs.
"""

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def hicache_engine(tiny_llama_path):
    eng = Engine(
        server_args=ServerArgs(
            model_path=tiny_llama_path, dtype="float32", device="cpu",
            page_size=4, skip_tokenizer_init=True,
            enable_hierarchical_cache=True, hicache_host_pages=256,
            chunked_prefill_size=64,
        ),
        num_pages=48,  # 192 tokens of device KV: tight, forces eviction
    )
    yield eng
    eng.shutdown()


GREEDY = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}


def test_offload_and_reload_roundtrip(hicache_engine):
    eng = hicache_engine
    tree = eng.scheduler.tree_cache
    prompt_a = [(7 * i + 3) % 400 + 2 for i in range(100)]
    prompt_b = [(11 * i + 5) % 400 + 2 for i in range(100)]

    out_a1 = eng.generate(input_ids=prompt_a, sampling_params=GREEDY)
    # B evicts A's pages from the 192-token device pool -> host tier
    eng.generate(input_ids=prompt_b, sampling_params=GREEDY)
    assert tree.offloaded_tokens > 0, tree.host_stats()

    out_a2 = eng.generate(input_ids=prompt_a, sampling_params=GREEDY)
    assert tree.loaded_tokens > 0, tree.host_stats()
    # the host round-trip preserved the KV bytes: identical greedy output,
    # and the prefix was served from cache rather than recomputed
    assert out_a2["output_ids"] == out_a1["output_ids"]
    assert out_a2["meta_info"]["cached_tokens"] > 0
    eng.check_memory()
    tree.sanity_check()


def test_hicache_many_interleaved(hicache_engine):
    """Churn several prefixes through the two tiers; outputs must stay
    deterministic and the page accounting leak-free."""
    eng = hicache_engine
    prompts = [
        [(13 * i + s) % 400 + 2 for i in range(80)] for s in range(5)
    ]
    first = [
        eng.generate(input_ids=p, sampling_params=GREEDY)["output_ids"]
        for p in prompts
    ]
    second = [
        eng.generate(input_ids=p, sampling_params=GREEDY)["output_ids"]
        for p in prompts
    ]
    assert first == second
    eng.check_memory()
    eng.scheduler.tree_cache.sanity_check()


def test_hicache_host_pressure(hicache_engine):
    """Exceed the host tier too: hard drops must keep the tree consistent."""
    eng = hicache_engine
    tree = eng.scheduler.tree_cache
    for s in range(20):
        p = [(17 * i + 7 * s) % 400 + 2 for i in range(90)]
        out = eng.generate(input_ids=p, sampling_params=GREEDY)
        assert len(out["output_ids"]) == 8
    eng.check_memory()
    tree.sanity_check()
    stats = tree.host_stats()
    assert stats["host_pages_used"] <= stats["host_pages_total"]


@pytest.fixture()
def storage_engine(tiny_llama_path, tmp_path):
    eng = Engine(
        server_args=ServerArgs(
            model_path=tiny_llama_path, dtype="float32", device="cpu",
            page_size=4, skip_tokenizer_init=True,
            enable_hierarchical_cache=True, hicache_host_pages=16,
            hicache_storage_dir=str(tmp_path / "kvstore"),
            chunked_prefill_size=64,
        ),
        num_pages=48,
    )
    yield eng
    eng.shutdown()


def test_storage_tier_roundtrip(storage_engine):
    """Device -> host -> storage -> back: host tier is tiny (16 pages), so
    churning three prompts demotes write-through nodes to disk; a later
    prefix hit must restore identical KV (reference:
    mem_cache/hicache_storage.py + cache_controller prefetch threads)."""
    eng = storage_engine
    tree = eng.scheduler.tree_cache
    prompts = [
        [(7 * i + s * 13) % 400 + 2 for i in range(100)] for s in range(3)
    ]
    first = [
        eng.generate(input_ids=p, sampling_params=GREEDY)["output_ids"]
        for p in prompts
    ]
    tree.controller.drain()
    # churn: each regenerate evicts others device->host->storage
    stats = tree.host_stats()
    second = [
        eng.generate(input_ids=p, sampling_params=GREEDY) for p in prompts
    ]
    for want, got in zip(first, second):
        assert got["output_ids"] == want
    assert tree.offloaded_tokens > 0
    stats = tree.host_stats()
    eng.check_memory()
    tree.controller.drain()
    tree.sanity_check()


def test_storage_prefetch_hit(storage_engine):
    """Force a node all the way to the storage tier, then assert the
    prefetch hook + match restore it with identical outputs and that the
    storage tier actually served bytes."""
    eng = storage_engine
    tree = eng.scheduler.tree_cache
    prompt = [(3 * i + 11) % 400 + 2 for i in range(96)]
    out1 = eng.generate(input_ids=prompt, sampling_params=GREEDY)
    import time as _t

    deadline = _t.time() + 10
    while _t.time() < deadline and eng.scheduler.has_work:
        _t.sleep(0.01)
    # manually push the whole tree to storage: evict device -> host, then
    # squeeze the host pool so write-through nodes demote to disk
    tree.evict(10**6)
    tree.controller.drain()
    tree._reclaim_host(tree.host_pool.num_pages)  # demote all to storage
    assert tree.host_stats()["storage_nodes"] > 0, tree.host_stats()

    out2 = eng.generate(input_ids=prompt, sampling_params=GREEDY)
    assert out2["output_ids"] == out1["output_ids"]
    assert tree.storage_hit_tokens > 0
    assert out2["meta_info"]["cached_tokens"] > 0
    eng.check_memory()
    tree.controller.drain()
    tree.sanity_check()
