"""End-to-end multi-worker routing: N real servers + C++ router + load gen.

reference: sglang_test_framework/tests/routing_test.py — boot N workers +
router, drive load, check balancing and metrics (the fork's core
experiment loop).
"""

import argparse
import asyncio
import json
import urllib.request

import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

from sglang_custom_tpu.router import launch_router
from sglang_custom_tpu.test_framework import MetricsCollector
from sglang_custom_tpu.test_framework.server_manager import (
    ServerManager,
    free_port,
)


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llama_mw")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    mgr = ServerManager()
    for _ in range(2):
        mgr.launch_worker(
            str(path), device="cpu", skip_tokenizer_init=True,
            dtype="float32", page_size=16, max_num_pages=256,
        )
    mgr.wait_healthy(timeout=300)
    handle = launch_router(free_port(), mgr.urls, policy="round_robin")
    yield handle, mgr
    handle.shutdown()
    mgr.shutdown()


def test_routed_load(cluster):
    handle, mgr = cluster
    import bench_serving

    args = argparse.Namespace(
        base_url=handle.base_url, num_prompts=8,
        request_rate=float("inf"), input_len=16, output_len=8,
        vocab_size=500, seed=0,
    )
    collector = asyncio.run(bench_serving.run_benchmark(args))
    s = collector.summary()
    assert s["num_finished"] == 8 and s["num_failed"] == 0
    assert s["output_token_throughput_tps"] > 0
    assert s["mean_ttft_s"] is not None

    # both workers served traffic (round robin)
    with urllib.request.urlopen(handle.base_url + "/get_loads", timeout=10) as r:
        loads = json.loads(r.read())["loads"]
    totals = [w["total"] for w in loads]
    assert sum(totals) == 8 and all(t > 0 for t in totals)
