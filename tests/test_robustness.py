"""Robustness plumbing: watchdog, crash dump, NaN detection, KV events.

Reference analogs: scheduler watchdog (srt/managers/scheduler.py:2186),
crash dump (tokenizer_manager.py:1284 dump_requests_before_crash),
NaN detection (layers/sampler.py:63 enable_nan_detection), KV events
(disaggregation/kv_events.py:119 + radix take_events).
"""

import glob
import json
import os
import time

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

GREEDY = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}


def _mk(ckpt, **kw):
    return Engine(
        server_args=ServerArgs(
            model_path=ckpt, page_size=16, skip_tokenizer_init=True,
            context_length=256, dtype="float32", device="cpu", **kw,
        ),
        num_pages=128,
    )


def test_kv_events(tiny_llama_path):
    eng = _mk(tiny_llama_path, enable_kv_events=True)
    eng.generate(input_ids=list(range(2, 40)), sampling_params=dict(GREEDY))
    ev = eng.get_kv_events()
    kinds = {e["event"] for e in ev}
    assert "block_stored" in kinds, ev
    assert eng.get_kv_events() == []  # drained
    while eng.scheduler.has_work:
        time.sleep(0.01)
    eng.flush_cache()
    ev = eng.get_kv_events()
    assert any(e["event"] == "all_cleared" for e in ev)
    eng.shutdown()


def test_crash_dump_on_step_failure(tiny_llama_path, tmp_path):
    dump_dir = str(tmp_path / "dumps")
    eng = _mk(tiny_llama_path, crash_dump_folder=dump_dir)
    # Poison the runner: next step raises -> _fail_all -> crash dump
    orig = eng.runner.forward_hot_async

    def boom(batch):
        raise RuntimeError("injected device failure")

    eng.runner.forward_hot_async = boom
    eng.runner.forward = boom
    out = eng.generate(
        input_ids=[2, 3, 4, 5], sampling_params=dict(GREEDY)
    )
    assert out["meta_info"]["finish_reason"]["type"] == "abort"
    dumps = glob.glob(os.path.join(dump_dir, "crash_*.json"))
    assert dumps, "no crash dump written"
    with open(dumps[0]) as f:
        d = json.load(f)
    assert d["requests"] and d["requests"][0]["prompt_len"] == 4
    eng.runner.forward_hot_async = orig
    eng.shutdown()


def test_watchdog_fires_on_stuck_step(tiny_llama_path, tmp_path):
    dump_dir = str(tmp_path / "wdumps")
    eng = _mk(
        tiny_llama_path, watchdog_timeout=0.5, crash_dump_folder=dump_dir,
    )
    orig = eng.runner.forward_hot_async
    release = {"t": time.time() + 2.0}

    def slow(batch):
        while time.time() < release["t"]:
            time.sleep(0.01)
        return orig(batch)

    eng.runner.forward_hot_async = slow
    eng.runner_forward_orig = orig
    out = eng.generate(input_ids=[2, 3, 4], sampling_params=dict(GREEDY))
    assert len(out["output_ids"]) == GREEDY["max_new_tokens"]
    assert eng.scheduler_thread.watchdog_fired >= 1
    assert glob.glob(os.path.join(dump_dir, "crash_*.json"))
    eng.runner.forward_hot_async = orig
    eng.shutdown()


def test_nan_detection_aborts_request(tiny_llama_path):
    eng = _mk(tiny_llama_path, enable_nan_detection=True)
    # sane request first
    ok = eng.generate(input_ids=[2, 3, 9], sampling_params=dict(GREEDY))
    assert len(ok["output_ids"]) == GREEDY["max_new_tokens"]
    # poison the fetched logprobs
    orig = eng.runner.collect_hot

    def nan_collect(handle):
        tokens, logprobs = orig(handle)
        return tokens, np.full_like(logprobs, np.nan)

    eng.runner.collect_hot = nan_collect
    out = eng.generate(
        input_ids=[2, 3, 4, 5, 6],
        sampling_params={**GREEDY, "max_new_tokens": 64},
    )
    # aborted early rather than streaming NaN garbage forever
    fr = out["meta_info"]["finish_reason"]
    assert (
        len(out["output_ids"]) < 64
        or (isinstance(fr, dict) and fr.get("type") == "abort")
    ), (len(out["output_ids"]), fr)
    eng.runner.collect_hot = orig
    eng.shutdown()
