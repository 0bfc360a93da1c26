"""HTTP server + OpenAI endpoint tests (CPU, real aiohttp server on a port).

Reference analog: test/srt/test_srt_endpoint.py, openai_server/basic —
boot a real server, hit HTTP endpoints (popen_launch_server pattern,
python/sglang/test/test_utils.py:457 — here in-process since the TPU build
is single-process).
"""

import asyncio
import json
import socket
import threading

import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine
from sglang_custom_tpu.entrypoints.http_server import HttpServer, _run_app


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    from transformers import GPT2TokenizerFast, LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_http")
    cfg = LlamaConfig(
        vocab_size=50257,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    tok = GPT2TokenizerFast.from_pretrained("gpt2") if False else None
    # Build a small tokenizer locally (no network): use the HF tokenizers lib.
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    t = Tokenizer(models.BPE(unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<unk>", "<s>", "</s>"]
    )
    t.train_from_iterator(
        ["hello world this is a test of the tokenizer " * 5,
         "the quick brown fox jumps over the lazy dog " * 5],
        trainer,
    )
    from transformers import PreTrainedTokenizerFast

    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}assistant:"
    )
    fast.save_pretrained(path)
    return str(path)


@pytest.fixture(scope="module")
def server(tiny_ckpt):
    args = ServerArgs(
        model_path=tiny_ckpt,
        dtype="float32",
        device="cpu",
        page_size=16,
        port=_free_port(),
    )
    engine = Engine(server_args=args, num_pages=256)
    srv = HttpServer(engine)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_box = {}

    def run():
        asyncio.set_event_loop(loop)
        runner_box["runner"] = loop.run_until_complete(
            _run_app(srv.app, args.host, args.port)
        )
        started.set()
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert started.wait(timeout=30)
    yield f"http://{args.host}:{args.port}", engine
    loop.call_soon_threadsafe(loop.stop)
    th.join(timeout=5)
    engine.shutdown()


def _req(url, method="GET", body=None):
    import urllib.request

    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r, timeout=120) as resp:
        return resp.status, resp.read().decode()


def test_health(server):
    url, _ = server
    status, body = _req(f"{url}/health")
    assert status == 200 and body == "OK"


def test_generate_text(server):
    url, _ = server
    status, body = _req(
        f"{url}/generate", "POST",
        {"text": "hello world", "sampling_params": {"max_new_tokens": 8}},
    )
    assert status == 200
    out = json.loads(body)
    assert "text" in out and len(out["output_ids"]) <= 8
    assert out["meta_info"]["prompt_tokens"] > 0


def test_generate_input_ids(server):
    url, _ = server
    status, body = _req(
        f"{url}/generate", "POST",
        {"input_ids": [5, 6, 7], "sampling_params": {"max_new_tokens": 4}},
    )
    assert status == 200
    assert len(json.loads(body)["output_ids"]) <= 4


def test_generate_stream(server):
    url, _ = server
    import urllib.request

    r = urllib.request.Request(
        f"{url}/generate",
        data=json.dumps({
            "text": "the quick brown",
            "sampling_params": {"max_new_tokens": 6, "ignore_eos": True},
            "stream": True,
        }).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(r, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for line in resp:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
    assert chunks and chunks[-1]["meta_info"]["finish_reason"]["type"]


def test_generate_errors(server):
    url, _ = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{url}/generate", "POST", {"sampling_params": {}})
    assert e.value.code == 400


def test_openai_models(server):
    url, _ = server
    status, body = _req(f"{url}/v1/models")
    assert status == 200
    assert json.loads(body)["data"][0]["object"] == "model"


def test_openai_completions(server):
    url, _ = server
    status, body = _req(
        f"{url}/v1/completions", "POST",
        {"model": "m", "prompt": "hello world", "max_tokens": 5},
    )
    assert status == 200
    out = json.loads(body)
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] <= 5
    assert out["choices"][0]["finish_reason"] in ("stop", "length")


def test_openai_chat_completions(server):
    url, _ = server
    status, body = _req(
        f"{url}/v1/chat/completions", "POST",
        {"model": "m",
         "messages": [{"role": "user", "content": "hello world"}],
         "max_tokens": 5},
    )
    assert status == 200
    out = json.loads(body)
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_openai_chat_stream(server):
    url, _ = server
    import urllib.request

    r = urllib.request.Request(
        f"{url}/v1/chat/completions",
        data=json.dumps({
            "model": "m",
            "messages": [{"role": "user", "content": "the quick"}],
            "max_tokens": 5, "stream": True,
        }).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    saw_done = False
    chunks = []
    with urllib.request.urlopen(r, timeout=120) as resp:
        for line in resp:
            line = line.decode().strip()
            if line == "data: [DONE]":
                saw_done = True
            elif line.startswith("data: "):
                chunks.append(json.loads(line[6:]))
    assert saw_done and chunks
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_server_info_and_metrics(server):
    url, _ = server
    status, body = _req(f"{url}/get_server_info")
    assert status == 200
    info = json.loads(body)
    assert info["max_running_requests"] > 0
    status, body = _req(f"{url}/metrics")
    assert status == 200 and "sglang_tpu:num_running_reqs" in body
    assert "sglang_tpu:time_to_first_token_seconds" in body
    assert "sglang_tpu:prompt_tokens_total" in body


def test_flush_cache(server):
    url, engine = server
    import time

    deadline = time.monotonic() + 30
    while engine.scheduler.has_work and time.monotonic() < deadline:
        time.sleep(0.05)
    status, body = _req(f"{url}/flush_cache", "POST")
    assert status == 200


def test_openai_embeddings(server):
    """/v1/embeddings (reference: serving_embedding.py OpenAI protocol)."""
    url, _ = server
    status, body = _req(
        f"{url}/v1/embeddings", "POST",
        {"input": ["hello world", "the quick brown fox"]},
    )
    assert status == 200
    out = json.loads(body)
    assert out["object"] == "list" and len(out["data"]) == 2
    import math

    for i, d in enumerate(out["data"]):
        assert d["index"] == i
        norm = math.sqrt(sum(x * x for x in d["embedding"]))
        assert abs(norm - 1.0) < 1e-3
    assert out["usage"]["prompt_tokens"] > 0


def test_encode_and_rerank(server):
    url, _ = server
    status, body = _req(f"{url}/encode", "POST", {"text": "hello world"})
    assert status == 200
    assert "embedding" in json.loads(body)

    status, body = _req(
        f"{url}/v1/rerank", "POST",
        {
            "query": "the quick brown fox",
            "documents": ["hello hello", "the quick brown fox", "test of"],
        },
    )
    assert status == 200
    ranked = json.loads(body)
    assert ranked[0]["document"] == "the quick brown fox"
    assert ranked[0]["relevance_score"] > ranked[-1]["relevance_score"]
