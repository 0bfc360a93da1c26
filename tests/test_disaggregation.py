"""PD (prefill/decode) disaggregation tests.

Reference analog: test/srt/test_disaggregation.py — prefill server +
decode server on one host, fake/loopback KV backend stubbing the network
(srt/disaggregation/fake/conn.py).
"""

import threading

import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.disaggregation import (
    FakeKVTransfer,
    TCPKVReceiver,
    TCPKVSender,
)
from sglang_custom_tpu.entrypoints.engine import Engine

GREEDY = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}
PROMPT = [(7 * i + 3) % 400 + 2 for i in range(50)]


@pytest.fixture(scope="module")
def pd_engines(tiny_llama_path):
    mk = lambda: Engine(
        server_args=ServerArgs(
            model_path=tiny_llama_path, dtype="float32", device="cpu",
            page_size=4, skip_tokenizer_init=True,
        ),
        num_pages=128,
    )
    prefill, decode = mk(), mk()
    yield prefill, decode
    prefill.shutdown()
    decode.shutdown()


def test_pd_fake_backend_matches_single_engine(pd_engines):
    prefill, decode = pd_engines
    expected = prefill.generate(input_ids=PROMPT, sampling_params=GREEDY)

    fake = FakeKVTransfer()
    res = prefill.pd_prefill(PROMPT, "room1", fake, GREEDY)
    assert res["transferred_pages"] > 0
    out = decode.pd_generate("room1", fake)
    assert out["output_ids"] == expected["output_ids"]
    # the grafted prefix must be served from cache, not recomputed
    assert out["meta_info"]["cached_tokens"] > 0
    prefill.check_memory()
    decode.check_memory()


def test_pd_tcp_backend(pd_engines):
    prefill, decode = pd_engines
    expected = prefill.generate(input_ids=PROMPT, sampling_params=GREEDY)

    receiver = TCPKVReceiver()
    try:
        sender = TCPKVSender(receiver.host, receiver.port)
        # sender and receiver halves on different threads, like two hosts
        t = threading.Thread(
            target=prefill.pd_prefill, args=(PROMPT, "r2", sender, GREEDY)
        )
        t.start()
        out = decode.pd_generate("r2", receiver)
        t.join()
        assert out["output_ids"] == expected["output_ids"]
        assert out["meta_info"]["transferred_pages"] > 0
    finally:
        receiver.close()


def test_pd_decode_mode_engine(tiny_llama_path):
    """--disaggregation-mode decode creates the KV listener and reports it
    in server info (what the mini-LB discovers)."""
    eng = Engine(
        server_args=ServerArgs(
            model_path=tiny_llama_path, dtype="float32", device="cpu",
            page_size=4, skip_tokenizer_init=True,
            disaggregation_mode="decode",
        ),
        num_pages=64,
    )
    try:
        assert eng.kv_receiver is not None
        info = eng.get_server_info()
        assert info["kv_port"] > 0
    finally:
        eng.kv_receiver.close()
        eng.shutdown()


def test_pd_transfer_timeout():
    fake = FakeKVTransfer()
    with pytest.raises(TimeoutError):
        fake.recv("missing-room", timeout=0.1)
