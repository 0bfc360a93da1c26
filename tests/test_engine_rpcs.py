"""Sessions, weight hot-swap, pause/resume, memory release RPCs.

Reference analog: test_srt_endpoint update-weights tests,
session_controller tests, /pause_generation.
"""

import threading
import time

import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

CFG = dict(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, tie_word_embeddings=False,
)


def _ckpt(tmp_path_factory, name, seed):
    path = tmp_path_factory.mktemp(name)
    torch.manual_seed(seed)
    LlamaForCausalLM(LlamaConfig(**CFG)).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    return str(path)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = _ckpt(tmp_path_factory, "rpc_a", 0)
    eng = Engine(
        server_args=ServerArgs(
            model_path=path, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True,
        ),
        num_pages=256,
    )
    yield eng
    eng.shutdown()


def test_session_reuses_kv(engine):
    sid = engine.open_session()
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    out1 = engine.session_generate(sid, input_ids=list(range(10, 50)),
                                   sampling_params=sp)
    out2 = engine.session_generate(sid, input_ids=[60, 61, 62],
                                   sampling_params=sp)
    # second turn prefixes with turn-1 history -> radix cache hit
    assert out2["meta_info"]["cached_tokens"] >= 32
    assert out2["meta_info"]["prompt_tokens"] == 40 + 8 + 3
    engine.close_session(sid)
    with pytest.raises(KeyError):
        engine.session_generate(sid, input_ids=[1])


def test_pause_resume(engine):
    engine.scheduler_thread.pause(drain=True)
    done = threading.Event()
    result = {}

    def submit():
        result["out"] = engine.generate(
            input_ids=[5, 6, 7],
            sampling_params={"max_new_tokens": 4, "ignore_eos": True},
        )
        done.set()

    threading.Thread(target=submit, daemon=True).start()
    time.sleep(0.5)
    assert not done.is_set()  # paused: no progress
    engine.scheduler_thread.resume()
    assert done.wait(timeout=30)
    assert len(result["out"]["output_ids"]) == 4


def test_release_resume_memory(engine):
    engine.release_memory_occupation()
    engine.resume_memory_occupation()
    out = engine.generate(
        input_ids=[9, 9, 9],
        sampling_params={"max_new_tokens": 4, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 4


def test_update_weights(engine, tmp_path_factory):
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    base = engine.generate(input_ids=[1, 2, 3], sampling_params=sp)

    path_b = _ckpt(tmp_path_factory, "rpc_b", 123)
    res = engine.update_weights_from_disk(path_b)
    assert res["success"], res
    new = engine.generate(input_ids=[1, 2, 3], sampling_params=sp)
    assert new["output_ids"] != base["output_ids"]

    # bad path -> graceful failure, still serving
    res = engine.update_weights_from_disk("/nonexistent")
    assert not res["success"]
    again = engine.generate(input_ids=[1, 2, 3], sampling_params=sp)
    assert again["output_ids"] == new["output_ids"]


def test_get_weights_by_name(engine):
    w = engine.get_weights_by_name("layers.q_proj")
    assert w.shape[0] == 2  # stacked layers


def test_update_weights_from_distributed(engine, tmp_path_factory):
    """Trainer-push weight update (reference: scheduler.py:2488
    init_weights_update_group + :2493 update_weights_from_distributed;
    here host-staged TCP, model_executor/weight_update.py). The engine
    must serve EXACTLY what a fresh engine loading the trainer's
    checkpoint serves."""
    import safetensors.torch as st
    import glob

    from sglang_custom_tpu.model_executor.weight_update import (
        WeightUpdateClient,
    )

    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}

    # the "trainer": a fresh random checkpoint's tensors
    path_c = _ckpt(tmp_path_factory, "rpc_c", 999)
    tensors = {}
    for f in glob.glob(path_c + "/*.safetensors"):
        for k, v in st.load_file(f).items():
            tensors[k] = v.float().numpy()

    info = engine.init_weights_update_group()
    assert info["success"]

    done = {}

    def trainer():
        c = WeightUpdateClient(info["host"], info["port"])
        # push in two batches to exercise accumulation
        names = sorted(tensors)
        half = len(names) // 2
        c.push({n: tensors[n] for n in names[:half]})
        c.push({n: tensors[n] for n in names[half:]})
        c.finish()
        done["ok"] = True

    th = threading.Thread(target=trainer)
    th.start()
    res = engine.update_weights_from_distributed(timeout=60)
    th.join(timeout=10)
    assert done.get("ok") and res["success"], res
    assert res["applied"] == len(tensors)

    got = engine.generate(input_ids=[1, 2, 3], sampling_params=sp)

    ref = Engine(
        server_args=ServerArgs(
            model_path=path_c, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True,
        ),
        num_pages=128,
    )
    want = ref.generate(input_ids=[1, 2, 3], sampling_params=sp)
    ref.shutdown()
    assert got["output_ids"] == want["output_ids"]
