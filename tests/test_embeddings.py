"""Embedding / rerank serving tests (CPU).

Reference analog: test/srt/models/test_embedding_models.py +
openai_server embeddings tests — HF golden comparison of pooled hidden
states (python/sglang/test/runners.py HFRunner embedding path) and the
rerank scoring semantics of serving_rerank.
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


def hf_last_hidden(hf_tiny_model, input_ids):
    """Golden: final post-norm hidden state of the last token, unit-norm."""
    import torch

    ids = torch.tensor([input_ids])
    with torch.no_grad():
        out = hf_tiny_model.model(ids, output_hidden_states=True)
    h = out.hidden_states[-1][0, -1].numpy().astype(np.float32)
    return h / max(np.linalg.norm(h), 1e-12)


def test_encode_matches_hf(engine, hf_tiny_model):
    prompt = [1, 5, 9, 200, 404, 17, 3, 77]
    out = engine.encode(input_ids=prompt)
    emb = np.asarray(out["embedding"], np.float32)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-4
    golden = hf_last_hidden(hf_tiny_model, prompt)
    assert float(emb @ golden) > 0.999
    assert out["meta_info"]["prompt_tokens"] == len(prompt)
    engine.check_memory()


def test_encode_batch_mixed_lengths(engine, hf_tiny_model):
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(1, 500, size=n)) for n in (3, 19, 41)]
    outs = engine.encode(input_ids=prompts)
    assert len(outs) == 3
    for p, o in zip(prompts, outs):
        emb = np.asarray(o["embedding"], np.float32)
        golden = hf_last_hidden(hf_tiny_model, p)
        assert float(emb @ golden) > 0.999, f"len {len(p)}"
    engine.check_memory()


def test_encode_chunked_prefill_consistent(tiny_llama_path, hf_tiny_model):
    """Last-token pooling must survive chunked prefill (the pooled token is
    always in the final chunk)."""
    args = ServerArgs(
        model_path=tiny_llama_path,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=512,
        chunked_prefill_size=16,
    )
    eng = Engine(server_args=args, num_pages=256)
    rng = np.random.RandomState(4)
    prompt = list(rng.randint(1, 500, size=57))
    out = eng.encode(input_ids=prompt)
    emb = np.asarray(out["embedding"], np.float32)
    golden = hf_last_hidden(hf_tiny_model, prompt)
    assert float(emb @ golden) > 0.999
    eng.check_memory()
    eng.shutdown()


def test_encode_interleaves_with_generation(engine, hf_tiny_model):
    """Embedding and generation requests submitted together must both be
    served (separate batches, shared continuous-batching loop)."""
    gen_prompt = [1, 2, 3, 4, 5]
    emb_prompt = [9, 8, 7, 6]
    import threading

    results = {}

    def gen():
        results["gen"] = engine.generate(
            input_ids=gen_prompt,
            sampling_params={
                "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
            },
        )

    t = threading.Thread(target=gen)
    t.start()
    results["emb"] = engine.encode(input_ids=emb_prompt)
    t.join()
    assert len(results["gen"]["output_ids"]) == 8
    golden = hf_last_hidden(hf_tiny_model, emb_prompt)
    emb = np.asarray(results["emb"]["embedding"], np.float32)
    assert float(emb @ golden) > 0.999
    engine.check_memory()


def test_rerank_orders_by_similarity(engine):
    """A document identical to the query must rank first with score ~1."""
    rng = np.random.RandomState(5)
    query = list(rng.randint(1, 500, size=12))
    docs = [list(rng.randint(1, 500, size=12)) for _ in range(3)] + [query]
    # engine.rerank takes strings normally; drive via encode for id inputs
    outs = engine.encode(input_ids=[query] + docs)
    q = np.asarray(outs[0]["embedding"], np.float32)
    scores = [float(q @ np.asarray(o["embedding"], np.float32)) for o in outs[1:]]
    assert int(np.argmax(scores)) == 3
    assert scores[3] > 0.9999
    engine.check_memory()


def test_mean_pooling(tiny_llama_path, hf_tiny_model):
    args = ServerArgs(
        model_path=tiny_llama_path,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=512,
        embedding_pooling="mean",
    )
    eng = Engine(server_args=args, num_pages=256)
    prompt = [1, 5, 9, 200, 404, 17]
    out = eng.encode(input_ids=prompt)
    emb = np.asarray(out["embedding"], np.float32)

    import torch

    with torch.no_grad():
        h = (
            hf_tiny_model.model(torch.tensor([prompt]), output_hidden_states=True)
            .hidden_states[-1][0]
            .numpy()
            .astype(np.float32)
        )
    golden = h.mean(axis=0)
    golden /= max(np.linalg.norm(golden), 1e-12)
    assert float(emb @ golden) > 0.999
    eng.check_memory()
    eng.shutdown()


def test_bare_model_architecture_maps_to_embedding(tmp_path, tiny_llama_path):
    """`LlamaModel` architecture (e5-style trunk checkpoint) loads as an
    embedding model with a tied lm_head."""
    import json as _json
    import shutil

    dst = tmp_path / "trunk"
    shutil.copytree(tiny_llama_path, dst)
    cfg = _json.loads((dst / "config.json").read_text())
    cfg["architectures"] = ["LlamaModel"]
    (dst / "config.json").write_text(_json.dumps(cfg))

    from sglang_custom_tpu.config.model_config import ModelConfig

    mc = ModelConfig.from_model_path(str(dst))
    assert mc.is_embedding
    assert mc.architecture == "LlamaForCausalLM"

    args = ServerArgs(
        model_path=str(dst),
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=512,
    )
    eng = Engine(server_args=args, num_pages=64)
    out = eng.encode(input_ids=[1, 2, 3, 4])
    assert abs(np.linalg.norm(np.asarray(out["embedding"])) - 1.0) < 1e-4
    eng.shutdown()
