"""Double-sparsity decode backend (layers/attention/
double_sparsity_backend.py; reference: double_sparsity_backend.py +
DoubleSparseTokenToKVPool)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


def _engine(path, **kw):
    return Engine(server_args=ServerArgs(
        model_path=path, page_size=16, skip_tokenizer_init=True,
        context_length=2048, dtype="float32", attention_backend="xla",
        disable_overlap_schedule=True, decode_burst_size=1, **kw,
    ), num_pages=512)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.RandomState(0)
    return [int(x) for x in rng.randint(1, 250, size=700)]


def test_ds_exact_when_budget_covers(tiny_llama_path, prompt):
    """token_budget + recent >= context: the sparse path must reproduce
    dense decode exactly (selection covers every token)."""
    dense = _engine(tiny_llama_path)
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
          "return_logprob": True}
    want = dense.generate(input_ids=prompt, sampling_params=sp)
    dense.shutdown()

    eng = _engine(
        tiny_llama_path, enable_double_sparsity=True,
        ds_token_budget=704, ds_recent=64, ds_min_seq=256,
        ds_heavy_channels=8,
    )
    # pool carries the label channels
    assert eng.runner.kv_pool.kv.shape[-1] == 2 * 16 + 8 or \
        eng.runner.kv_pool.kv.shape[-1] == (
            2 * eng.model_config.head_dim + 8
        )
    got = eng.generate(input_ids=prompt, sampling_params=sp)
    assert got["output_ids"] == want["output_ids"]
    np.testing.assert_allclose(
        got["meta_info"]["output_token_logprobs"],
        want["meta_info"]["output_token_logprobs"],
        rtol=1e-4, atol=1e-4,
    )
    eng.check_memory()
    eng.shutdown()


def test_ds_sparse_budget_tracks_dense(tiny_llama_path, prompt):
    """A real sparse budget (256 of ~700 tokens): greedy rollout should
    track dense for at least the first steps and stay plausible after."""
    dense = _engine(tiny_llama_path)
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    want = dense.generate(input_ids=prompt, sampling_params=sp)
    dense.shutdown()

    eng = _engine(
        tiny_llama_path, enable_double_sparsity=True,
        ds_token_budget=256, ds_recent=64, ds_min_seq=256,
        ds_heavy_channels=8,
    )
    got = eng.generate(input_ids=prompt, sampling_params=sp)
    agree = sum(
        a == b for a, b in zip(got["output_ids"], want["output_ids"])
    )
    assert agree >= len(want["output_ids"]) // 2, (
        got["output_ids"], want["output_ids"]
    )
    eng.shutdown()


def test_ds_guards(tiny_llama_path):
    with pytest.raises(ValueError, match="double sparsity"):
        _engine(
            tiny_llama_path, enable_double_sparsity=True,
            speculative_algorithm="eagle",
            speculative_draft_model_path=tiny_llama_path,
        )
