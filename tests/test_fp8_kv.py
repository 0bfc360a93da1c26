"""FP8 KV cache with static scales (kv_cache_dtype=fp8_e4m3).

Reference analog: srt/layers/quantization/kv_cache.py Fp8KVCacheMethod +
--kv-cache-dtype fp8_e4m3 serving path.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


def test_backend_fp8_pool_matches_f32_reference():
    """XLA attention over an f8 pool tracks the f32-pool result within
    e4m3 quantization noise; the scale round-trips through write+read."""
    import jax
    import jax.numpy as jnp

    from sglang_custom_tpu.layers.attention.xla_backend import (
        XlaAttentionBackend,
    )
    from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta

    B, T, Hq, Hkv, D, ps, P = 2, 4, 4, 2, 16, 8, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
    # values beyond e4m3's unscaled sweet spot: scale must absorb them
    k_new = jnp.asarray(rng.randn(B, T, Hkv, D).astype(np.float32) * 8.0)
    v_new = jnp.asarray(rng.randn(B, T, Hkv, D).astype(np.float32) * 8.0)
    meta = ForwardMeta(
        token_ids=jnp.zeros((B, T), jnp.int32),
        positions=jnp.tile(jnp.arange(T)[None], (B, 1)),
        page_table=jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32),
        seq_lens=jnp.full((B,), T, jnp.int32),
        extend_lens=jnp.full((B,), T, jnp.int32),
    )

    pool32 = jnp.zeros((1, Hkv, P, ps, 2 * D), jnp.float32)
    ref_out, _ = XlaAttentionBackend()(
        q, k_new, v_new, pool32, jnp.int32(0), meta, scale=0.25
    )

    pool8 = jnp.zeros((1, Hkv, P, ps, 2 * D), jnp.float8_e4m3fn)
    be = XlaAttentionBackend(kv_scale=0.125)
    out8, pool8 = be(
        q, k_new, v_new, pool8, jnp.int32(0), meta, scale=0.25
    )
    err = np.abs(np.asarray(out8) - np.asarray(ref_out))
    ref_mag = np.abs(np.asarray(ref_out)).max() + 1e-9
    # e4m3 carries ~3 mantissa bits and softmax amplifies K noise: bound
    # the worst element loosely and the typical element tightly.
    assert err.max() / ref_mag < 0.15, err.max() / ref_mag
    assert err.mean() / ref_mag < 0.03, err.mean() / ref_mag

    # the pool really stores scaled f8 (kv/scale), not raw values
    stored = np.asarray(pool8[0, :, 1].astype(jnp.float32))  # page 1
    k0 = np.asarray(k_new)[0].transpose(1, 0, 2)  # [Hkv, T, D]
    np.testing.assert_allclose(
        stored[:, :4, :D] * 0.125, k0, rtol=0.2, atol=0.2
    )


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_f8kv")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    return str(path)


def test_engine_fp8_kv_serves(ckpt):
    """End-to-end: generation with an f8 KV pool completes, stays
    leak-free, and the first greedy token matches the f32-KV run (one
    decode step accumulates negligible quantization error on a tiny
    model)."""
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}

    base = Engine(
        server_args=ServerArgs(model_path=ckpt, dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True),
        num_pages=64,
    )
    ref = base.generate(input_ids=[1, 7, 23, 99], sampling_params=sp)
    base.shutdown()

    eng = Engine(
        server_args=ServerArgs(model_path=ckpt, dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True,
                               kv_cache_dtype="fp8_e4m3",
                               kv_cache_scale=0.25),
        num_pages=64,
    )
    import jax.numpy as jnp

    assert eng.runner.kv_pool.kv.dtype == jnp.float8_e4m3fn
    out = eng.generate(input_ids=[1, 7, 23, 99], sampling_params=sp)
    eng.check_memory()
    eng.shutdown()
    assert len(out["output_ids"]) == 8
    assert out["output_ids"][0] == ref["output_ids"][0]
