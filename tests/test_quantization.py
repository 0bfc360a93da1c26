"""Quantization: W4A16 pack/convert/matmul, FP8, engine integration.

Reference analog: python/sglang/test/test_block_fp8.py, test_marlin_moe.py —
kernel-level quant math tests + accuracy-ish engine checks.
"""

import numpy as np
import pytest

from sglang_custom_tpu.layers.quantization.w4a16 import (
    convert_awq_tensors,
    convert_gptq_tensors,
    dequant_w4a16,
    pack_w4,
    quantize_w4a16,
    w4a16_matmul,
)
from sglang_custom_tpu.layers.quantization.fp8 import fp8_matmul, quantize_fp8


def to_np(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 64).astype(np.float32)
    qd = quantize_w4a16(w, group_size=128)
    assert qd["qweight"].shape == (128, 64) and qd["qweight"].dtype == np.uint8
    deq = np.asarray(dequant_w4a16(qd, dtype=np.float32))
    # 4-bit asymmetric: max error ~ scale/2 = (range/15)/2
    scale = (w.reshape(2, 128, 64).max(1) - w.reshape(2, 128, 64).min(1)) / 15
    err = np.abs(deq - w).reshape(2, 128, 64).max(1)
    assert (err <= scale * 0.51 + 1e-6).all()


def test_w4a16_matmul_matches_dequant():
    rng = np.random.RandomState(1)
    w = rng.randn(256, 96).astype(np.float32)
    x = rng.randn(4, 256).astype(np.float32)
    qd = quantize_w4a16(w)
    out = np.asarray(w4a16_matmul(x, qd), np.float32)
    ref = x.astype(np.float32) @ np.asarray(
        dequant_w4a16(qd, dtype=np.float32)
    )
    # bf16 matmul tolerance
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.05
    # and close to the unquantized matmul within quant noise
    full = x @ w
    assert np.abs(out - full).max() / np.abs(full).max() < 0.2


def _pack_awq(q, order):
    # q [K, N] uint4 -> int32 [K, N/8] with nibble order `order`
    K, N = q.shape
    out = np.zeros((K, N // 8), np.int64)
    for j, pos in enumerate(order):
        out |= q[:, pos::8].astype(np.int64) << (j * 4)
    return out.astype(np.int32)


def test_awq_conversion():
    rng = np.random.RandomState(2)
    K, N, G = 128, 32, 64
    q = rng.randint(0, 16, size=(K, N)).astype(np.uint8)
    z = rng.randint(0, 16, size=(K // G, N)).astype(np.uint8)
    s = (rng.rand(K // G, N).astype(np.float32) + 0.1)
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    qweight = _pack_awq(q, order)
    qzeros = _pack_awq(z, order)
    qd = convert_awq_tensors(qweight, qzeros, s)
    deq = np.asarray(dequant_w4a16(qd, dtype=np.float32))
    want = (
        q.reshape(K // G, G, N).astype(np.float32)
        - z[:, None, :].astype(np.float32)
    ) * s[:, None, :]
    np.testing.assert_allclose(deq, want.reshape(K, N), rtol=1e-5, atol=1e-5)


def _pack_gptq_k(q):
    # q [K, N] -> int32 [K/8, N] sequential nibbles along K
    K, N = q.shape
    out = np.zeros((K // 8, N), np.int64)
    for j in range(8):
        out |= q[j::8].astype(np.int64) << (j * 4)
    return out.astype(np.int32)


def _pack_gptq_n(z):
    # z [G#, N] -> int32 [G#, N/8] sequential nibbles along N
    Gn, N = z.shape
    out = np.zeros((Gn, N // 8), np.int64)
    for j in range(8):
        out |= z[:, j::8].astype(np.int64) << (j * 4)
    return out.astype(np.int32)


def test_gptq_conversion():
    rng = np.random.RandomState(3)
    K, N, G = 128, 32, 64
    q = rng.randint(0, 16, size=(K, N)).astype(np.uint8)
    z = rng.randint(0, 15, size=(K // G, N)).astype(np.uint8)
    s = (rng.rand(K // G, N).astype(np.float32) + 0.1)
    qd = convert_gptq_tensors(_pack_gptq_k(q), _pack_gptq_n(z), s)
    deq = np.asarray(dequant_w4a16(qd, dtype=np.float32))
    want = (
        q.reshape(K // G, G, N).astype(np.float32)
        - (z[:, None, :].astype(np.float32) + 1)
    ) * s[:, None, :]
    np.testing.assert_allclose(deq, want.reshape(K, N), rtol=1e-5, atol=1e-5)


def test_fp8_matmul():
    rng = np.random.RandomState(4)
    w = rng.randn(128, 64).astype(np.float32)
    x = rng.randn(4, 128).astype(np.float32)
    qd = quantize_fp8(w)
    assert str(qd["qweight"].dtype) == "float8_e4m3fn"
    out = np.asarray(fp8_matmul(x, qd), np.float32)
    full = x @ w
    assert np.abs(out - full).max() / np.abs(full).max() < 0.15


def test_int8_matmul():
    from sglang_custom_tpu.layers.quantization.int8 import (
        int8_matmul,
        quantize_int8,
    )

    rng = np.random.RandomState(5)
    w = rng.randn(128, 64).astype(np.float32)
    x = rng.randn(4, 128).astype(np.float32)
    qd = quantize_int8(w)
    assert qd["qweight"].dtype == np.int8 and qd["scales"].shape == (64,)
    out = np.asarray(int8_matmul(x, qd), np.float32)
    full = x @ w
    assert np.abs(out - full).max() / np.abs(full).max() < 0.05


def test_fp8_blockwise_matmul():
    from sglang_custom_tpu.layers.quantization.blockwise_fp8 import (
        fp8_blockwise_matmul,
        quantize_fp8_blockwise,
    )

    rng = np.random.RandomState(6)
    K, N, B = 256, 128, 64
    # Per-block magnitude variation: blockwise scales must track it where a
    # single tensor scale would clip.
    w = rng.randn(K, N).astype(np.float32)
    w[:B] *= 50.0
    x = rng.randn(4, K).astype(np.float32) * 0.1
    qd = quantize_fp8_blockwise(w, block=B)
    assert qd["scales"].shape == (K // B, N // B)
    out = np.asarray(fp8_blockwise_matmul(x, qd), np.float32)
    full = x @ w
    assert np.abs(out - full).max() / np.abs(full).max() < 0.1

    # Dequant-exactness cross-check vs an explicit blockwise dequant.
    qw = np.asarray(qd["qweight"], np.float32)
    s = np.asarray(qd["scales"])
    deq = (
        qw.reshape(K // B, B, N // B, B) * s[:, None, :, None]
    ).reshape(K, N)
    ref = x @ deq
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.05


def test_compressed_tensors_conversion():
    from sglang_custom_tpu.layers.quantization.compressed_tensors import (
        convert_ct_tensors,
        parse_ct_scheme,
    )
    from sglang_custom_tpu.layers.quantization.int8 import int8_matmul

    assert parse_ct_scheme(
        {"config_groups": {"group_0": {"weights": {"num_bits": 8, "type": "int", "strategy": "channel"}}}}
    ) == "int8"
    assert parse_ct_scheme(
        {"config_groups": {"group_0": {"weights": {"num_bits": 8, "type": "float"}}}}
    ) == "fp8"
    with pytest.raises(ValueError):
        parse_ct_scheme(
            {"config_groups": {"g": {"weights": {"num_bits": 4, "type": "int"}}}}
        )

    # torch-layout [N, K] int8 + per-channel scale -> our [K, N] leaf.
    rng = np.random.RandomState(7)
    N, K = 32, 64
    w = rng.randn(N, K).astype(np.float32)
    s = np.abs(w).max(axis=1) / 127.0  # [N]
    q = np.clip(np.round(w / s[:, None]), -127, 127).astype(np.int8)
    qd = convert_ct_tensors(q, s.reshape(N, 1))
    assert qd["qweight"].shape == (K, N)
    x = rng.randn(2, K).astype(np.float32)
    out = np.asarray(int8_matmul(x, qd), np.float32)
    full = x @ w.T
    assert np.abs(out - full).max() / np.abs(full).max() < 0.05

    with pytest.raises(NotImplementedError):
        convert_ct_tensors(q, s, weight_zero_point=np.ones((N,), np.int8))


def test_compressed_tensors_checkpoint_loads(tmp_path_factory):
    """An int8 compressed-tensors checkpoint serves through the Engine and
    matches the bf16 model's greedy tokens on a short prompt."""
    import json

    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    path = tmp_path_factory.mktemp("tiny_llama_ct")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)

    # Re-save with quantized projections + compressed-tensors config.
    sd = model.state_dict()
    out_sd = {}
    for name, t in sd.items():
        is_proj = any(
            name.endswith(f"{p}.weight")
            for p in ("q_proj", "k_proj", "v_proj", "o_proj",
                      "gate_proj", "up_proj", "down_proj")
        )
        if is_proj:
            w = t.float().numpy()
            s = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0
            q = np.clip(np.round(w / s[:, None]), -127, 127).astype(np.int8)
            out_sd[name] = torch.from_numpy(q)
            out_sd[name[: -len("weight")] + "weight_scale"] = torch.from_numpy(
                s.reshape(-1, 1).astype(np.float32)
            )
        else:
            out_sd[name] = t.contiguous()
    import glob
    import os

    for f in glob.glob(os.path.join(path, "*.safetensors")):
        os.remove(f)
    save_file(out_sd, os.path.join(path, "model.safetensors"))
    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        hf_cfg = json.load(f)
    hf_cfg["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {
                "weights": {"num_bits": 8, "type": "int",
                            "strategy": "channel", "symmetric": True},
                "targets": ["Linear"],
            }
        },
    }
    with open(cfg_path, "w") as f:
        json.dump(hf_cfg, f)

    eng = Engine(
        server_args=ServerArgs(model_path=str(path), dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True),
        num_pages=128,
    )
    assert eng.model_config.quantization == "compressed-tensors"
    out = eng.generate(
        input_ids=[1, 7, 23],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    eng.shutdown()
    assert len(out["output_ids"]) == 8


@pytest.mark.parametrize("method", ["w4a16", "fp8", "fp8_block", "int8"])
def test_engine_quantized(method, tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    path = tmp_path_factory.mktemp(f"tiny_llama_{method}")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    base = Engine(
        server_args=ServerArgs(model_path=str(path), dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True),
        num_pages=128,
    )
    ref = base.generate(
        input_ids=[1, 7, 23], sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
            "return_logprob": True},
    )
    base.shutdown()

    eng = Engine(
        server_args=ServerArgs(model_path=str(path), dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True,
                               quantization=method),
        num_pages=128,
    )
    out = eng.generate(
        input_ids=[1, 7, 23], sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
            "return_logprob": True},
    )
    eng.shutdown()
    assert len(out["output_ids"]) == 8
    # Quantized logprob of the first greedy token should be in the same
    # ballpark (weights only mildly perturbed).
    lp_ref = ref["meta_info"]["output_token_logprobs"][0]
    lp_q = out["meta_info"]["output_token_logprobs"][0]
    assert abs(lp_ref - lp_q) < 1.5

def test_w4a16_pallas_kernel_matches_dequant():
    """ops/w4a16_matmul.py (interpret) vs the XLA dequant reference."""
    import jax.numpy as jnp
    import numpy as np

    from sglang_custom_tpu.layers.quantization.w4a16 import (
        dequant_w4a16,
        quantize_w4a16,
    )
    from sglang_custom_tpu.ops.w4a16_matmul import (
        supported_shape,
        w4a16_matmul_pallas,
    )

    K, N, M = 4096, 512, 24
    rng = np.random.RandomState(0)
    w = rng.randn(K, N).astype(np.float32) * 0.05
    qd = {k: jnp.asarray(v) for k, v in quantize_w4a16(w).items()}
    assert supported_shape(K, N, 128)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
    got = w4a16_matmul_pallas(
        x, qd["qweight"], qd["scales"], qd["zeros"], interpret=True
    )
    want = jnp.matmul(x, dequant_w4a16(qd, dtype=jnp.bfloat16))
    # K=4096 bf16 accumulation: kernel (per-group partials) and XLA (single
    # dot) round differently; bound the worst element by a few bf16 ulps of
    # the output magnitude, and the typical element much tighter.
    got_f, want_f = np.asarray(got, np.float32), np.asarray(want, np.float32)
    err = np.abs(got_f - want_f)
    assert err.max() <= 0.05 * np.abs(want_f).max() + 0.05, err.max()
    assert err.mean() <= 0.01 * np.abs(want_f).mean() + 0.02, err.mean()


def test_fp8_block_pallas_kernel_interpret():
    """Pallas blockwise-fp8 kernel (ops/fp8_matmul.py
    fp8_block_matmul_pallas) vs explicit dequant, interpret mode."""
    import jax.numpy as jnp

    from sglang_custom_tpu.layers.quantization.blockwise_fp8 import (
        quantize_fp8_blockwise,
    )
    from sglang_custom_tpu.ops.fp8_matmul import (
        fp8_block_matmul_pallas,
        supported_shape_block,
    )

    K, N, B = 2048, 512, 128
    assert supported_shape_block(K, N, B)
    rng = np.random.RandomState(5)
    w = rng.randn(K, N).astype(np.float32)
    w *= (1 + 10 * rng.rand(K // B, 1, N // B, 1)).reshape(
        K // B, 1, N // B, 1
    ).repeat(B, 1).repeat(B, 3).reshape(K, N)
    x = rng.randn(4, K).astype(np.float32)
    qd = quantize_fp8_blockwise(w, block=B)
    s_kn = jnp.repeat(jnp.asarray(qd["scales"]), B, axis=1)
    got = np.asarray(fp8_block_matmul_pallas(
        jnp.asarray(x), jnp.asarray(qd["qweight"]), s_kn, interpret=True
    ), np.float32)
    wd = (
        np.asarray(qd["qweight"], np.float32).reshape(K // B, B, N // B, B)
        * qd["scales"][:, None, :, None]
    ).reshape(K, N)
    want = x.astype(np.float32) @ wd
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_w4a16_v2_kernel_matches_v1_interpret():
    """Big-dot W4A16 variant (r5) vs the group-partial kernel and the
    exact dequant reference."""
    import jax.numpy as jnp

    from sglang_custom_tpu.ops.w4a16_matmul import (
        supported_shape,
        w4a16_matmul_pallas,
        w4a16_matmul_pallas_v2,
    )

    K, N, G = 2048, 256, 128
    assert supported_shape(K, N, G)
    rng = np.random.RandomState(7)
    q = rng.randint(0, 256, (K // 2, N), dtype=np.uint8)
    s = (rng.rand(K // G, N).astype(np.float32) * 0.02 + 0.01)
    z = (rng.rand(K // G, N).astype(np.float32) - 0.5) * 0.1
    x = rng.randn(16, K).astype(np.float32)

    got2 = np.asarray(w4a16_matmul_pallas_v2(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(z),
        interpret=True,
    ), np.float32)
    got1 = np.asarray(w4a16_matmul_pallas(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(z),
        interpret=True,
    ), np.float32)

    lo = (q & 0xF).astype(np.float32)
    hi = (q >> 4).astype(np.float32)
    w4 = np.concatenate([lo, hi], axis=0)
    sfull = np.repeat(s, G, axis=0)
    zfull = np.repeat(z, G, axis=0)
    want = x.astype(np.float32) @ (w4 * sfull + zfull)
    for name, got in (("v2", got2), ("v1", got1)):
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 2e-2, (name, rel)
