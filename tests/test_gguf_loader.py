"""GGUF checkpoint loading (model_loader/gguf_loader.py; reference:
GGUFModelLoader loader.py:1241). A tiny GGUF file is WRITTEN here (v3
container, F32/F16/Q8_0/Q4_0 codecs) from a known HF llama, then served
and compared against the HF model on the dequantized weights."""

import struct

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.model_config import ModelConfig


# ----------------------------------------------------------- gguf writer

def _pack_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, vtype: int, packed: bytes) -> bytes:
    return _pack_string(key) + struct.pack("<I", vtype) + packed


def _q8_0(w: np.ndarray) -> bytes:
    flat = w.reshape(-1, 32)
    d = (np.abs(flat).max(axis=1) / 127.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    qs = np.clip(np.round(flat / df[:, None]), -127, 127).astype(np.int8)
    out = bytearray()
    for i in range(flat.shape[0]):
        out += d[i].tobytes() + qs[i].tobytes()
    return bytes(out)


def _q4_0(w: np.ndarray) -> bytes:
    flat = w.reshape(-1, 32)
    d = (np.abs(flat).max(axis=1) / 7.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    q = np.clip(np.round(flat / df[:, None]) + 8, 0, 15).astype(np.uint8)
    out = bytearray()
    for i in range(flat.shape[0]):
        packed = (q[i, :16] | (q[i, 16:] << 4)).astype(np.uint8)
        out += d[i].tobytes() + packed.tobytes()
    return bytes(out)


def dequant_q8_0(w: np.ndarray) -> np.ndarray:
    flat = w.reshape(-1, 32)
    d = (np.abs(flat).max(axis=1) / 127.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    qs = np.clip(np.round(flat / df[:, None]), -127, 127)
    return (qs * d.astype(np.float32)[:, None]).reshape(w.shape)


def dequant_q4_0(w: np.ndarray) -> np.ndarray:
    flat = w.reshape(-1, 32)
    d = (np.abs(flat).max(axis=1) / 7.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    q = np.clip(np.round(flat / df[:, None]) + 8, 0, 15)
    return ((q - 8) * d.astype(np.float32)[:, None]).reshape(w.shape)


def write_gguf(path, meta_u32, tensors):
    """tensors: [(name, np array [out, in] or [n], ttype)]."""
    F32, F16, Q4_0, Q8_0 = 0, 1, 2, 8
    align = 32
    head = struct.pack("<IIQQ", 0x46554747, 3, len(tensors),
                       len(meta_u32) + 1)
    kv = _kv("general.architecture", 8, _pack_string("llama"))
    for k, v in meta_u32.items():
        if isinstance(v, float):
            kv += _kv(k, 6, struct.pack("<f", v))
        else:
            kv += _kv(k, 4, struct.pack("<I", v))
    infos = b""
    blobs = []
    off = 0
    for name, w, ttype in tensors:
        dims = list(reversed(w.shape))  # ggml ne[0] innermost
        if ttype == F32:
            raw = w.astype(np.float32).tobytes()
        elif ttype == F16:
            raw = w.astype(np.float16).tobytes()
        elif ttype == Q8_0:
            raw = _q8_0(w)
        elif ttype == Q4_0:
            raw = _q4_0(w)
        infos += (
            _pack_string(name) + struct.pack("<I", len(dims))
            + b"".join(struct.pack("<Q", d) for d in dims)
            + struct.pack("<IQ", ttype, off)
        )
        blobs.append(raw)
        off += (len(raw) + align - 1) // align * align
    body = head + kv + infos
    pad0 = (-len(body)) % align
    with open(path, "wb") as f:
        f.write(body + b"\0" * pad0)
        for raw in blobs:
            f.write(raw + b"\0" * ((-len(raw)) % align))


@pytest.fixture(scope="module")
def gguf_setup(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    H, I, L, V = 64, 128, 2, 256
    cfg = LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).to(torch.float32)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}

    F32, F16, Q4_0, Q8_0 = 0, 1, 2, 8
    tensors = [
        ("token_embd.weight", sd["model.embed_tokens.weight"], F16),
        ("output_norm.weight", sd["model.norm.weight"], F32),
        ("output.weight", sd["lm_head.weight"], Q8_0),
    ]
    # round-trip the HF model through the same quant so outputs compare
    hf_sd = dict(sd)
    hf_sd["model.embed_tokens.weight"] = sd[
        "model.embed_tokens.weight"
    ].astype(np.float16).astype(np.float32)
    hf_sd["lm_head.weight"] = dequant_q8_0(sd["lm_head.weight"])
    for l in range(L):
        p = f"model.layers.{l}."
        g = f"blk.{l}."
        for gn, hn, tt in [
            ("attn_norm", "input_layernorm", F32),
            ("ffn_norm", "post_attention_layernorm", F32),
            ("attn_q", "self_attn.q_proj", Q8_0),
            ("attn_k", "self_attn.k_proj", Q8_0),
            ("attn_v", "self_attn.v_proj", Q8_0),
            ("attn_output", "self_attn.o_proj", Q8_0),
            ("ffn_gate", "mlp.gate_proj", Q4_0),
            ("ffn_up", "mlp.up_proj", Q4_0),
            ("ffn_down", "mlp.down_proj", Q8_0),
        ]:
            w = sd[p + hn + ".weight"]
            tensors.append((g + gn + ".weight", w, tt))
            if tt == Q8_0:
                hf_sd[p + hn + ".weight"] = dequant_q8_0(w)
            elif tt == Q4_0:
                hf_sd[p + hn + ".weight"] = dequant_q4_0(w)

    path = tmp_path_factory.mktemp("gguf") / "tiny.gguf"
    write_gguf(str(path), {
        "llama.vocab_size": V,
        "llama.embedding_length": H,
        "llama.block_count": L,
        "llama.attention.head_count": 4,
        "llama.attention.head_count_kv": 2,
        "llama.feed_forward_length": I,
        "llama.context_length": 256,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "llama.rope.freq_base": 10000.0,
    }, tensors)

    m.load_state_dict({k: torch.tensor(v) for k, v in hf_sd.items()})
    m.eval()
    return str(path), m


def test_gguf_config(gguf_setup):
    path, _ = gguf_setup
    cfg = ModelConfig.from_model_path(path)
    assert cfg.architecture == "LlamaForCausalLM"
    assert cfg.hidden_size == 64 and cfg.num_layers == 2
    assert cfg.num_kv_heads == 2 and cfg.vocab_size == 256


def test_gguf_engine_matches_hf(gguf_setup):
    """Serve the GGUF file directly; greedy output must match the HF model
    carrying the identically round-tripped weights (fp32 CPU)."""
    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    path, hf = gguf_setup
    eng = Engine(server_args=ServerArgs(
        model_path=path, page_size=16, skip_tokenizer_init=True,
        context_length=256, dtype="float32", attention_backend="xla",
    ), num_pages=128)
    try:
        ids = [3, 17, 29, 101, 7]
        out = eng.generate(input_ids=ids, sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
        })
        with torch.no_grad():
            gen = hf.generate(
                torch.tensor([ids]), max_new_tokens=8, do_sample=False
            )[0, len(ids):].tolist()
        assert out["output_ids"] == gen
    finally:
        eng.shutdown()
