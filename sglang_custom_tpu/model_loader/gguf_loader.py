"""GGUF checkpoint loader (llama.cpp container format).

Capability analog of the reference's GGUFModelLoader
(reference: srt/model_loader/loader.py:1241 — it shells out to the gguf
python package; none ships in this environment, so the container and the
common block-quant codecs are parsed natively). Scope: GGUF v2/v3,
tensor codecs F32 / F16 / Q8_0 / Q4_0 / Q4_1 (the formats llama.cpp
defaults produce), llama-family tensor naming. Quantized tensors dequant
to f32 on the host; pass ``quantization="w4a16"`` etc. to re-quantize
into our serving layouts at load.

GGUF also carries the model geometry in its metadata, so a ``.gguf`` file
needs no config.json — ``config_from_gguf`` builds the ModelConfig.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# ggml tensor types
F32, F16, Q4_0, Q4_1, Q8_0 = 0, 1, 2, 3, 8
_TYPE_NAME = {0: "F32", 1: "F16", 2: "Q4_0", 3: "Q4_1", 8: "Q8_0"}

_V_FMT = {0: "B", 1: "b", 2: "H", 3: "h", 4: "I", 5: "i",
          6: "f", 7: "?", 10: "Q", 11: "q", 12: "d"}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.o = 0

    def u(self, fmt: str):
        v = struct.unpack_from("<" + fmt, self.buf, self.o)[0]
        self.o += struct.calcsize(fmt)
        return v

    def string(self) -> str:
        n = self.u("Q")
        s = self.buf[self.o: self.o + n].decode("utf-8")
        self.o += n
        return s

    def value(self, vtype: int):
        if vtype == 8:
            return self.string()
        if vtype == 9:
            et = self.u("I")
            n = self.u("Q")
            return [self.value(et) for _ in range(n)]
        return self.u(_V_FMT[vtype])


def read_gguf(path: str):
    """-> (metadata dict, {name: np.float32 array in HF row-major})."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    if r.u("I") != GGUF_MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version = r.u("I")
    if version not in (2, 3):
        raise ValueError(f"GGUF version {version} unsupported")
    n_tensors = r.u("Q")
    n_kv = r.u("Q")
    meta = {}
    for _ in range(n_kv):
        key = r.string()
        vtype = r.u("I")
        meta[key] = r.value(vtype)
    infos = []
    for _ in range(n_tensors):
        name = r.string()
        nd = r.u("I")
        dims = [r.u("Q") for _ in range(nd)]
        ttype = r.u("I")
        off = r.u("Q")
        infos.append((name, dims, ttype, off))
    align = int(meta.get("general.alignment", 32))
    data0 = (r.o + align - 1) // align * align

    tensors: Dict[str, np.ndarray] = {}
    for name, dims, ttype, off in infos:
        n_elem = int(np.prod(dims))
        raw_off = data0 + off
        tensors[name] = _decode(
            buf, raw_off, n_elem, ttype, name
        ).reshape(tuple(reversed(dims)))  # ggml ne[0] is innermost
    return meta, tensors


def _decode(buf, off, n, ttype, name) -> np.ndarray:
    if ttype == F32:
        return np.frombuffer(buf, np.float32, n, off).copy()
    if ttype == F16:
        return np.frombuffer(buf, np.float16, n, off).astype(np.float32)
    if ttype == Q8_0:
        nb = n // 32
        raw = np.frombuffer(buf, np.uint8, nb * 34, off).reshape(nb, 34)
        d = raw[:, :2].copy().view(np.float16).astype(np.float32)
        qs = raw[:, 2:].copy().view(np.int8).astype(np.float32)
        return (qs * d).reshape(-1)
    if ttype == Q4_0:
        nb = n // 32
        raw = np.frombuffer(buf, np.uint8, nb * 18, off).reshape(nb, 18)
        d = raw[:, :2].copy().view(np.float16).astype(np.float32)
        qs = raw[:, 2:]
        lo = (qs & 0xF).astype(np.float32) - 8.0
        hi = (qs >> 4).astype(np.float32) - 8.0
        return (np.concatenate([lo, hi], axis=1) * d).reshape(-1)
    if ttype == Q4_1:
        nb = n // 32
        raw = np.frombuffer(buf, np.uint8, nb * 20, off).reshape(nb, 20)
        d = raw[:, :2].copy().view(np.float16).astype(np.float32)
        m = raw[:, 2:4].copy().view(np.float16).astype(np.float32)
        qs = raw[:, 4:]
        lo = (qs & 0xF).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        return (np.concatenate([lo, hi], axis=1) * d + m).reshape(-1)
    raise ValueError(
        f"tensor {name!r}: ggml type {ttype} "
        f"({_TYPE_NAME.get(ttype, '?')}) unsupported — supported: "
        f"{sorted(_TYPE_NAME.values())}"
    )


# ------------------------------------------------- llama-family naming

def gguf_to_hf_name(name: str) -> str:
    """llama.cpp tensor names -> HF names (the key space our model
    hf_key_map speaks)."""
    if name == "token_embd.weight":
        return "model.embed_tokens.weight"
    if name == "output_norm.weight":
        return "model.norm.weight"
    if name == "output.weight":
        return "lm_head.weight"
    if name.startswith("blk."):
        parts = name.split(".")
        l = parts[1]
        sub = ".".join(parts[2:-1])
        mp = {
            "attn_norm": "input_layernorm",
            "attn_q": "self_attn.q_proj",
            "attn_k": "self_attn.k_proj",
            "attn_v": "self_attn.v_proj",
            "attn_output": "self_attn.o_proj",
            "ffn_norm": "post_attention_layernorm",
            "ffn_gate": "mlp.gate_proj",
            "ffn_up": "mlp.up_proj",
            "ffn_down": "mlp.down_proj",
        }
        if sub in mp:
            return f"model.layers.{l}.{mp[sub]}.weight"
    return name  # unknown names are skipped by the key map


def config_from_gguf(path: str):
    """Build a ModelConfig from GGUF metadata (no config.json needed)."""
    from sglang_custom_tpu.config.model_config import ModelConfig

    meta, _ = read_gguf(path)
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "mistral", "qwen2"):
        raise ValueError(f"gguf architecture {arch!r} unsupported")
    p = arch  # metadata key prefix

    def g(key, default=None):
        return meta.get(f"{p}.{key}", default)

    n_heads = int(g("attention.head_count"))
    hidden = int(g("embedding_length"))
    cfg = {
        "architectures": [
            "Qwen2ForCausalLM" if arch == "qwen2" else "LlamaForCausalLM"
        ],
        "vocab_size": int(meta.get(
            "llama.vocab_size",
            len(meta.get("tokenizer.ggml.tokens", []) or [])
        ) or g("vocab_size", 32000)),
        "hidden_size": hidden,
        "num_hidden_layers": int(g("block_count")),
        "num_attention_heads": n_heads,
        "num_key_value_heads": int(
            g("attention.head_count_kv", n_heads)
        ),
        "intermediate_size": int(g("feed_forward_length")),
        "rms_norm_eps": float(
            g("attention.layer_norm_rms_epsilon", 1e-5)
        ),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "max_position_embeddings": int(g("context_length", 4096)),
        "tie_word_embeddings": False,
    }
    return ModelConfig.from_hf_dict(cfg)


def gguf_path_of(model_path: str):
    """The .gguf file a model path denotes (file directly, or the single
    .gguf inside a directory); None if not a GGUF source."""
    if model_path.endswith(".gguf") and os.path.isfile(model_path):
        return model_path
    if os.path.isdir(model_path):
        import glob

        g = sorted(glob.glob(os.path.join(model_path, "*.gguf")))
        if g:
            return g[0]
    return None


def load_weights_gguf(
    gguf_file: str,
    cfg,
    mesh_ctx,
    dtype,
    quantization=None,
    model=None,
):
    """GGUF -> the stacked sharded pytree (same contract as
    loader.load_weights)."""
    import jax

    from sglang_custom_tpu.model_loader.loader import (
        _apply_quantization,
        _check_coverage,
        _put_tree,
    )
    from sglang_custom_tpu.models.registry import get_model

    if model is None:
        model = get_model(cfg.architecture)
    shardings = model.param_shardings(cfg, mesh_ctx)
    shapes = model.param_shapes(cfg)
    key_map = model.hf_key_map(cfg)
    staging = jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), shapes
    )

    _, tensors = read_gguf(gguf_file)
    seen = set()
    written = set()
    for gname, full in tensors.items():
        name = gguf_to_hf_name(gname)
        if name not in key_map:
            continue
        entries = key_map[name]
        if not isinstance(entries, list):
            entries = [entries]
        for entry in entries:
            if len(entry) == 4:
                path, idx, transpose, sl = entry
                w = full[sl[0]: sl[1]]
            else:
                path, idx, transpose = entry
                w = full
            if transpose:
                if w.ndim > 2:
                    w = w.reshape(w.shape[0], -1)
                w = np.ascontiguousarray(w.T)
            dst = staging
            for kpart in path[:-1]:
                dst = dst[kpart]
            if idx is None:
                dst[path[-1]][...] = w
            else:
                dst[path[-1]][idx] = w
            written.add((path, idx))
        seen.add(name)

    if (
        not any(n.endswith("lm_head.weight") for n in seen)
        and "lm_head" in staging
    ):
        staging["lm_head"][...] = staging["embed"].T
        written.add((("lm_head",), None))
    _check_coverage(key_map, written)
    for norm_key in ("input_norm", "post_norm"):
        w = staging.get("layers", {}).get(norm_key)
        if w is not None:
            rows = ~np.any(w, axis=tuple(range(1, w.ndim)))
            w[rows] = 1.0
    if quantization in ("w4a16", "fp8", "fp8_block", "int8"):
        staging, shardings = _apply_quantization(
            staging, shardings, quantization, cfg.quant_group_size,
            mesh_ctx,
        )
    return _put_tree(staging, shardings, dtype)
