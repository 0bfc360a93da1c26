"""Llama-family causal LM, TPU-first.

Re-design of the reference's model definition (reference:
srt/models/llama.py:381 LlamaForCausalLM, :448 forward) — not a port:

- **Scanned layers over stacked weights**: every per-layer weight is stacked
  on a leading [L, ...] axis and the decoder body runs under ``lax.scan``.
  One layer is traced/compiled once regardless of depth — the XLA-idiomatic
  replacement for the reference's Python loop over nn.Modules, and it lets
  the KV cache thread through the scan as per-layer xs/ys so donation
  aliases the pool in place.
- **No manual collectives**: the reference's ColumnParallel/RowParallel
  linear layers (srt/layers/linear.py) with explicit all-reduces become
  plain matmuls + sharding annotations; GSPMD inserts the all-reduce over
  the ``tensor`` mesh axis.
- Covers Llama 1/2/3 geometry (GQA, llama3 rope scaling, tied embeddings)
  and Qwen2 (attention QKV bias) via ModelConfig flags.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import apply_rope, rope_cos_sin, rope_inv_freq
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta


def param_shapes(cfg: ModelConfig) -> dict:
    """Pytree of ShapeDtypeStruct describing the stacked parameter layout."""
    L, H, D = cfg.num_layers, cfg.hidden_size, cfg.head_dim
    Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
    V = cfg.vocab_size

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    layers = {
        "input_norm": s(L, H),
        "q_proj": s(L, H, Hq * D),
        "k_proj": s(L, H, Hkv * D),
        "v_proj": s(L, H, Hkv * D),
        "o_proj": s(L, Hq * D, H),
        "post_norm": s(L, H),
        "gate_proj": s(L, H, I),
        "up_proj": s(L, H, I),
        "down_proj": s(L, I, H),
    }
    if cfg.attention_bias:
        layers["q_bias"] = s(L, Hq * D)
        layers["k_bias"] = s(L, Hkv * D)
        layers["v_bias"] = s(L, Hkv * D)
    if cfg.qk_norm:
        layers["q_norm"] = s(L, D)
        layers["k_norm"] = s(L, D)
    return {
        "embed": s(V, H),
        "layers": layers,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }


def hf_key_map(cfg: ModelConfig) -> dict:
    """HF tensor name -> (pytree path, layer index or None, transpose).
    Covers Llama 1/2/3, Mistral, Qwen2 (bias), Qwen3 (qk norm)."""
    m = {
        "model.embed_tokens.weight": (("embed",), None, False),
        "model.norm.weight": (("final_norm",), None, False),
        "lm_head.weight": (("lm_head",), None, True),
    }
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        m.update({
            p + "input_layernorm.weight": (("layers", "input_norm"), l, False),
            p + "self_attn.q_proj.weight": (("layers", "q_proj"), l, True),
            p + "self_attn.k_proj.weight": (("layers", "k_proj"), l, True),
            p + "self_attn.v_proj.weight": (("layers", "v_proj"), l, True),
            p + "self_attn.o_proj.weight": (("layers", "o_proj"), l, True),
            p + "post_attention_layernorm.weight": (("layers", "post_norm"), l, False),
            p + "mlp.gate_proj.weight": (("layers", "gate_proj"), l, True),
            p + "mlp.up_proj.weight": (("layers", "up_proj"), l, True),
            p + "mlp.down_proj.weight": (("layers", "down_proj"), l, True),
        })
        if cfg.attention_bias:
            m.update({
                p + "self_attn.q_proj.bias": (("layers", "q_bias"), l, False),
                p + "self_attn.k_proj.bias": (("layers", "k_bias"), l, False),
                p + "self_attn.v_proj.bias": (("layers", "v_bias"), l, False),
            })
        if cfg.qk_norm:
            m.update({
                p + "self_attn.q_norm.weight": (("layers", "q_norm"), l, False),
                p + "self_attn.k_norm.weight": (("layers", "k_norm"), l, False),
            })
    return m


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    from sglang_custom_tpu.parallel.sharding import param_shardings as _ps

    return _ps(cfg, mesh_ctx)


def mm(x: jax.Array, w) -> jax.Array:
    """Linear layer dispatch: plain array or quantized dict leaf
    (the LinearMethodBase.apply analog — reference:
    layers/quantization/__init__.py method pattern)."""
    if isinstance(w, dict):
        if w["qweight"].dtype == jnp.uint8:
            from sglang_custom_tpu.layers.quantization.w4a16 import w4a16_matmul

            return w4a16_matmul(x, w)
        if w["qweight"].dtype == jnp.int8:
            from sglang_custom_tpu.layers.quantization.int8 import int8_matmul

            return int8_matmul(x, w)
        if w["scales"].ndim == w["qweight"].ndim:
            # per-(128,128)-block scales (DeepSeek-style blockwise fp8)
            from sglang_custom_tpu.layers.quantization.blockwise_fp8 import (
                fp8_blockwise_matmul,
            )

            return fp8_blockwise_matmul(x, w)
        from sglang_custom_tpu.layers.quantization.fp8 import fp8_matmul

        return fp8_matmul(x, w)
    return jnp.matmul(x, w)


def lora_mm(x, w, lora_l, target, ids, scale):
    """Linear + batched per-row LoRA delta (the bgmv form of the
    reference's SGMV kernels, srt/lora/triton_ops/): gather each row's
    adapter by slot id from the stacked pool, then two small batched
    matmuls. Slot 0 is all-zero, so base requests are exact no-ops."""
    out = mm(x, w)
    if lora_l is None or target not in lora_l:
        return out
    A = lora_l[target]["A"][ids]   # [B, in, r]
    Bm = lora_l[target]["B"][ids]  # [B, r, out]
    xa = jnp.einsum("bti,bir->btr", x, A)
    delta = jnp.einsum("btr,bro->bto", xa, Bm)
    return out + (delta * scale[:, None, None]).astype(out.dtype)


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,  # [L, Hkv, P, ps, 2, D]
    attn_backend: Callable,
    lora=None,
    lora_ids=None,
    lora_scale=None,
    mm_override=None,
    mm_mask=None,
):
    """Returns (hidden [B, T, H] post final-norm, updated kv_cache)."""
    feats, kv_cache = forward_features(
        params, cfg, meta, kv_cache, attn_backend,
        lora=lora, lora_ids=lora_ids, lora_scale=lora_scale,
        mm_override=mm_override, mm_mask=mm_mask,
    )
    return rms_norm(feats, params["final_norm"], cfg.rms_norm_eps), kv_cache


def forward_features(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,
    attn_backend: Callable,
    lora=None,        # {target: {"A": [L, S, in, r], "B": [L, S, r, out]}}
    lora_ids=None,    # [B] int32 adapter slot per row (0 = none)
    lora_scale=None,  # [B] f32 alpha/r per row
    mm_override=None, # [B, T, H] projected image features (llava injection)
    mm_mask=None,     # [B, T] bool: positions whose embedding is overridden
):
    """Decoder stack WITHOUT the final norm. The pre-norm hidden is the
    EAGLE "feature" sequence (reference: eagle_worker.py captures hidden
    states before lm_head for the draft model)."""
    B, T = meta.token_ids.shape
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    scale = 1.0 / math.sqrt(D)
    eps = cfg.rms_norm_eps

    x = jnp.take(params["embed"], meta.token_ids, axis=0)  # [B, T, H]
    if mm_override is not None:
        # Multimodal embedding injection (models/llava.py): image-token
        # positions take projected vision features instead of the lookup.
        x = jnp.where(mm_mask[..., None], mm_override.astype(x.dtype), x)
    inv_freq = jnp.asarray(rope_inv_freq(cfg))
    rp = meta.rope_positions if meta.rope_positions is not None else meta.positions
    if cfg.mrope_section and meta.mrope_positions is not None:
        # Qwen2-VL mrope: 3-channel positions over image spans. Decode
        # and text-only extends ship equal channels via rope_positions
        # (= positions + mrope_delta) instead — same math, 1/3 the data.
        from sglang_custom_tpu.layers.rotary import mrope_cos_sin

        cos, sin = mrope_cos_sin(
            meta.mrope_positions, inv_freq, cfg.mrope_section
        )
    else:
        cos, sin = rope_cos_sin(rp, inv_freq)  # [B, T, D/2]

    def layer_fn(carry, xs):
        x, kv = carry
        if lora is not None:
            lp, li, ll = xs
        else:
            (lp, li), ll = xs, None
        h = rms_norm(x, lp["input_norm"], eps)
        q = lora_mm(h, lp["q_proj"], ll, "q_proj", lora_ids, lora_scale)
        k = lora_mm(h, lp["k_proj"], ll, "k_proj", lora_ids, lora_scale)
        v = lora_mm(h, lp["v_proj"], ll, "v_proj", lora_ids, lora_scale)
        if "q_bias" in lp:
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
        q = q.reshape(B, T, Hq, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if "q_norm" in lp:
            # qwen3: per-head RMS norm before RoPE
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn_out, kv = attn_backend(q, k, v, kv, li, meta, scale)
        x = x + lora_mm(
            attn_out.reshape(B, T, Hq * D), lp["o_proj"], ll, "o_proj",
            lora_ids, lora_scale,
        )

        h = rms_norm(x, lp["post_norm"], eps)
        gate = lora_mm(h, lp["gate_proj"], ll, "gate_proj", lora_ids, lora_scale)
        up = lora_mm(h, lp["up_proj"], ll, "up_proj", lora_ids, lora_scale)
        x = x + lora_mm(
            jax.nn.silu(gate) * up, lp["down_proj"], ll, "down_proj",
            lora_ids, lora_scale,
        )
        return (x, kv), None

    # The KV pool rides the scan CARRY (not xs/ys): slicing it per layer
    # made XLA copy the layer slice three times per iteration; as carry the
    # backends update it in place (base.py AttentionBackend docstring).
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    xs = (params["layers"], layer_ids)
    if lora is not None:
        xs = xs + (lora,)
    (x, new_kv), _ = lax.scan(layer_fn, (x, kv_cache), xs)
    return x, new_kv


def compute_last_logits(params: dict, hidden: jax.Array, meta: ForwardMeta, cfg=None):
    """LogitsProcessor analog (reference: srt/layers/logits_processor.py:196):
    gather each row's last computed token, then one lm_head matmul in fp32."""
    idx = jnp.maximum(meta.extend_lens - 1, 0)  # [B]
    last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]  # [B, H]
    return jnp.einsum(
        "bh,hv->bv", last, params["lm_head"], preferred_element_type=jnp.float32
    )
