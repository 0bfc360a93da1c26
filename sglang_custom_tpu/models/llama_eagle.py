"""EAGLE draft head: a shallow llama decoder conditioned on target features.

Capability analog of the reference's EAGLE draft model
(reference: srt/models/llama_eagle.py — LlamaForCausalLMEagle: an embedding,
an ``fc`` projecting concat(embed, target_hidden) 2H->H, and one (or few)
llama decoder layers whose lm_head is tied to the target's). TPU-first:
same stacked-weights + ``lax.scan`` structure as models/llama.py so the
draft shares the attention backends and paged-KV machinery.

The draft's "position t" encodes the pair (token_{t+1}, feature_t) where
feature_t is the target's pre-final-norm hidden at position t — the EAGLE
feature-shift. The speculative worker (speculative/eagle_worker.py) owns
that alignment; this module just consumes aligned (token_ids, features).
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
from sglang_custom_tpu.models.llama import mm


def param_shapes(cfg: ModelConfig) -> dict:
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
    return {
        "embed": s(V, H),
        "fc": s(2 * H, H),
        "layers": layers,
        # lm_head is tied to the target's when absent from the checkpoint
        # (reference: llama_eagle shares the target lm_head).
        "lm_head": s(H, V),
    }


def hf_key_map(cfg: ModelConfig) -> dict:
    """EAGLE checkpoints name layers without the `model.` prefix."""
    m = {
        "embed_tokens.weight": (("embed",), None, False),
        "model.embed_tokens.weight": (("embed",), None, False),
        "fc.weight": (("fc",), None, True),
        "lm_head.weight": (("lm_head",), None, True),
    }
    for l in range(cfg.num_layers):
        for prefix in (f"layers.{l}.", f"model.layers.{l}."):
            m.update({
                prefix + "input_layernorm.weight": (("layers", "input_norm"), l, False),
                prefix + "self_attn.q_proj.weight": (("layers", "q_proj"), l, True),
                prefix + "self_attn.k_proj.weight": (("layers", "k_proj"), l, True),
                prefix + "self_attn.v_proj.weight": (("layers", "v_proj"), l, True),
                prefix + "self_attn.o_proj.weight": (("layers", "o_proj"), l, True),
                prefix + "post_attention_layernorm.weight": (("layers", "post_norm"), l, False),
                prefix + "mlp.gate_proj.weight": (("layers", "gate_proj"), l, True),
                prefix + "mlp.up_proj.weight": (("layers", "up_proj"), l, True),
                prefix + "mlp.down_proj.weight": (("layers", "down_proj"), l, True),
            })
    return m


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    from sglang_custom_tpu.parallel.sharding import param_shardings as _ps

    base = _ps(cfg, mesh_ctx)
    base.pop("final_norm", None)
    base["fc"] = mesh_ctx.sharding()
    return base


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,
    attn_backend: Callable,
    features: jax.Array,  # [B, T, H] target pre-norm hidden, aligned
):
    """Returns (draft hidden [B, T, H] — no final norm, EAGLE-style —
    and the updated draft KV cache)."""
    B, T = meta.token_ids.shape
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    scale = 1.0 / math.sqrt(D)
    eps = cfg.rms_norm_eps

    emb = jnp.take(params["embed"], meta.token_ids, axis=0)  # [B, T, H]
    x = mm(
        jnp.concatenate([emb, features.astype(emb.dtype)], axis=-1),
        params["fc"],
    )
    inv_freq = jnp.asarray(rope_inv_freq(cfg))
    rp = meta.rope_positions if meta.rope_positions is not None else meta.positions
    cos, sin = rope_cos_sin(rp, inv_freq)

    def layer_fn(carry, xs):
        x, kv = carry
        lp, li = xs
        h = rms_norm(x, lp["input_norm"], eps)
        q = mm(h, lp["q_proj"]).reshape(B, T, Hq, D)
        k = mm(h, lp["k_proj"]).reshape(B, T, Hkv, D)
        v = mm(h, lp["v_proj"]).reshape(B, T, Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, kv = attn_backend(q, k, v, kv, li, meta, scale)
        x = x + mm(attn_out.reshape(B, T, Hq * D), lp["o_proj"])
        h = rms_norm(x, lp["post_norm"], eps)
        x = x + mm(jax.nn.silu(mm(h, lp["gate_proj"])) * mm(h, lp["up_proj"]),
                   lp["down_proj"])
        return (x, kv), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (x, new_kv), _ = lax.scan(
        layer_fn, (x, kv_cache), (params["layers"], layer_ids)
    )
    return x, new_kv


def compute_logits(params: dict, hidden: jax.Array) -> jax.Array:
    """Draft logits from (un-normed) hidden: [..., H] -> [..., V] f32."""
    return jnp.einsum(
        "...h,hv->...v", hidden, params["lm_head"],
        preferred_element_type=jnp.float32,
    )
