"""GLM-4 family (GlmForCausalLM / Glm4ForCausalLM), TPU-first.

Re-design of the reference's GLM models (reference: srt/models/glm4.py,
chatglm.py) in the scanned-layer style of models/llama.py. GLM quirks:

- **Partial interleaved RoPE**: only the first ``partial_rotary_factor *
  head_dim`` dims rotate, with adjacent-pair (interleaved) rotation; the
  rest pass through.
- QKV projections carry biases; the checkpoint fuses ``mlp.gate_up_proj``
  (split by row-slice at load, like phi3).
- Glm4 adds sandwich norms: ``post_self_attn_layernorm`` /
  ``post_mlp_layernorm`` applied to the block outputs before the residual
  add (gemma2-style).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import (
    apply_rope_interleaved,
    rope_cos_sin,
    rope_inv_freq_base,
)
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.models.llama import mm
from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS


def _sandwich(cfg: ModelConfig) -> bool:
    return cfg.architecture == "Glm4ForCausalLM"


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
    if cfg.attention_bias:
        layers["q_bias"] = s(L, Hq * D)
        layers["k_bias"] = s(L, Hkv * D)
        layers["v_bias"] = s(L, Hkv * D)
    if _sandwich(cfg):
        layers["post_attn_norm"] = s(L, H)
        layers["post_mlp_norm"] = s(L, H)
    return {
        "embed": s(V, H),
        "layers": layers,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    from sglang_custom_tpu.models.llama import param_shardings as _llama_ps

    sh = mesh_ctx.sharding
    # llama's rules cover the shared keys; add the sandwich norms
    base_cfg = cfg
    out = _llama_ps(base_cfg, mesh_ctx)
    if _sandwich(cfg):
        out["layers"]["post_attn_norm"] = sh()
        out["layers"]["post_mlp_norm"] = sh()
    return out


def hf_key_map(cfg: ModelConfig) -> dict:
    I = cfg.intermediate_size
    m = {
        "model.embed_tokens.weight": (("embed",), None, False),
        "model.norm.weight": (("final_norm",), None, False),
        "lm_head.weight": (("lm_head",), None, True),
    }
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        m[p + "input_layernorm.weight"] = (("layers", "input_norm"), l, False)
        for t in ("q_proj", "k_proj", "v_proj", "o_proj"):
            m[p + f"self_attn.{t}.weight"] = (("layers", t), l, True)
        if cfg.attention_bias:
            m[p + "self_attn.q_proj.bias"] = (("layers", "q_bias"), l, False)
            m[p + "self_attn.k_proj.bias"] = (("layers", "k_bias"), l, False)
            m[p + "self_attn.v_proj.bias"] = (("layers", "v_bias"), l, False)
        m[p + "post_attention_layernorm.weight"] = (
            ("layers", "post_norm"), l, False,
        )
        m[p + "mlp.gate_up_proj.weight"] = [
            (("layers", "gate_proj"), l, True, (0, I)),
            (("layers", "up_proj"), l, True, (I, 2 * I)),
        ]
        m[p + "mlp.down_proj.weight"] = (("layers", "down_proj"), l, True)
        if _sandwich(cfg):
            m[p + "post_self_attn_layernorm.weight"] = (
                ("layers", "post_attn_norm"), l, False,
            )
            m[p + "post_mlp_layernorm.weight"] = (
                ("layers", "post_mlp_norm"), l, False,
            )
    return m


def _apply_partial_rope(x, cos, sin, rotary_dim: int):
    rot = apply_rope_interleaved(x[..., :rotary_dim], cos, sin)
    return jnp.concatenate([rot, x[..., rotary_dim:]], axis=-1)


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,
    attn_backend: Callable,
):
    B, T = meta.token_ids.shape
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    scale = 1.0 / math.sqrt(D)
    eps = cfg.rms_norm_eps
    rd = int(D * cfg.partial_rotary_factor)
    sandwich = _sandwich(cfg)

    x = jnp.take(params["embed"], meta.token_ids, axis=0)
    inv_freq = jnp.asarray(rope_inv_freq_base(rd, cfg.rope_theta))
    cos, sin = rope_cos_sin(meta.positions, inv_freq)  # [B, T, rd/2]

    def layer_fn(carry, xs):
        x, kv = carry
        lp, li = xs
        h = rms_norm(x, lp["input_norm"], eps)
        q = mm(h, lp["q_proj"])
        k = mm(h, lp["k_proj"])
        v = mm(h, lp["v_proj"])
        if "q_bias" in lp:
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
        q = q.reshape(B, T, Hq, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        q = _apply_partial_rope(q, cos, sin, rd)
        k = _apply_partial_rope(k, cos, sin, rd)

        attn_out, kv = attn_backend(q, k, v, kv, li, meta, scale)
        attn_out = mm(attn_out.reshape(B, T, Hq * D), lp["o_proj"])
        if sandwich:
            attn_out = rms_norm(attn_out, lp["post_attn_norm"], eps)
        x = x + attn_out

        h = rms_norm(x, lp["post_norm"], eps)
        gate = mm(h, lp["gate_proj"])
        up = mm(h, lp["up_proj"])
        mlp = mm(jax.nn.silu(gate) * up, lp["down_proj"])
        if sandwich:
            mlp = rms_norm(mlp, lp["post_mlp_norm"], eps)
        x = x + mlp
        return (x, kv), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (x, new_kv), _ = lax.scan(
        layer_fn, (x, kv_cache), (params["layers"], layer_ids)
    )
    return rms_norm(x, params["final_norm"], eps), new_kv


def compute_last_logits(params, hidden, meta, cfg=None):
    from sglang_custom_tpu.models.llama import compute_last_logits as _c

    return _c(params, hidden, meta)
