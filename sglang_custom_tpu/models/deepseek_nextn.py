"""DeepSeek NextN (MTP) draft head: one DeepSeek decoder layer conditioned
on target features.

Capability analog of the reference's NextN speculative draft
(reference: srt/models/deepseek_nextn.py DeepseekModelNextN — embed_tokens,
enorm/hnorm RMSNorms, eh_proj 2H->H, ONE DeepseekV2DecoderLayer
(is_nextn), shared_head.norm; lm_head tied to the target). TPU-first: the
decoder layer reuses models/deepseek.py's absorbed-MLA block and
ragged-dot MoE so the draft shares the MLA latent-pool machinery; the
speculative worker (speculative/eagle_worker.py) drives it exactly like an
EAGLE head — NextN differs from EAGLE only in (a) normalizing embed and
feature separately BEFORE the concat projection and (b) the DeepSeek layer
body.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import rope_cos_sin, rope_inv_freq_base
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.models.deepseek import (
    _attn_shapes,
    _mla_block,
    _moe_ffn,
    _softmax_scale,
)
from sglang_custom_tpu.models.llama import mm


def _is_moe(cfg: ModelConfig) -> bool:
    return cfg.num_experts > 0


def param_shapes(cfg: ModelConfig) -> dict:
    H, V = cfg.hidden_size, cfg.vocab_size

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    layer = _attn_shapes(cfg, s, 1)
    if _is_moe(cfg):
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        layer.update({
            "router": s(1, H, E),
            "gate_proj": s(1, E, H, Im),
            "up_proj": s(1, E, H, Im),
            "down_proj": s(1, E, Im, H),
        })
        if cfg.topk_method == "noaux_tc":
            layer["router_bias"] = s(1, E)
        if cfg.n_shared_experts:
            Is = Im * cfg.n_shared_experts
            layer.update({
                "shared_gate": s(1, H, Is),
                "shared_up": s(1, H, Is),
                "shared_down": s(1, Is, H),
            })
    else:
        I = cfg.intermediate_size
        layer.update({
            "gate_proj": s(1, H, I),
            "up_proj": s(1, H, I),
            "down_proj": s(1, I, H),
        })
    return {
        "embed": s(V, H),
        "enorm": s(H),
        "hnorm": s(H),
        "eh_proj": s(2 * H, H),
        "layers": layer,
        "shared_head_norm": s(H),
        # tied to the target's when absent from the checkpoint (reference:
        # nextn shares the target lm_head)
        "lm_head": s(H, V),
    }


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    from sglang_custom_tpu.models import deepseek as _ds

    base = _ds.param_shardings(cfg, mesh_ctx)
    layer = base["moe_layers"] if _is_moe(cfg) else base["dense_layers"]
    return {
        "embed": base["embed"],
        "enorm": mesh_ctx.sharding(),
        "hnorm": mesh_ctx.sharding(),
        "eh_proj": mesh_ctx.sharding(),
        "layers": layer,
        "shared_head_norm": mesh_ctx.sharding(),
        "lm_head": base["lm_head"],
    }


def hf_key_map(cfg: ModelConfig) -> dict:
    """NextN checkpoints store the draft at layer index num_hidden_layers
    (reference: deepseek_nextn.py load_weights remaps
    model.layers.{n}.* -> the single decoder)."""
    from sglang_custom_tpu.models import deepseek as _ds

    n = cfg.num_layers  # draft cfg has num_layers=1; real ckpts use 61 etc.
    m = {}
    for li in (0, n):
        p = f"model.layers.{li}."
        m.update({
            p + "embed_tokens.weight": (("embed",), None, False),
            p + "enorm.weight": (("enorm",), None, False),
            p + "hnorm.weight": (("hnorm",), None, False),
            p + "eh_proj.weight": (("eh_proj",), None, True),
            p + "shared_head.norm.weight": (("shared_head_norm",), None, False),
            p + "shared_head.head.weight": (("lm_head",), None, True),
            p + "input_layernorm.weight": (("layers", "attn_norm"), 0, False),
            p + "self_attn.kv_a_proj_with_mqa.weight": (("layers", "kv_a"), 0, True),
            p + "self_attn.kv_a_layernorm.weight": (("layers", "kv_a_norm"), 0, False),
            p + "self_attn.kv_b_proj.weight": (("layers", "kv_b"), 0, False),
            p + "self_attn.o_proj.weight": (("layers", "o_proj"), 0, True),
            p + "post_attention_layernorm.weight": (("layers", "post_norm"), 0, False),
        })
        if cfg.q_lora_rank:
            m.update({
                p + "self_attn.q_a_proj.weight": (("layers", "q_a"), 0, True),
                p + "self_attn.q_a_layernorm.weight": (("layers", "q_a_norm"), 0, False),
                p + "self_attn.q_b_proj.weight": (("layers", "q_b"), 0, True),
            })
        else:
            m[p + "self_attn.q_proj.weight"] = (("layers", "q_proj"), 0, True)
        if _is_moe(cfg):
            m[p + "mlp.gate.weight"] = (("layers", "router"), 0, True)
            if cfg.topk_method == "noaux_tc":
                m[p + "mlp.gate.e_score_correction_bias"] = (
                    ("layers", "router_bias"), 0, False,
                )
            for e in range(cfg.num_experts):
                q = p + f"mlp.experts.{e}."
                m.update({
                    q + "gate_proj.weight": (("layers", "gate_proj"), (0, e), True),
                    q + "up_proj.weight": (("layers", "up_proj"), (0, e), True),
                    q + "down_proj.weight": (("layers", "down_proj"), (0, e), True),
                })
            if cfg.n_shared_experts:
                q = p + "mlp.shared_experts."
                m.update({
                    q + "gate_proj.weight": (("layers", "shared_gate"), 0, True),
                    q + "up_proj.weight": (("layers", "shared_up"), 0, True),
                    q + "down_proj.weight": (("layers", "shared_down"), 0, True),
                })
        else:
            m.update({
                p + "mlp.gate_proj.weight": (("layers", "gate_proj"), 0, True),
                p + "mlp.up_proj.weight": (("layers", "up_proj"), 0, True),
                p + "mlp.down_proj.weight": (("layers", "down_proj"), 0, True),
            })
    # plain top-level names some exports use
    m["model.embed_tokens.weight"] = (("embed",), None, False)
    m["lm_head.weight"] = (("lm_head",), None, True)
    return m


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,  # [1, 1, P, ps, F] latent pool
    attn_backend: Callable,
    features: jax.Array,  # [B, T, H] target pre-norm hidden, aligned
):
    """Returns (hidden [B, T, H] post shared_head.norm, updated draft KV)."""
    B, T = meta.token_ids.shape
    eps = cfg.rms_norm_eps
    scale = _softmax_scale(cfg)

    emb = jnp.take(params["embed"], meta.token_ids, axis=0)
    x = mm(
        jnp.concatenate(
            [
                rms_norm(emb, params["enorm"], eps),
                rms_norm(features.astype(emb.dtype), params["hnorm"], eps),
            ],
            axis=-1,
        ),
        params["eh_proj"],
    )

    inv_freq = jnp.asarray(
        rope_inv_freq_base(cfg.qk_rope_head_dim, cfg.rope_theta)
    )
    rp = (
        meta.rope_positions
        if meta.rope_positions is not None
        else meta.positions
    )
    cos, sin = rope_cos_sin(rp, inv_freq)

    # per-layer leaves, exactly what lax.scan hands deepseek's layer body
    lp = jax.tree.map(lambda v: v[0], params["layers"])
    li = jnp.asarray(0, jnp.int32)
    x, kv_cache = _mla_block(x, lp, kv_cache, li, cfg, meta, cos, sin, scale)
    h = rms_norm(x, lp["post_norm"], eps)
    if _is_moe(cfg):
        moe_out, _ = _moe_ffn(h.reshape(B * T, -1), lp, cfg)
        x = x + moe_out.reshape(B, T, -1)
    else:
        gate = mm(h, lp["gate_proj"])
        up = mm(h, lp["up_proj"])
        x = x + mm(jax.nn.silu(gate) * up, lp["down_proj"])
    return rms_norm(x, params["shared_head_norm"], eps), kv_cache


def compute_logits(params: dict, hidden: jax.Array) -> jax.Array:
    return jnp.einsum(
        "bth,hv->btv", hidden, params["lm_head"],
        preferred_element_type=jnp.float32,
    )
