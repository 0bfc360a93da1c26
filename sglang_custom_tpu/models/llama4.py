"""Llama-4 text family (Scout/Maverick): interleaved-MoE llama trunk.

Capability analog of the reference's Llama-4 support
(reference: srt/models/llama4.py — Llama4MoE top-1 sigmoid routing +
shared expert, NoPE layers with attention temperature tuning, L2 qk-norm).
TPU-first notes:

- Layers are HETEROGENEOUS (MoE every ``interleave_moe_layer_step``-th
  layer, rope/NoPE flags per layer), so the forward is an unrolled Python
  loop with statically-sliced stacked weights instead of one lax.scan —
  XLA still fuses per layer; heterogeneity lives at trace time.
- MoE follows the HF execution form exactly for goldens: every token is
  scaled by ``sigmoid(router_logit)`` (0 for non-top-k) and sent through
  each expert as a batched einsum, plus the always-on shared expert.
- RoPE is the interleaved complex-pair variant; qk L2-norm (weightless)
  applies AFTER rope on rope layers; NoPE layers scale queries by
  ``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1``
  (arXiv:2501.19399).
- ``attention_chunk_size`` (8192 chunked-local attention on rope layers)
  is not yet masked — exact for contexts up to the chunk size, a noted
  TODO beyond it.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import (
    apply_rope_interleaved,
    rope_cos_sin,
    rope_inv_freq,
)
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.models.llama import compute_last_logits, mm  # noqa: F401


def _moe_layer_flags(cfg: ModelConfig):
    step = cfg.interleave_moe_layer_step or 1
    return [((l + 1) % step == 0) for l in range(cfg.num_layers)]


def _rope_flags(cfg: ModelConfig):
    if cfg.no_rope_layers is not None:
        return [bool(x) for x in cfg.no_rope_layers]
    return [True] * cfg.num_layers


def param_shapes(cfg: ModelConfig) -> dict:
    L, H, D = cfg.num_layers, cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    E, I = cfg.num_experts, cfg.intermediate_size
    Im = cfg.intermediate_size_mlp or I
    V = cfg.vocab_size
    moe_flags = _moe_layer_flags(cfg)
    n_moe = sum(moe_flags)
    n_dense = L - n_moe

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    layers = {
        "input_norm": s(L, H),
        "q_proj": s(L, H, Hq * D),
        "k_proj": s(L, H, Hkv * D),
        "v_proj": s(L, H, Hkv * D),
        "o_proj": s(L, Hq * D, H),
        "post_norm": s(L, H),
    }
    out = {
        "embed": s(V, H),
        "layers": layers,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }
    if n_moe:
        out["moe_layers"] = {
            "router": s(n_moe, H, E),
            # HF stores experts as raw [E, H, 2I] / [E, I, H] params
            "gate_up": s(n_moe, E, H, 2 * I),
            "down": s(n_moe, E, I, H),
            "shared_gate": s(n_moe, H, I),
            "shared_up": s(n_moe, H, I),
            "shared_down": s(n_moe, I, H),
        }
    if n_dense:
        out["dense_layers"] = {
            "gate_proj": s(n_dense, H, Im),
            "up_proj": s(n_dense, H, Im),
            "down_proj": s(n_dense, Im, H),
        }
    return out


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS

    tp = mesh_ctx.tp_size
    sh = mesh_ctx.sharding
    t = TENSOR_AXIS

    def div(n):
        return tp > 1 and n % tp == 0

    shapes = param_shapes(cfg)

    def pick(path, leaf):
        nm = path[-1]
        shape = leaf.shape
        if nm in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                  "shared_gate", "shared_up"):
            return sh(None, None, t) if div(shape[-1]) else sh()
        if nm in ("o_proj", "down_proj", "shared_down"):
            return sh(None, t, None) if div(shape[-2]) else sh()
        if nm in ("gate_up", "down"):
            return sh(None, t, None, None) if div(cfg.num_experts) else sh()
        if nm == "embed":
            return sh(t, None) if div(cfg.vocab_size) else sh()
        if nm == "lm_head":
            return sh(None, t) if div(cfg.vocab_size) else sh()
        return sh()

    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    return jax.tree_util.tree_unflatten(
        treedef, [pick([getattr(p, "key", p) for p in path], leaf)
                  for path, leaf in leaves]
    )


def hf_key_map(cfg: ModelConfig) -> dict:
    m = {
        "model.embed_tokens.weight": (("embed",), None, False),
        "model.norm.weight": (("final_norm",), None, False),
        "lm_head.weight": (("lm_head",), None, True),
    }
    moe_flags = _moe_layer_flags(cfg)
    mi = di = 0
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        m.update({
            p + "input_layernorm.weight": (("layers", "input_norm"), l, False),
            p + "self_attn.q_proj.weight": (("layers", "q_proj"), l, True),
            p + "self_attn.k_proj.weight": (("layers", "k_proj"), l, True),
            p + "self_attn.v_proj.weight": (("layers", "v_proj"), l, True),
            p + "self_attn.o_proj.weight": (("layers", "o_proj"), l, True),
            p + "post_attention_layernorm.weight": (
                ("layers", "post_norm"), l, False,
            ),
        })
        if moe_flags[l]:
            f = p + "feed_forward."
            m.update({
                f + "router.weight": (("moe_layers", "router"), mi, True),
                # raw [E, H, 2I]/[E, I, H] parameters — no transpose
                f + "experts.gate_up_proj": (
                    ("moe_layers", "gate_up"), mi, False,
                ),
                f + "experts.down_proj": (("moe_layers", "down"), mi, False),
                f + "shared_expert.gate_proj.weight": (
                    ("moe_layers", "shared_gate"), mi, True,
                ),
                f + "shared_expert.up_proj.weight": (
                    ("moe_layers", "shared_up"), mi, True,
                ),
                f + "shared_expert.down_proj.weight": (
                    ("moe_layers", "shared_down"), mi, True,
                ),
            })
            mi += 1
        else:
            f = p + "feed_forward."
            m.update({
                f + "gate_proj.weight": (("dense_layers", "gate_proj"), di, True),
                f + "up_proj.weight": (("dense_layers", "up_proj"), di, True),
                f + "down_proj.weight": (("dense_layers", "down_proj"), di, True),
            })
            di += 1
    return m


def _l2norm(x, eps):
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    ).astype(x.dtype)


def _moe_ffn(h, lp, cfg: ModelConfig):
    """HF-faithful Llama4 MoE: scores = sigmoid(top-k logits) (0 off-路由),
    routed input SCALED BY SCORE before the expert, plus shared expert."""
    T, H = h.shape
    E = cfg.num_experts
    logits = jnp.einsum(
        "th,he->te", h, lp["router"], preferred_element_type=jnp.float32
    )
    k = max(cfg.num_experts_per_tok, 1)
    if k == 1:
        top = jnp.max(logits, axis=-1, keepdims=True)
        in_topk = logits >= top
    else:
        kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
        in_topk = logits >= kth
    scores = jnp.where(in_topk, jax.nn.sigmoid(logits), 0.0).astype(h.dtype)

    scaled = h[None, :, :] * scores.T[:, :, None]          # [E, T, H]
    gate_up = jnp.einsum("eth,ehi->eti", scaled, lp["gate_up"])
    I = cfg.intermediate_size
    gate, up = gate_up[..., :I], gate_up[..., I:]
    routed = jnp.einsum("eti,eih->eth", up * jax.nn.silu(gate), lp["down"])
    out = jnp.sum(routed, axis=0)                          # [T, H]

    sg = mm(h, lp["shared_gate"])
    su = mm(h, lp["shared_up"])
    out = out + mm(jax.nn.silu(sg) * su, lp["shared_down"])
    return out


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
    eps = cfg.rms_norm_eps
    scale = 1.0 / math.sqrt(D)
    moe_flags = _moe_layer_flags(cfg)
    rope_flags = _rope_flags(cfg)

    x = jnp.take(params["embed"], meta.token_ids, axis=0)
    inv_freq = jnp.asarray(rope_inv_freq(cfg))
    cos, sin = rope_cos_sin(meta.positions, inv_freq)

    # NoPE query temperature (arXiv:2501.19399)
    if cfg.attn_temperature_tuning:
        pos = meta.positions.astype(jnp.float32)
        attn_scales = (
            jnp.log1p(jnp.floor((pos + 1.0) / cfg.floor_scale))
            * cfg.attn_scale
            + 1.0
        )  # [B, T]

    mi = di = 0
    kv = kv_cache
    for l in range(cfg.num_layers):
        lp = {k: v[l] for k, v in params["layers"].items()}
        h = rms_norm(x, lp["input_norm"], eps)
        q = mm(h, lp["q_proj"]).reshape(B, T, Hq, D)
        k = mm(h, lp["k_proj"]).reshape(B, T, Hkv, D)
        v = mm(h, lp["v_proj"]).reshape(B, T, Hkv, D)
        if rope_flags[l]:
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            if cfg.use_qk_norm_l2:
                q = _l2norm(q, eps)
                k = _l2norm(k, eps)
        elif cfg.attn_temperature_tuning:
            q = (q * attn_scales[:, :, None, None]).astype(q.dtype)

        attn_out, kv = attn_backend(
            q, k, v, kv, jnp.asarray(l, jnp.int32), meta, scale
        )
        x = x + mm(attn_out.reshape(B, T, Hq * D), lp["o_proj"])

        h = rms_norm(x, lp["post_norm"], eps)
        if moe_flags[l]:
            mp = {k2: v2[mi] for k2, v2 in params["moe_layers"].items()}
            x = x + _moe_ffn(h.reshape(B * T, -1), mp, cfg).reshape(B, T, -1)
            mi += 1
        else:
            dp = {k2: v2[di] for k2, v2 in params["dense_layers"].items()}
            gate = mm(h, dp["gate_proj"])
            up = mm(h, dp["up_proj"])
            x = x + mm(jax.nn.silu(gate) * up, dp["down_proj"])
            di += 1

    return rms_norm(x, params["final_norm"], eps), kv
