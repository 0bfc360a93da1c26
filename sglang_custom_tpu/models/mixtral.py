"""Mixtral / Qwen-MoE family: sparse-MoE causal LM, TPU-first.

Re-design of the reference's MoE stack (reference: srt/models/mixtral.py,
srt/layers/moe/fused_moe_triton/fused_moe.py — triton grouped expert GEMMs
with tuned tiling configs, srt/layers/moe/topk.py) — not a port:

- **Sorted ragged expert GEMMs**: token->expert assignments are sorted by
  expert id on device and the three expert matmuls (gate/up/down) run as
  ``lax.ragged_dot`` over stacked expert weights [E, ...] — XLA's native
  grouped-GEMM primitive for TPU MoE. No capacity factor, no token drops,
  no triton-config zoo: exact computation at static shape N*top_k.
- Experts are stacked on a leading [L, E, ...] axis and scanned with the
  decoder body like every other weight (llama.py's scanned-layer design).
- Expert parallelism = sharding the [E] axis over the mesh's expert/tensor
  axis; XLA inserts the all-to-alls (SURVEY.md §7 phase 4; replaces
  ep_moe/token_dispatcher.py + DeepEP).

Covers MixtralForCausalLM (softmax-then-topk, renormalized) and the
Qwen2/Qwen3-MoE router variant (norm_topk_prob flag).
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
from sglang_custom_tpu.models import llama as llama_mod


def param_shapes(cfg: ModelConfig) -> dict:
    L, H, D = cfg.num_layers, cfg.hidden_size, cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    E = cfg.num_experts
    I = cfg.moe_intermediate_size or cfg.intermediate_size
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
        "router": s(L, H, E),
        "gate_proj": s(L, E, H, I),
        "up_proj": s(L, E, H, I),
        "down_proj": s(L, E, I, H),
    }
    if cfg.attention_bias:
        layers["q_bias"] = s(L, Hq * D)
        layers["k_bias"] = s(L, Hkv * D)
        layers["v_bias"] = s(L, Hkv * D)
    if cfg.qk_norm:
        layers["q_norm"] = s(L, D)
        layers["k_norm"] = s(L, D)
    if cfg.shared_expert_intermediate_size:
        # Qwen2-MoE: dense shared expert + sigmoid gate next to the
        # routed experts (reference: srt/models/qwen2_moe.py)
        Is = cfg.shared_expert_intermediate_size
        layers.update({
            "shared_gate_proj": s(L, H, Is),
            "shared_up_proj": s(L, H, Is),
            "shared_down_proj": s(L, Is, H),
            "shared_expert_gate": s(L, 1, H),
        })
    return {
        "embed": s(V, H),
        "layers": layers,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    """Experts shard over the tensor axis (EP); attention stays TP."""
    from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS

    tp = mesh_ctx.tp_size
    t = TENSOR_AXIS

    def sh(*spec):
        return mesh_ctx.sharding(*spec)

    def div(n):
        return n % tp == 0

    E = cfg.num_experts
    attn_col = sh(None, None, t) if div(cfg.num_q_heads * cfg.head_dim) else sh()
    kv_col = sh(None, None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
    # Expert-parallel placement: one group of experts per tensor-axis shard.
    ep = sh(None, t, None, None) if div(E) else sh()
    layers = {
        "input_norm": sh(),
        "q_proj": attn_col,
        "k_proj": kv_col,
        "v_proj": kv_col,
        "o_proj": sh(None, t, None) if div(cfg.num_q_heads * cfg.head_dim) else sh(),
        "post_norm": sh(),
        "router": sh(),
        "gate_proj": ep,
        "up_proj": ep,
        "down_proj": ep,
    }
    if cfg.attention_bias:
        layers["q_bias"] = sh(None, t) if div(cfg.num_q_heads * cfg.head_dim) else sh()
        layers["k_bias"] = sh(None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
        layers["v_bias"] = sh(None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
    if cfg.qk_norm:
        layers["q_norm"] = sh()
        layers["k_norm"] = sh()
    if cfg.shared_expert_intermediate_size:
        Is = cfg.shared_expert_intermediate_size
        col = sh(None, None, t) if div(Is) else sh()
        layers.update({
            "shared_gate_proj": col,
            "shared_up_proj": col,
            "shared_down_proj": sh(None, t, None) if div(Is) else sh(),
            "shared_expert_gate": sh(),
        })
    return {
        "embed": sh(t, None) if div(cfg.vocab_size) else sh(),
        "layers": layers,
        "final_norm": sh(),
        "lm_head": sh(None, t) if div(cfg.vocab_size) else sh(),
    }


def moe_ffn(x: jax.Array, lp: dict, cfg: ModelConfig):
    """Sparse MoE feed-forward for a [N, H] token block.

    Reference: fused_moe.py's sort-by-expert + grouped GEMM structure,
    re-expressed with lax.ragged_dot (moe_align_block_size + the triton
    kernel collapse into sort_key + ragged_dot).

    Returns (out [N, H], expert_counts [E] i32) — the counts feed the
    expert-distribution recorder (reference: eplb/expert_distribution.py)
    and are dead code eliminated by XLA when the caller drops them.
    """
    N, H = x.shape
    E = cfg.num_experts
    K = cfg.num_experts_per_tok

    router_logits = jnp.einsum(
        "nh,he->ne", x, lp["router"], preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(router_logits, axis=-1)
    topk_w, topk_e = lax.top_k(probs, K)  # [N, K]
    if cfg.norm_topk_prob:
        topk_w = topk_w / jnp.sum(topk_w, axis=-1, keepdims=True)

    # Flatten assignments and sort by expert id so each expert's tokens are
    # contiguous (the moe_align_block_size analog).
    flat_e = topk_e.reshape(-1)                      # [N*K]
    order = jnp.argsort(flat_e)                      # stable
    inv_order = jnp.argsort(order)
    tok_idx = order // K                             # source token per slot
    xs = jnp.take(x, tok_idx, axis=0)                # [N*K, H] sorted by expert
    group_sizes = jnp.bincount(flat_e, length=E)

    gate = lax.ragged_dot(xs, lp["gate_proj"], group_sizes)
    up = lax.ragged_dot(xs, lp["up_proj"], group_sizes)
    act = jax.nn.silu(gate) * up                     # [N*K, I]
    out = lax.ragged_dot(act, lp["down_proj"], group_sizes)  # [N*K, H]

    out = jnp.take(out, inv_order, axis=0).reshape(N, K, H)
    out = jnp.sum(out * topk_w[..., None].astype(out.dtype), axis=1)
    return out, group_sizes.astype(jnp.int32)


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,  # [L, Hkv, P, ps, 2, D]
    attn_backend: Callable,
    record_experts: bool = False,
):
    """Returns (hidden [B, T, H] post final-norm, updated kv_cache[, counts
    [L, E] when record_experts])."""
    out = forward_features(
        params, cfg, meta, kv_cache, attn_backend,
        record_experts=record_experts,
    )
    feats, kv_cache = out[0], out[1]
    normed = rms_norm(feats, params["final_norm"], cfg.rms_norm_eps)
    if record_experts:
        return normed, kv_cache, out[2]
    return normed, kv_cache


def forward_features(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,
    attn_backend: Callable,
    record_experts: bool = False,
):
    """Decoder stack without the final norm (EAGLE feature sequence)."""
    B, T = meta.token_ids.shape
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    scale = 1.0 / math.sqrt(D)
    eps = cfg.rms_norm_eps

    x = jnp.take(params["embed"], meta.token_ids, axis=0)
    inv_freq = jnp.asarray(rope_inv_freq(cfg))
    cos, sin = rope_cos_sin(meta.positions, inv_freq)

    def layer_fn(carry, xs):
        x, kv = carry
        lp, li = xs
        h = rms_norm(x, lp["input_norm"], eps)
        q = jnp.einsum("bth,hd->btd", h, lp["q_proj"])
        k = jnp.einsum("bth,hd->btd", h, lp["k_proj"])
        v = jnp.einsum("bth,hd->btd", h, lp["v_proj"])
        if "q_bias" in lp:
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
        q = q.reshape(B, T, Hq, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if "q_norm" in lp:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn_out, kv = attn_backend(q, k, v, kv, li, meta, scale)
        x = x + jnp.einsum(
            "btd,dh->bth", attn_out.reshape(B, T, Hq * D), lp["o_proj"]
        )

        h = rms_norm(x, lp["post_norm"], eps)
        moe_out, counts = moe_ffn(h.reshape(B * T, -1), lp, cfg)
        x = x + moe_out.reshape(B, T, -1)
        if "shared_up_proj" in lp:
            sh_act = jax.nn.silu(
                jnp.einsum("bth,hi->bti", h, lp["shared_gate_proj"])
            ) * jnp.einsum("bth,hi->bti", h, lp["shared_up_proj"])
            sh_out = jnp.einsum(
                "bti,ih->bth", sh_act, lp["shared_down_proj"]
            )
            g = jax.nn.sigmoid(jnp.einsum(
                "bth,oh->bto", h, lp["shared_expert_gate"]
            ))
            x = x + (g * sh_out).astype(x.dtype)
        if record_experts:
            return (x, kv), counts
        return (x, kv), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (x, new_kv), ys = lax.scan(
        layer_fn, (x, kv_cache), (params["layers"], layer_ids)
    )
    if record_experts:
        return x, new_kv, ys  # ys: per-layer expert counts [L, E]
    return x, new_kv


compute_last_logits = llama_mod.compute_last_logits


def hf_key_map(cfg: ModelConfig) -> dict:
    """Mixtral naming (block_sparse_moe.gate + experts.N.w1/w3/w2) and
    Qwen3-MoE naming (mlp.gate + mlp.experts.N.gate/up/down_proj)."""
    qwen = cfg.architecture.startswith("Qwen")
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
        })
        router = p + ("mlp.gate.weight" if qwen else "block_sparse_moe.gate.weight")
        m[router] = (("layers", "router"), l, True)
        for e in range(cfg.num_experts):
            if qwen:
                pe = p + f"mlp.experts.{e}."
                names = ("gate_proj.weight", "up_proj.weight", "down_proj.weight")
            else:
                pe = p + f"block_sparse_moe.experts.{e}."
                # w1 = gate, w3 = up, w2 = down (HF Mixtral convention)
                names = ("w1.weight", "w3.weight", "w2.weight")
            m[pe + names[0]] = (("layers", "gate_proj"), (l, e), True)
            m[pe + names[1]] = (("layers", "up_proj"), (l, e), True)
            m[pe + names[2]] = (("layers", "down_proj"), (l, e), True)
        if cfg.shared_expert_intermediate_size:
            ps_ = p + "mlp.shared_expert."
            m.update({
                ps_ + "gate_proj.weight":
                    (("layers", "shared_gate_proj"), l, True),
                ps_ + "up_proj.weight":
                    (("layers", "shared_up_proj"), l, True),
                ps_ + "down_proj.weight":
                    (("layers", "shared_down_proj"), l, True),
                p + "mlp.shared_expert_gate.weight":
                    (("layers", "shared_expert_gate"), l, False),
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
