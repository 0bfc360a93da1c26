"""DeepSeek V2/V3 family: MLA + DeepSeekMoE causal LM, TPU-first.

Re-design of the reference's DeepSeek stack (reference:
srt/models/deepseek_v2.py — MLA attention with weight absorption, MoE with
shared experts and grouped routing; latent KV pool
mem_cache/memory_pool.py:769) in the scanned-layer style of models/llama.py:

- **Two scans** over homogeneous weight stacks: the first
  ``first_k_dense_replace`` layers (dense MLP) and the remaining MoE
  layers. The latent KV pool is sliced to match; both slices thread
  through their scan as xs/ys.
- **Absorbed MLA**: W_UK is folded into the query and W_UV into the
  output around ops/mla_attention.py, so attention runs in the latent
  space — the TPU-friendly all-matmul form (no K/V expansion).
- Router variants: greedy softmax (V2-Lite), group-limited greedy (V2),
  and noaux_tc sigmoid + e_score_correction_bias (V3), matching HF
  semantics exactly for golden tests.
- Expert GEMMs reuse the sorted ``lax.ragged_dot`` pattern
  (models/mixtral.py); shared experts are a plain dense MLP.
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
    apply_rope,
    apply_rope_interleaved,
    rope_cos_sin,
    rope_inv_freq_base,
)
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.models.llama import mm
from sglang_custom_tpu.ops.mla_attention import mla_paged_attention
from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS


# DP-attention context (parallel/dp_attention.py): set by the Engine
# before weight loading when --enable-dp-attention. Module-level because
# forward()'s signature is the zoo-wide contract; one context per process
# matches one serving engine per process (reference:
# srt/layers/dp_attention.py module-global _ATTN_TP_GROUP).
_DP_CTX = None


def set_dp_context(ctx) -> None:
    global _DP_CTX
    _DP_CTX = ctx


def _dp_active(cfg: ModelConfig):
    if _DP_CTX is not None and _DP_CTX.supports(cfg.num_experts):
        return _DP_CTX
    return None


def _attn_shapes(cfg: ModelConfig, s, L: int) -> dict:
    H = cfg.hidden_size
    Hq = cfg.num_q_heads
    R, Dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    qk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    d = {
        "attn_norm": s(L, H),
        "kv_a": s(L, H, R + Dr),
        "kv_a_norm": s(L, R),
        "kv_b": s(L, Hq * (cfg.qk_nope_head_dim + cfg.v_head_dim), R),
        "o_proj": s(L, Hq * cfg.v_head_dim, H),
        "post_norm": s(L, H),
    }
    if cfg.q_lora_rank:
        d["q_a"] = s(L, H, cfg.q_lora_rank)
        d["q_a_norm"] = s(L, cfg.q_lora_rank)
        d["q_b"] = s(L, cfg.q_lora_rank, Hq * qk)
    else:
        d["q_proj"] = s(L, H, Hq * qk)
    return d


def _num_dense(cfg: ModelConfig) -> int:
    if cfg.num_experts == 0:
        return cfg.num_layers
    return cfg.first_k_dense_replace


def param_shapes(cfg: ModelConfig) -> dict:
    H, V = cfg.hidden_size, cfg.vocab_size
    Kd = _num_dense(cfg)
    Lm = cfg.num_layers - Kd
    E, Im = cfg.num_experts, cfg.moe_intermediate_size
    I = cfg.intermediate_size

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    dense = _attn_shapes(cfg, s, Kd)
    dense.update({
        "gate_proj": s(Kd, H, I),
        "up_proj": s(Kd, H, I),
        "down_proj": s(Kd, I, H),
    })
    moe = _attn_shapes(cfg, s, Lm)
    moe.update({
        "router": s(Lm, H, E),
        "gate_proj": s(Lm, E, H, Im),
        "up_proj": s(Lm, E, H, Im),
        "down_proj": s(Lm, E, Im, H),
    })
    if cfg.topk_method == "noaux_tc":
        moe["router_bias"] = s(Lm, E)
    if cfg.n_shared_experts:
        Is = Im * cfg.n_shared_experts
        moe.update({
            "shared_gate": s(Lm, H, Is),
            "shared_up": s(Lm, H, Is),
            "shared_down": s(Lm, Is, H),
        })
    return {
        "embed": s(V, H),
        "dense_layers": dense,
        "moe_layers": moe,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    tp = mesh_ctx.tp_size
    t = TENSOR_AXIS
    sh = mesh_ctx.sharding

    def div(n):
        return n % tp == 0

    Hq = cfg.num_q_heads
    qk_out = Hq * (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    kvb_out = Hq * (cfg.qk_nope_head_dim + cfg.v_head_dim)

    def attn(L):
        d = {
            "attn_norm": sh(),
            "kv_a": sh(),
            "kv_a_norm": sh(),
            "kv_b": sh(None, t, None) if div(kvb_out) else sh(),
            "o_proj": sh(None, t, None) if div(Hq * cfg.v_head_dim) else sh(),
            "post_norm": sh(),
        }
        if cfg.q_lora_rank:
            d["q_a"] = sh()
            d["q_a_norm"] = sh()
            d["q_b"] = sh(None, None, t) if div(qk_out) else sh()
        else:
            d["q_proj"] = sh(None, None, t) if div(qk_out) else sh()
        return d

    dense = attn(0)
    dense.update({
        "gate_proj": sh(None, None, t) if div(cfg.intermediate_size) else sh(),
        "up_proj": sh(None, None, t) if div(cfg.intermediate_size) else sh(),
        "down_proj": sh(None, t, None) if div(cfg.intermediate_size) else sh(),
    })
    moe = attn(0)
    ep = sh(None, t, None, None) if div(cfg.num_experts) else sh()
    moe.update({
        "router": sh(),
        "gate_proj": ep,
        "up_proj": ep,
        "down_proj": ep,
    })
    if cfg.topk_method == "noaux_tc":
        moe["router_bias"] = sh()
    if cfg.n_shared_experts:
        Is = cfg.moe_intermediate_size * cfg.n_shared_experts
        moe.update({
            "shared_gate": sh(None, None, t) if div(Is) else sh(),
            "shared_up": sh(None, None, t) if div(Is) else sh(),
            "shared_down": sh(None, t, None) if div(Is) else sh(),
        })
    if _dp_active(cfg):
        # dp-attention layout: attention weights replicated (attention
        # runs batch-parallel over the tensor axis with full heads —
        # the latent KV cannot be head-sharded anyway); shared experts
        # replicated too so the whole non-routed path is data-parallel.
        # Routed expert stacks stay expert-sharded over `tensor`.
        for d in (dense, moe):
            for k in ("kv_b", "o_proj", "q_b", "q_proj"):
                if k in d:
                    d[k] = sh()
        for k in ("shared_gate", "shared_up", "shared_down"):
            if k in moe:
                moe[k] = sh()
    return {
        "embed": sh(t, None) if div(cfg.vocab_size) else sh(),
        "dense_layers": dense,
        "moe_layers": moe,
        "final_norm": sh(),
        "lm_head": sh(None, t) if div(cfg.vocab_size) else sh(),
    }


def hf_key_map(cfg: ModelConfig) -> dict:
    Kd = _num_dense(cfg)
    m = {
        "model.embed_tokens.weight": (("embed",), None, False),
        "model.norm.weight": (("final_norm",), None, False),
        "lm_head.weight": (("lm_head",), None, True),
    }
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        grp = "dense_layers" if l < Kd else "moe_layers"
        i = l if l < Kd else l - Kd
        m.update({
            p + "input_layernorm.weight": ((grp, "attn_norm"), i, False),
            p + "self_attn.kv_a_proj_with_mqa.weight": ((grp, "kv_a"), i, True),
            p + "self_attn.kv_a_layernorm.weight": ((grp, "kv_a_norm"), i, False),
            # kept [Hq*(nope+v), R]: reshaped (not transposed) in forward
            p + "self_attn.kv_b_proj.weight": ((grp, "kv_b"), i, False),
            p + "self_attn.o_proj.weight": ((grp, "o_proj"), i, True),
            p + "post_attention_layernorm.weight": ((grp, "post_norm"), i, False),
        })
        if cfg.q_lora_rank:
            m.update({
                p + "self_attn.q_a_proj.weight": ((grp, "q_a"), i, True),
                p + "self_attn.q_a_layernorm.weight": ((grp, "q_a_norm"), i, False),
                p + "self_attn.q_b_proj.weight": ((grp, "q_b"), i, True),
            })
        else:
            m[p + "self_attn.q_proj.weight"] = ((grp, "q_proj"), i, True)
        if l < Kd:
            m.update({
                p + "mlp.gate_proj.weight": ((grp, "gate_proj"), i, True),
                p + "mlp.up_proj.weight": ((grp, "up_proj"), i, True),
                p + "mlp.down_proj.weight": ((grp, "down_proj"), i, True),
            })
        else:
            m[p + "mlp.gate.weight"] = ((grp, "router"), i, True)
            if cfg.topk_method == "noaux_tc":
                m[p + "mlp.gate.e_score_correction_bias"] = (
                    (grp, "router_bias"), i, False,
                )
            for e in range(cfg.num_experts):
                pe = p + f"mlp.experts.{e}."
                m[pe + "gate_proj.weight"] = ((grp, "gate_proj"), (i, e), True)
                m[pe + "up_proj.weight"] = ((grp, "up_proj"), (i, e), True)
                m[pe + "down_proj.weight"] = ((grp, "down_proj"), (i, e), True)
            if cfg.n_shared_experts:
                ps_ = p + "mlp.shared_experts."
                m[ps_ + "gate_proj.weight"] = ((grp, "shared_gate"), i, True)
                m[ps_ + "up_proj.weight"] = ((grp, "shared_up"), i, True)
                m[ps_ + "down_proj.weight"] = ((grp, "shared_down"), i, True)
    return m


def _softmax_scale(cfg: ModelConfig) -> float:
    qk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    scale = qk ** -0.5
    rs = cfg.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        # yarn mscale correction (reference: deepseek_v2.py yarn_get_mscale)
        mscale_all = rs.get("mscale_all_dim", 0.0)
        factor = rs.get("factor", 1.0)
        if mscale_all and factor > 1.0:
            mscale = 0.1 * mscale_all * math.log(factor) + 1.0
            scale = scale * mscale * mscale
    return scale


def _router(h: jax.Array, lp: dict, cfg: ModelConfig):
    """DeepSeek routing -> (topk_weights [N,K] f32, topk_experts [N,K] i32).
    Matches HF DeepseekV2MoEGate / DeepseekV3TopkRouter semantics."""
    N = h.shape[0]
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = jnp.einsum(
        "nh,he->ne", h.astype(jnp.float32), lp["router"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    if cfg.topk_method == "greedy":
        topk_w, topk_e = lax.top_k(scores, K)
    elif cfg.topk_method == "group_limited_greedy":
        G = cfg.n_group
        group_scores = jnp.max(scores.reshape(N, G, E // G), axis=-1)
        _, grp_idx = lax.top_k(group_scores, cfg.topk_group)
        grp_mask = jnp.zeros((N, G), bool).at[
            jnp.arange(N)[:, None], grp_idx
        ].set(True)
        masked = jnp.where(
            jnp.repeat(grp_mask, E // G, axis=1), scores, 0.0
        )
        topk_w, topk_e = lax.top_k(masked, K)
    else:  # noaux_tc (V3)
        choice = scores + lp["router_bias"].astype(jnp.float32)
        G = cfg.n_group
        top2 = lax.top_k(choice.reshape(N, G, E // G), 2)[0]
        group_scores = jnp.sum(top2, axis=-1)
        _, grp_idx = lax.top_k(group_scores, cfg.topk_group)
        grp_mask = jnp.zeros((N, G), bool).at[
            jnp.arange(N)[:, None], grp_idx
        ].set(True)
        masked = jnp.where(
            jnp.repeat(grp_mask, E // G, axis=1), choice, 0.0
        )
        _, topk_e = lax.top_k(masked, K)
        topk_w = jnp.take_along_axis(scores, topk_e, axis=-1)
        if cfg.norm_topk_prob:
            topk_w = topk_w / (jnp.sum(topk_w, axis=-1, keepdims=True) + 1e-20)
    return topk_w * cfg.routed_scaling_factor, topk_e


def _moe_ffn(x: jax.Array, lp: dict, cfg: ModelConfig):
    """Routed experts (sorted ragged GEMMs) + shared experts.
    Returns (out, expert_counts [E] i32) for the distribution recorder."""
    N, H = x.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    topk_w, topk_e = _router(x, lp, cfg)

    flat_e = topk_e.reshape(-1)
    order = jnp.argsort(flat_e)
    inv_order = jnp.argsort(order)
    tok_idx = order // K
    xs = jnp.take(x, tok_idx, axis=0)
    group_sizes = jnp.bincount(flat_e, length=E)

    gate = lax.ragged_dot(xs, lp["gate_proj"], group_sizes)
    up = lax.ragged_dot(xs, lp["up_proj"], group_sizes)
    act = jax.nn.silu(gate) * up
    out = lax.ragged_dot(act, lp["down_proj"], group_sizes)
    out = jnp.take(out, inv_order, axis=0).reshape(N, K, H)
    routed = jnp.sum(out * topk_w[..., None].astype(out.dtype), axis=1)

    if cfg.n_shared_experts:
        g = mm(x, lp["shared_gate"])
        u = mm(x, lp["shared_up"])
        routed = routed + mm(jax.nn.silu(g) * u, lp["shared_down"])
    return routed, group_sizes.astype(jnp.int32)


def _mla_block(x, lp, kv, li, cfg: ModelConfig, meta, cos, sin, scale):
    """One MLA attention block with absorbed W_UK/W_UV."""
    B, T = meta.token_ids.shape
    Hq = cfg.num_q_heads
    n, r = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    v = cfg.v_head_dim
    R = cfg.kv_lora_rank
    eps = cfg.rms_norm_eps
    rope = apply_rope_interleaved if cfg.rope_interleaved else apply_rope

    h = rms_norm(x, lp["attn_norm"], eps)
    if "q_a" in lp:
        q = mm(rms_norm(mm(h, lp["q_a"]), lp["q_a_norm"], eps), lp["q_b"])
    else:
        q = mm(h, lp["q_proj"])
    q = q.reshape(B, T, Hq, n + r)
    q_nope, q_pe = q[..., :n], q[..., n:]

    ckv = mm(h, lp["kv_a"])  # [B, T, R + Dr]
    c = rms_norm(ckv[..., :R], lp["kv_a_norm"], eps)
    k_pe = ckv[..., R:]

    q_pe = rope(q_pe, cos, sin)
    k_pe = rope(k_pe[:, :, None, :], cos, sin)[:, :, 0]

    kv_b = lp["kv_b"].reshape(Hq, n + v, R)
    w_uk = kv_b[:, :n]   # [Hq, n, R]
    w_uv = kv_b[:, n:]   # [Hq, v, R]
    q_lat = jnp.einsum("bthn,hnr->bthr", q_nope, w_uk)

    out_lat, kv = mla_paged_attention(
        q_lat, q_pe, c, k_pe, kv, li, meta, scale
    )
    out = jnp.einsum("bthr,hvr->bthv", out_lat, w_uv)
    x = x + mm(out.reshape(B, T, Hq * v), lp["o_proj"])
    return x, kv


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,  # [L, 1, P, ps, 2, F/2] latent pool
    attn_backend: Callable,  # unused: MLA has its own kernel path
    record_experts: bool = False,
    return_features: bool = False,
):
    B, T = meta.token_ids.shape
    eps = cfg.rms_norm_eps
    scale = _softmax_scale(cfg)
    Kd = _num_dense(cfg)

    x = jnp.take(params["embed"], meta.token_ids, axis=0)
    inv_freq = jnp.asarray(
        rope_inv_freq_base(cfg.qk_rope_head_dim, cfg.rope_theta)
    )
    rp = (
        meta.rope_positions
        if meta.rope_positions is not None
        else meta.positions
    )
    cos, sin = rope_cos_sin(rp, inv_freq)

    dp_ctx0 = _dp_active(cfg)

    def dense_layer(carry, xs):
        x, kv = carry
        lp, li = xs
        if dp_ctx0 is not None and B % dp_ctx0.tp == 0:
            x = dp_ctx0.batch_sharded(x)
        x, kv = _mla_block(x, lp, kv, li, cfg, meta, cos, sin, scale)
        h = rms_norm(x, lp["post_norm"], eps)
        gate = mm(h, lp["gate_proj"])
        up = mm(h, lp["up_proj"])
        x = x + mm(jax.nn.silu(gate) * up, lp["down_proj"])
        return (x, kv), None

    dp_ctx = _dp_active(cfg)

    def moe_layer(carry, xs):
        x, kv = carry
        lp, li = xs
        if dp_ctx is not None and B % dp_ctx.tp == 0:
            # dp-attention: batch rows sharded over the tensor axis, so
            # the (replicated-weight) MLA block below runs data-parallel
            x = dp_ctx.batch_sharded(x)
        x, kv = _mla_block(x, lp, kv, li, cfg, meta, cos, sin, scale)
        h = rms_norm(x, lp["post_norm"], eps)
        if dp_ctx is not None and (B * T) % dp_ctx.tp == 0:
            from sglang_custom_tpu.parallel.dp_attention import dp_moe_ffn

            hf = dp_ctx.batch_sharded(h.reshape(B * T, -1))
            routed = dp_moe_ffn(dp_ctx, hf, lp, cfg, _router)
            if cfg.n_shared_experts:
                g = mm(hf, lp["shared_gate"])
                u = mm(hf, lp["shared_up"])
                routed = routed + mm(
                    jax.nn.silu(g) * u, lp["shared_down"]
                )
            counts = (
                jnp.zeros((cfg.num_experts,), jnp.int32)
                if not record_experts
                else jnp.bincount(
                    _router(h.reshape(B * T, -1), lp, cfg)[1].reshape(-1),
                    length=cfg.num_experts,
                ).astype(jnp.int32)
            )
            moe_out = routed
        else:
            moe_out, counts = _moe_ffn(h.reshape(B * T, -1), lp, cfg)
        x = x + moe_out.reshape(B, T, -1)
        return (x, kv), counts if record_experts else None

    L = cfg.num_layers
    (x, kv), _ = lax.scan(
        dense_layer, (x, kv_cache),
        (params["dense_layers"], jnp.arange(Kd, dtype=jnp.int32)),
    )
    (x, new_kv), ys = lax.scan(
        moe_layer, (x, kv),
        (params["moe_layers"], jnp.arange(Kd, L, dtype=jnp.int32)),
    )
    if record_experts:
        counts = ys
    if return_features:
        # PRE-final-norm hidden: the NextN/EAGLE feature stream
        # (reference: deepseek_nextn.py hnorm consumes the target's
        # pre-norm residual); the spec worker applies final_norm itself
        # for the verify logits.
        return x, new_kv
    normed = rms_norm(x, params["final_norm"], eps)
    if record_experts:
        # dense prefix layers contribute zero counts
        full = jnp.concatenate(
            [jnp.zeros((Kd, cfg.num_experts), jnp.int32), counts], axis=0
        )
        return normed, new_kv, full
    return normed, new_kv


def forward_features(params, cfg, meta, kv_cache, attn_backend):
    """PRE-final-norm hidden for speculative feature conditioning."""
    return forward(
        params, cfg, meta, kv_cache, attn_backend, return_features=True
    )


def compute_last_logits(
    params: dict, hidden: jax.Array, meta: ForwardMeta, cfg=None
):
    idx = jnp.maximum(meta.extend_lens - 1, 0)
    last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    return jnp.einsum(
        "bh,hv->bv", last, params["lm_head"], preferred_element_type=jnp.float32
    )
