"""Gemma 2 / Gemma 3 (text) causal LM, TPU-first.

Re-design of the reference's Gemma models (reference: srt/models/gemma2.py,
gemma3_causal.py — torch nn.Module stacks), built in the same scanned-layer
style as models/llama.py:

- Per-layer *sliding window* enters the ``lax.scan`` as an xs value
  ([L] int32, FULL_WINDOW on global layers) and flows into the attention
  kernel as a traced scalar — one compiled program covers the hybrid
  local/global layout (the reference keeps a separate SWA KV pool,
  mem_cache/memory_pool.py:471; here the window is a kernel mask bound +
  DMA skip, so the paged pool stays uniform).
- Gemma3's dual RoPE (local theta 10k / global theta 1M with linear
  scaling) precomputes both cos/sin sets outside the scan and selects per
  layer with ``jnp.where`` — no branching inside the traced body.
- Zero-centered RMS norms ((1+w) convention) are folded into the weights
  at load time (postprocess_weights), so the runtime norm is the shared
  rms_norm.
- Gemma2 attention/final logit soft-capping are static kernel params.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.layers.norms import rms_norm
from sglang_custom_tpu.layers.rotary import (
    apply_rope,
    rope_cos_sin,
    rope_inv_freq,
    rope_inv_freq_base,
)
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta
from sglang_custom_tpu.models.llama import mm
from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS

NORM_KEYS = (
    "attn_norm", "post_attn_norm", "pre_ffn_norm", "post_ffn_norm",
    "q_norm", "k_norm",
)


def param_shapes(cfg: ModelConfig) -> dict:
    L, H, D = cfg.num_layers, cfg.hidden_size, cfg.head_dim
    Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
    V = cfg.vocab_size

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.bfloat16)

    layers = {
        "attn_norm": s(L, H),
        "q_proj": s(L, H, Hq * D),
        "k_proj": s(L, H, Hkv * D),
        "v_proj": s(L, H, Hkv * D),
        "o_proj": s(L, Hq * D, H),
        "post_attn_norm": s(L, H),
        "pre_ffn_norm": s(L, H),
        "gate_proj": s(L, H, I),
        "up_proj": s(L, H, I),
        "down_proj": s(L, I, H),
        "post_ffn_norm": s(L, H),
    }
    if cfg.qk_norm:  # gemma3
        layers["q_norm"] = s(L, D)
        layers["k_norm"] = s(L, D)
    return {
        "embed": s(V, H),
        "layers": layers,
        "final_norm": s(H),
        "lm_head": s(H, V),
    }


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    tp = mesh_ctx.tp_size
    t = TENSOR_AXIS
    sh = mesh_ctx.sharding

    def div(n):
        return n % tp == 0

    q_col = sh(None, None, t) if div(cfg.num_q_heads * cfg.head_dim) else sh()
    kv_col = sh(None, None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
    mlp_col = sh(None, None, t) if div(cfg.intermediate_size) else sh()
    layers = {
        "attn_norm": sh(),
        "q_proj": q_col,
        "k_proj": kv_col,
        "v_proj": kv_col,
        "o_proj": sh(None, t, None) if div(cfg.num_q_heads * cfg.head_dim) else sh(),
        "post_attn_norm": sh(),
        "pre_ffn_norm": sh(),
        "gate_proj": mlp_col,
        "up_proj": mlp_col,
        "down_proj": sh(None, t, None) if div(cfg.intermediate_size) else sh(),
        "post_ffn_norm": sh(),
    }
    if cfg.qk_norm:
        layers["q_norm"] = sh()
        layers["k_norm"] = sh()
    return {
        "embed": sh(t, None) if div(cfg.vocab_size) else sh(),
        "layers": layers,
        "final_norm": sh(),
        "lm_head": sh(None, t) if div(cfg.vocab_size) else sh(),
    }


def hf_key_map(cfg: ModelConfig) -> dict:
    """Covers Gemma2ForCausalLM / Gemma3ForCausalLM names, plus the
    ``language_model.``-prefixed names of Gemma3ForConditionalGeneration
    checkpoints (text tower only)."""
    m = {}

    def put(hf, path, idx, transpose):
        m[hf] = (path, idx, transpose)
        m["language_model." + hf] = (path, idx, transpose)

    put("model.embed_tokens.weight", ("embed",), None, False)
    put("model.norm.weight", ("final_norm",), None, False)
    put("lm_head.weight", ("lm_head",), None, True)
    for l in range(cfg.num_layers):
        p = f"model.layers.{l}."
        put(p + "input_layernorm.weight", ("layers", "attn_norm"), l, False)
        put(p + "self_attn.q_proj.weight", ("layers", "q_proj"), l, True)
        put(p + "self_attn.k_proj.weight", ("layers", "k_proj"), l, True)
        put(p + "self_attn.v_proj.weight", ("layers", "v_proj"), l, True)
        put(p + "self_attn.o_proj.weight", ("layers", "o_proj"), l, True)
        put(
            p + "post_attention_layernorm.weight",
            ("layers", "post_attn_norm"), l, False,
        )
        put(
            p + "pre_feedforward_layernorm.weight",
            ("layers", "pre_ffn_norm"), l, False,
        )
        put(
            p + "post_feedforward_layernorm.weight",
            ("layers", "post_ffn_norm"), l, False,
        )
        put(p + "mlp.gate_proj.weight", ("layers", "gate_proj"), l, True)
        put(p + "mlp.up_proj.weight", ("layers", "up_proj"), l, True)
        put(p + "mlp.down_proj.weight", ("layers", "down_proj"), l, True)
        if cfg.qk_norm:
            put(p + "self_attn.q_norm.weight", ("layers", "q_norm"), l, False)
            put(p + "self_attn.k_norm.weight", ("layers", "k_norm"), l, False)
    return m


def postprocess_weights(staging: dict, cfg: ModelConfig) -> None:
    """Fold gemma's zero-centered norm convention (effective = 1 + w) into
    the stored weights so the runtime rms_norm stays the shared one."""
    for key in NORM_KEYS:
        if key in staging["layers"]:
            staging["layers"][key] += 1.0
    staging["final_norm"] += 1.0


def _scale(cfg: ModelConfig) -> float:
    base = cfg.query_pre_attn_scalar or cfg.head_dim
    return 1.0 / math.sqrt(base)


# the scheduler activates dual SWA page tables only for models that
# route them per layer (managers/scheduler.py)
SUPPORTS_SWA_TABLES = True


def forward(
    params: dict,
    cfg: ModelConfig,
    meta: ForwardMeta,
    kv_cache: jax.Array,  # [L, Hkv, P, ps, 2, D]
    attn_backend: Callable,
):
    B, T = meta.token_ids.shape
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    eps = cfg.rms_norm_eps
    scale = _scale(cfg)
    softcap = cfg.attn_logit_softcap

    x = jnp.take(params["embed"], meta.token_ids, axis=0)  # [B, T, H]
    x = x * jnp.asarray(math.sqrt(cfg.hidden_size), dtype=x.dtype)

    windows = jnp.asarray(cfg.layer_windows(), jnp.int32)  # [L]
    # Global rope (rope_theta + scaling) and, for gemma3, local rope.
    cos_g, sin_g = rope_cos_sin(meta.positions, jnp.asarray(rope_inv_freq(cfg)))
    if cfg.rope_local_theta:
        cos_l, sin_l = rope_cos_sin(
            meta.positions,
            jnp.asarray(rope_inv_freq_base(D, cfg.rope_local_theta)),
        )
        is_local = windows < ModelConfig.FULL_WINDOW  # [L]
    else:
        cos_l = sin_l = None

    def layer_fn(carry, xs):
        x, kv = carry
        if cfg.rope_local_theta:
            lp, li, win, local = xs
            cos = jnp.where(local, cos_l, cos_g)
            sin = jnp.where(local, sin_l, sin_g)
        else:
            lp, li, win = xs
            cos, sin = cos_g, sin_g
        if meta.page_table_swa is not None:
            # SWA dual tables (mem_cache/swa_radix_cache.py): sliding
            # layers read/write their own page table; the kernel itself
            # is unchanged (reference: SWAKVPool per-layer pool split)
            is_loc = win < ModelConfig.FULL_WINDOW
            lmeta = meta.replace(
                page_table=jnp.where(
                    is_loc, meta.page_table_swa, meta.page_table
                )
            )
        else:
            lmeta = meta
        h = rms_norm(x, lp["attn_norm"], eps)
        q = mm(h, lp["q_proj"]).reshape(B, T, Hq, D)
        k = mm(h, lp["k_proj"]).reshape(B, T, Hkv, D)
        v = mm(h, lp["v_proj"]).reshape(B, T, Hkv, D)
        if "q_norm" in lp:  # gemma3 per-head norms before rope
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn_out, kv = attn_backend(
            q, k, v, kv, li, lmeta, scale, window=win, softcap=softcap
        )
        attn_out = mm(attn_out.reshape(B, T, Hq * D), lp["o_proj"])
        x = x + rms_norm(attn_out, lp["post_attn_norm"], eps)

        h = rms_norm(x, lp["pre_ffn_norm"], eps)
        gate = mm(h, lp["gate_proj"])
        up = mm(h, lp["up_proj"])
        act = jax.nn.gelu(gate, approximate=True) if cfg.hidden_act == "gelu_tanh" else jax.nn.silu(gate)
        h = mm(act * up, lp["down_proj"])
        x = x + rms_norm(h, lp["post_ffn_norm"], eps)
        return (x, kv), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    if cfg.rope_local_theta:
        xs = (params["layers"], layer_ids, windows, is_local)
    else:
        xs = (params["layers"], layer_ids, windows)
    (x, new_kv), _ = lax.scan(layer_fn, (x, kv_cache), xs)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps), new_kv


def compute_last_logits(
    params: dict, hidden: jax.Array, meta: ForwardMeta, cfg=None
):
    idx = jnp.maximum(meta.extend_lens - 1, 0)  # [B]
    last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    logits = jnp.einsum(
        "bh,hv->bv", last, params["lm_head"], preferred_element_type=jnp.float32
    )
    if cfg is not None and cfg.final_logit_softcap:
        # gemma2 final-logit soft cap (reference: srt/models/gemma2.py
        # final_logit_softcapping in the LogitsProcessor path)
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap
        )
    return logits
