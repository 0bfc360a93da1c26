"""Reward / sequence-classification model family.

Analog of the reference's classification & reward models (reference:
srt/models/llama_classification.py LlamaForClassification,
qwen2_rm.py Qwen2ForRewardModel / Qwen2ForSequenceClassification,
internlm2_reward.py — a causal trunk whose lm_head is replaced by a
small ``score`` head applied to the pooled final hidden state, served
through the embedding path). TPU-first: the trunk is the stacked-scan
llama module unchanged; the score projection applies inside the pooled
embedding step (model_runner._step_embed_impl), so classification shares
every kernel, bucket, and cache with generative serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models import llama as _base

# Trunk delegation: identical layout, forward, and logits path.
forward = _base.forward
compute_last_logits = _base.compute_last_logits
mm = _base.mm


def _is_mlp_head(cfg: ModelConfig) -> bool:
    """Qwen2ForRewardModel's score head is Linear(H,H)+ReLU+Linear(H,n)
    (reference: qwen2_rm.py:44-48), not a single matrix."""
    return cfg.architecture == "Qwen2ForRewardModel"


def param_shapes(cfg: ModelConfig) -> dict:
    shapes = _base.param_shapes(cfg)
    n = max(cfg.num_labels, 1)
    H = cfg.hidden_size
    if _is_mlp_head(cfg):
        shapes["score_w0"] = jax.ShapeDtypeStruct((H, H), jnp.bfloat16)
        shapes["score_b0"] = jax.ShapeDtypeStruct((H,), jnp.bfloat16)
        shapes["score_head"] = jax.ShapeDtypeStruct((H, n), jnp.bfloat16)
        shapes["score_bias"] = jax.ShapeDtypeStruct((n,), jnp.bfloat16)
    else:
        shapes["score_head"] = jax.ShapeDtypeStruct((H, n), jnp.bfloat16)
    return shapes


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    sh = _base.param_shardings(cfg, mesh_ctx)
    sh["score_head"] = mesh_ctx.replicated
    if _is_mlp_head(cfg):
        sh["score_w0"] = mesh_ctx.replicated
        sh["score_b0"] = mesh_ctx.replicated
        sh["score_bias"] = mesh_ctx.replicated
    return sh


def hf_key_map(cfg: ModelConfig) -> dict:
    m = _base.hf_key_map(cfg)
    if _is_mlp_head(cfg):
        # Qwen2ForRewardModel ships an nn.Sequential head: score.0 / score.2
        # (reference: qwen2_rm.py:44-48).
        m["score.0.weight"] = (("score_w0",), None, True)
        m["score.0.bias"] = (("score_b0",), None, False)
        m["score.2.weight"] = (("score_head",), None, True)
        m["score.2.bias"] = (("score_bias",), None, False)
    else:
        # LlamaForSequenceClassification / Qwen2ForSequenceClassification
        # use `score.weight` [num_labels, H]; linear reward models use
        # `v_head.weight`.
        m["score.weight"] = (("score_head",), None, True)
        m["v_head.weight"] = (("score_head",), None, True)
    return m


def pooled_head(params: dict, pooled: jax.Array) -> jax.Array:
    """[B, H] pooled hidden -> [B, num_labels] scores (no normalization —
    reward values are raw logits, reference: qwen2_rm.py forward)."""
    x = pooled.astype(jnp.float32)
    if "score_w0" in params:
        x = jnp.matmul(x, params["score_w0"].astype(jnp.float32))
        x = jax.nn.relu(x + params["score_b0"].astype(jnp.float32))
        return (
            jnp.matmul(x, params["score_head"].astype(jnp.float32))
            + params["score_bias"].astype(jnp.float32)
        )
    return jnp.matmul(x, params["score_head"].astype(jnp.float32))
