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


def param_shapes(cfg: ModelConfig) -> dict:
    shapes = _base.param_shapes(cfg)
    n = max(cfg.num_labels, 1)
    shapes["score_head"] = jax.ShapeDtypeStruct(
        (cfg.hidden_size, n), jnp.bfloat16
    )
    return shapes


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    sh = _base.param_shardings(cfg, mesh_ctx)
    sh["score_head"] = mesh_ctx.replicated
    return sh


def hf_key_map(cfg: ModelConfig) -> dict:
    m = _base.hf_key_map(cfg)
    # LlamaForSequenceClassification / Qwen2ForSequenceClassification use
    # `score.weight` [num_labels, H]; reward models use `v_head.weight` or
    # `score.0/2.weight` MLP variants (only the linear form is supported).
    m["score.weight"] = (("score_head",), None, True)
    m["v_head.weight"] = (("score_head",), None, True)
    return m


def pooled_head(params: dict, pooled: jax.Array) -> jax.Array:
    """[B, H] pooled hidden -> [B, num_labels] scores (no normalization —
    reward values are raw logits, reference: qwen2_rm.py forward)."""
    return jnp.matmul(
        pooled.astype(jnp.float32),
        params["score_head"].astype(jnp.float32),
    )
