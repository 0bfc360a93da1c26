"""Rotary position embeddings.

Analog of the reference's rotary_embedding.py (1504 LoC of RoPE variants,
srt/layers/rotary_embedding.py). We implement the HF Llama convention
(half-split rotate, not interleaved) so HF checkpoints load without
permutation, plus the llama3 frequency-scaling variant.

Cos/sin are computed on the fly from positions in fp32 — on TPU this is a
few VPU transcendentals fused into the surrounding ops, cheaper than an
HBM-resident table gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.config.model_config import ModelConfig


def rope_inv_freq(cfg: ModelConfig) -> np.ndarray:
    """Per-pair inverse frequencies [head_dim/2], with llama3 scaling."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    rs = cfg.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        low_freq_factor = rs["low_freq_factor"]
        high_freq_factor = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        low_wavelen = old_len / low_freq_factor
        high_wavelen = old_len / high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (old_len / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(
            wavelen > low_wavelen,
            scaled,
            np.where(wavelen < high_wavelen, inv_freq, smoothed),
        )
    elif rs and rs.get("rope_type", rs.get("type")) == "linear":
        inv_freq = inv_freq / rs["factor"]
    return inv_freq.astype(np.float32)


def rope_inv_freq_base(head_dim: int, theta: float) -> np.ndarray:
    """Unscaled inverse frequencies for an explicit base (gemma3 local
    layers use rope_local_base_freq with no scaling)."""
    return (
        1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    ).astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [...,] int32 -> (cos, sin) each [..., head_dim/2] fp32."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def mrope_cos_sin(positions3: jnp.ndarray, inv_freq: jnp.ndarray,
                  sections) -> tuple:
    """Multimodal rope (Qwen2-VL family). positions3 [B, 3, T] carries
    (temporal, height, width) position channels; ``sections`` gives how
    many frequency PAIRS take each channel (sums to head_dim/2; reference:
    rotary_embedding.py MRotaryEmbedding + HF apply_multimodal_rotary_
    pos_emb — their full-dim split [*sections, *sections] is the same
    per-pair selection). Text tokens carry equal channels, which makes
    this collapse to standard rope."""
    angles = positions3[..., None].astype(jnp.float32) * inv_freq
    # [B, 3, T, D/2] -> select channel per pair
    chan = np.concatenate([
        np.full((s,), i, np.int32) for i, s in enumerate(sections)
    ])
    oh = jnp.asarray(np.eye(3, dtype=np.float32)[chan].T)  # [3, D/2]
    cos = jnp.einsum("bctp,cp->btp", jnp.cos(angles), oh)
    sin = jnp.einsum("bctp,cp->btp", jnp.sin(angles), oh)
    return cos, sin


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Adjacent-pair (complex) rope convention — deepseek-v2's
    apply_rotary_emb uses torch complex pairs instead of the llama
    half-split. x: [..., heads, head_dim]; cos/sin [..., head_dim/2]."""
    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """HF half-split convention. x: [..., heads, head_dim]; cos/sin broadcast
    over the heads axis ([..., head_dim/2])."""
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out1 = x1 * c - x2 * s
    out2 = x2 * c + x1 * s
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
