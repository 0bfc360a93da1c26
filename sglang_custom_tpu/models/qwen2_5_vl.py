"""Qwen2.5-VL: Qwen2 text trunk + windowed ViT + mrope.

Capability analog of the reference's Qwen2_5_VLForConditionalGeneration
(reference: srt/models/qwen2_5_vl.py) — TPU-first:

- Text path IS models/llama.py (Qwen2 = llama trunk + qkv bias), with
  mrope engaged through ``cfg.mrope_section`` + ``meta.mrope_positions``
  (layers/rotary.py mrope_cos_sin). Decode steps ship equal-channel
  positions as a scalar shift (rope_positions = positions + mrope_delta)
  instead of 3-channel arrays.
- Vision tower: models/vision_qwen.py — dense masked attention under
  lax.scan with host-precomputed window layout, instead of varlen flash
  kernels (reference: layers/attention/vision.py).
- Image features are injected by embedding override, like every VL model
  here (models/llava.py docstring).
"""

from __future__ import annotations

import jax

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models import llama
from sglang_custom_tpu.models.vision_qwen import (
    vision_forward_qwen,
    vision_hf_key_map,
    vision_param_shapes,
)

# text-path delegation (runner calls these generically)
forward = llama.forward
forward_features = llama.forward_features
compute_last_logits = llama.compute_last_logits


def param_shapes(cfg: ModelConfig) -> dict:
    shapes = llama.param_shapes(cfg)
    shapes["vision"] = vision_param_shapes(cfg.vision)
    return shapes


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    sh = llama.param_shardings(cfg, mesh_ctx)
    # ViT is tiny next to the LM — replicate (reference keeps the vision
    # tower unsharded per rank as well).
    rep = mesh_ctx.replicated
    sh["vision"] = jax.tree.map(
        lambda _: rep, vision_param_shapes(cfg.vision)
    )
    return sh


def hf_key_map(cfg: ModelConfig) -> dict:
    base = llama.hf_key_map(cfg)
    m = {}
    # transformers >= 4.52: "model.language_model.*" + "model.visual.*";
    # original Qwen2.5-VL checkpoints: "model.*" + "visual.*".
    for name, entry in base.items():
        m[name] = entry
        if name == "lm_head.weight":
            continue
        assert name.startswith("model.")
        m["model.language_model." + name[len("model."):]] = entry
    m.update(vision_hf_key_map(
        cfg.vision, prefixes=("visual.", "model.visual.")
    ))
    return m


def encode_patches(
    params: dict, patches, hw_pos, wid, full_flags, cfg: ModelConfig,
):
    """Jit-friendly vision encode over one (padded) image: masks are built
    on-device from the per-patch window ids (pads carry wid == -1 and only
    attend among themselves, keeping the softmax finite)."""
    import jax.numpy as jnp

    win_mask = wid[:, None] == wid[None, :]
    valid = wid >= 0
    full_mask = valid[:, None] == valid[None, :]
    return vision_forward_qwen(
        params["vision"], patches, hw_pos, win_mask, full_mask,
        jnp.asarray(full_flags), cfg.vision,
    )
