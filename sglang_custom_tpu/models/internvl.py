"""InternVL: InternViT tower + pixel shuffle + MLP projector + LLM trunk.

Capability analog of the reference's InternVL support
(reference: srt/models/internvl.py). The text trunk is whatever the
checkpoint nests (Qwen2/Llama — both serve through models/llama.py);
image features inject by embedding override like every VL family here
(models/llava.py docstring). Fixed 448x448 tiles -> 256 tokens per image
(32x32 patches, 0.5 pixel-shuffle downsample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models import llama
from sglang_custom_tpu.models.vision_intern import (
    pixel_shuffle_downsample,
    vision_forward_intern,
    vision_hf_key_map,
    vision_param_shapes,
)

forward = llama.forward
forward_features = llama.forward_features
compute_last_logits = llama.compute_last_logits


def param_shapes(cfg: ModelConfig) -> dict:
    v = cfg.vision
    H = cfg.hidden_size
    D = v["hidden_size"]
    r = int(1 / v.get("downsample_ratio", 0.5)) ** 2

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    shapes = llama.param_shapes(cfg)
    shapes["vision"] = vision_param_shapes(v)
    shapes["mm_projector"] = {
        "ln": s(D * r), "ln_b": s(D * r),
        "linear_1": s(D * r, H), "linear_1_b": s(H),
        "linear_2": s(H, H), "linear_2_b": s(H),
    }
    return shapes


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    sh = llama.param_shardings(cfg, mesh_ctx)
    rep = mesh_ctx.replicated
    sh["vision"] = jax.tree.map(
        lambda _: rep, vision_param_shapes(cfg.vision)
    )
    sh["mm_projector"] = jax.tree.map(
        lambda _: rep, param_shapes(cfg)["mm_projector"]
    )
    return sh


def hf_key_map(cfg: ModelConfig) -> dict:
    base = llama.hf_key_map(cfg)
    m = {}
    # transformers >= 4.52: model.language_model.* / model.vision_tower.*;
    # original InternVL releases: language_model.model.* / vision_model.*
    for name, entry in base.items():
        if name == "lm_head.weight":
            m[name] = entry
            m["language_model.lm_head.weight"] = entry
            continue
        assert name.startswith("model.")
        suffix = name[len("model."):]
        m["model.language_model." + suffix] = entry
        m["language_model.model." + suffix] = entry
    m.update(vision_hf_key_map(
        cfg.vision,
        prefixes=("model.vision_tower.", "vision_tower.", "vision_model."),
    ))
    for pref in ("model.", ""):
        p = pref + "multi_modal_projector."
        mp = ("mm_projector",)
        m.update({
            p + "layer_norm.weight": (mp + ("ln",), None, False),
            p + "layer_norm.bias": (mp + ("ln_b",), None, False),
            p + "linear_1.weight": (mp + ("linear_1",), None, True),
            p + "linear_1.bias": (mp + ("linear_1_b",), None, False),
            p + "linear_2.weight": (mp + ("linear_2",), None, True),
            p + "linear_2.bias": (mp + ("linear_2_b",), None, False),
        })
    return m


def encode_images(params: dict, pixel_values: jax.Array, cfg: ModelConfig):
    """[N, 3, S, S] f32 -> projected features [N, tokens, H] f32."""
    v = cfg.vision
    feats = vision_forward_intern(params["vision"], pixel_values, v)
    g = v["image_size"] // v["patch_size"]
    feats = feats[:, 1:]                     # drop CLS ("default" strategy)
    feats = pixel_shuffle_downsample(
        feats, g, v.get("downsample_ratio", 0.5)
    )
    p = params["mm_projector"]
    eps = v.get("layer_norm_eps", 1e-6)
    x32 = feats.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    h = (x32 - mu) * jax.lax.rsqrt(var + eps) * p["ln"] + p["ln_b"]
    h = jax.nn.gelu(h @ p["linear_1"] + p["linear_1_b"], approximate=False)
    return h @ p["linear_2"] + p["linear_2_b"]
