"""LLaVA-family vision-language model.

Re-design of the reference's llava support (reference: srt/models/llava.py
LlavaLlamaForCausalLM + srt/managers/mm_utils.py embedding injection;
multimodal processors srt/multimodal/processors/llava.py) — not a port:

- The text tower IS models/llama.py (scanned, sharded); llava adds a CLIP
  vision tower (models/vision_clip.py) and the 2-layer multimodal
  projector.
- Image features are injected by **embedding override**: the host marks
  which extend positions are image tokens and ships projected features;
  the device does one ``jnp.where`` over the token-embedding lookup —
  the functional analog of the reference's scatter of image embeddings
  into input_embeds (mm_utils.py general pattern).
- Image placeholder ids inside ``input_ids`` are replaced host-side with
  hash-derived pseudo ids so the radix prefix cache distinguishes
  different images (reference: pad_input_ids image-hash trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models import llama
from sglang_custom_tpu.models.vision_clip import (
    vision_forward,
    vision_hf_key_map,
    vision_param_shapes,
)

# text-path delegation (runner calls these generically)
forward = llama.forward
forward_features = llama.forward_features
compute_last_logits = llama.compute_last_logits


def param_shapes(cfg: ModelConfig) -> dict:
    v = cfg.vision
    H = cfg.hidden_size
    D = v["hidden_size"]

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    shapes = llama.param_shapes(cfg)
    shapes["vision"] = vision_param_shapes(v)
    shapes["mm_projector"] = {
        "linear_1": s(D, H), "linear_1_b": s(H),
        "linear_2": s(H, H), "linear_2_b": s(H),
    }
    return shapes


def param_shardings(cfg: ModelConfig, mesh_ctx) -> dict:
    sh = llama.param_shardings(cfg, mesh_ctx)
    # The vision tower + projector are tiny next to the LM: replicate
    # (the reference likewise keeps the vision tower unsharded per rank).
    rep = mesh_ctx.replicated
    sh["vision"] = jax.tree.map(
        lambda _: rep, vision_param_shapes(cfg.vision)
    )
    sh["mm_projector"] = {
        "linear_1": rep, "linear_1_b": rep,
        "linear_2": rep, "linear_2_b": rep,
    }
    return sh


def hf_key_map(cfg: ModelConfig) -> dict:
    base = llama.hf_key_map(cfg)
    m = {}
    # transformers >= 4.52 stores "model.language_model.*" + top "lm_head.*";
    # original llava checkpoints use "language_model.model.*" +
    # "language_model.lm_head.*". Map every spelling.
    for name, entry in base.items():
        if name == "lm_head.weight":
            m["lm_head.weight"] = entry
            m["language_model.lm_head.weight"] = entry
            continue
        assert name.startswith("model.")
        suffix = name[len("model."):]
        m["model.language_model." + suffix] = entry
        m["language_model.model." + suffix] = entry
    m.update(vision_hf_key_map(
        cfg.vision, prefixes=("model.vision_tower.", "vision_tower.")
    ))
    for pref in ("model.", ""):
        p = pref + "multi_modal_projector."
        m.update({
            p + "linear_1.weight": (("mm_projector", "linear_1"), None, True),
            p + "linear_1.bias": (("mm_projector", "linear_1_b"), None, False),
            p + "linear_2.weight": (("mm_projector", "linear_2"), None, True),
            p + "linear_2.bias": (("mm_projector", "linear_2_b"), None, False),
        })
    return m


def encode_images(params: dict, pixel_values: jax.Array, cfg: ModelConfig):
    """pixel_values [N, 3, S, S] f32 -> projected features [N, tokens, H]
    in fp32 (cast to model dtype at injection)."""
    feats = vision_forward(params["vision"], pixel_values, cfg.vision)
    p = params["mm_projector"]
    h = feats @ p["linear_1"] + p["linear_1_b"]
    act = cfg.vision.get("projector_hidden_act", "gelu")
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.gelu(h, approximate=True)
    return h @ p["linear_2"] + p["linear_2_b"]
