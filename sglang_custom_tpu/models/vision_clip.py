"""CLIP-style ViT vision encoder, TPU-first.

Re-design of the reference's vision tower usage (reference:
srt/models/llava.py builds on HF CLIPVisionModel;
srt/layers/attention/vision.py VisionAttention) — not a port:

- **Patchify-as-matmul**: the patch conv becomes an unfold + one [P*P*3, D]
  matmul on the MXU (no conv op, no NCHW layout juggling).
- **Scanned encoder layers over stacked weights**: one traced layer under
  ``lax.scan``; per-layer hidden states come back as scan ys so the HF
  ``vision_feature_layer`` (hidden_states[-2] for llava) is a static index
  into the stacked ys — no Python-loop hidden-state list.
- Full (non-causal) attention over a few hundred patch tokens: plain
  batched SDPA, fp32 softmax — XLA fuses it; no paged KV needed.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def vision_param_shapes(v: Dict) -> dict:
    """v: normalized vision config dict (see ModelConfig.vision)."""
    D, I, L = v["hidden_size"], v["intermediate_size"], v["num_hidden_layers"]
    P, S = v["patch_size"], v["image_size"]
    num_pos = (S // P) ** 2 + 1  # patches + CLS

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    return {
        # HF layout [D, 3, P, P]; reshaped to a matmul inside the forward
        "patch_embed": s(D, 3, P, P),
        "class_embed": s(D),
        "pos_embed": s(num_pos, D),
        "pre_ln": s(D),
        "pre_ln_b": s(D),
        "layers": {
            "ln1": s(L, D), "ln1_b": s(L, D),
            "q_proj": s(L, D, D), "q_bias": s(L, D),
            "k_proj": s(L, D, D), "k_bias": s(L, D),
            "v_proj": s(L, D, D), "v_bias": s(L, D),
            "out_proj": s(L, D, D), "out_bias": s(L, D),
            "ln2": s(L, D), "ln2_b": s(L, D),
            "fc1": s(L, D, I), "fc1_b": s(L, I),
            "fc2": s(L, I, D), "fc2_b": s(L, D),
        },
    }


def vision_hf_key_map(v: Dict, prefixes=("",)) -> dict:
    """HF CLIPVisionModel tensor names -> (path, layer, transpose), rooted
    under each of ``prefixes`` + 'vision_model.'."""
    m = {}
    for pref in prefixes:
        r = pref + "vision_model."
        m.update({
            r + "embeddings.patch_embedding.weight":
                (("vision", "patch_embed"), None, False),
            r + "embeddings.class_embedding":
                (("vision", "class_embed"), None, False),
            r + "embeddings.position_embedding.weight":
                (("vision", "pos_embed"), None, False),
            # (sic) HF's CLIP uses "pre_layrnorm"
            r + "pre_layrnorm.weight": (("vision", "pre_ln"), None, False),
            r + "pre_layrnorm.bias": (("vision", "pre_ln_b"), None, False),
        })
        for l in range(v["num_hidden_layers"]):
            p = r + f"encoder.layers.{l}."
            m.update({
                p + "layer_norm1.weight": (("vision", "layers", "ln1"), l, False),
                p + "layer_norm1.bias": (("vision", "layers", "ln1_b"), l, False),
                p + "self_attn.q_proj.weight": (("vision", "layers", "q_proj"), l, True),
                p + "self_attn.q_proj.bias": (("vision", "layers", "q_bias"), l, False),
                p + "self_attn.k_proj.weight": (("vision", "layers", "k_proj"), l, True),
                p + "self_attn.k_proj.bias": (("vision", "layers", "k_bias"), l, False),
                p + "self_attn.v_proj.weight": (("vision", "layers", "v_proj"), l, True),
                p + "self_attn.v_proj.bias": (("vision", "layers", "v_bias"), l, False),
                p + "self_attn.out_proj.weight": (("vision", "layers", "out_proj"), l, True),
                p + "self_attn.out_proj.bias": (("vision", "layers", "out_bias"), l, False),
                p + "layer_norm2.weight": (("vision", "layers", "ln2"), l, False),
                p + "layer_norm2.bias": (("vision", "layers", "ln2_b"), l, False),
                p + "mlp.fc1.weight": (("vision", "layers", "fc1"), l, True),
                p + "mlp.fc1.bias": (("vision", "layers", "fc1_b"), l, False),
                p + "mlp.fc2.weight": (("vision", "layers", "fc2"), l, True),
                p + "mlp.fc2.bias": (("vision", "layers", "fc2_b"), l, False),
            })
    return m


def _layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _act(x, kind: str):
    if kind == "quick_gelu":  # CLIP default: x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    if kind in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=kind != "gelu")
    raise ValueError(f"unknown vision activation {kind!r}")


def vision_forward(params: dict, pixel_values: jax.Array, v: Dict) -> jax.Array:
    """pixel_values [N, 3, S, S] f32 (HF CLIP preprocessing layout) ->
    feature tokens [N, tokens, D] at ``vision_feature_layer`` with the
    llava 'default' strategy (CLS dropped) or 'full'."""
    N = pixel_values.shape[0]
    D = v["hidden_size"]
    P, S = v["patch_size"], v["image_size"]
    g = S // P
    eps = v.get("layer_norm_eps", 1e-5)
    heads = v["num_attention_heads"]
    hd = D // heads
    scale = 1.0 / math.sqrt(hd)

    # Unfold [N, 3, S, S] -> [N, g*g, 3*P*P] in (c, py, px) order, matching
    # conv2d(stride=P) semantics, then one MXU matmul.
    x = pixel_values.reshape(N, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * P * P)
    w = params["patch_embed"].reshape(D, 3 * P * P).T
    x = (x @ w).astype(jnp.float32)  # [N, g*g, D]

    cls = jnp.broadcast_to(params["class_embed"], (N, 1, D))
    x = jnp.concatenate([cls, x], axis=1)  # [N, 1+g*g, D]
    x = x + params["pos_embed"][None, : x.shape[1]]
    x = _layer_norm(x, params["pre_ln"], params["pre_ln_b"], eps)

    def layer_fn(x, lp):
        h = _layer_norm(x, lp["ln1"], lp["ln1_b"], eps)
        q = h @ lp["q_proj"] + lp["q_bias"]
        k = h @ lp["k_proj"] + lp["k_bias"]
        vv = h @ lp["v_proj"] + lp["v_bias"]
        T = h.shape[1]
        q = q.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        vv = vv.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", attn, vv)
        o = o.transpose(0, 2, 1, 3).reshape(N, T, D)
        x = x + (o @ lp["out_proj"] + lp["out_bias"])
        h = _layer_norm(x, lp["ln2"], lp["ln2_b"], eps)
        h = _act(h @ lp["fc1"] + lp["fc1_b"], v.get("hidden_act", "quick_gelu"))
        x = x + (h @ lp["fc2"] + lp["fc2_b"])
        return x, x

    _, ys = lax.scan(layer_fn, x, params["layers"])  # ys[k] = after layer k

    fl = v.get("vision_feature_layer", -2)
    L = v["num_hidden_layers"]
    # HF hidden_states = [embeds, after layer 0, ..., after layer L-1];
    # hidden_states[fl] for fl<0 is ys[L + fl]; fl>=1 is ys[fl - 1].
    idx = L + fl if fl < 0 else fl - 1
    feats = ys[idx]
    if v.get("vision_feature_select_strategy", "default") == "default":
        feats = feats[:, 1:]  # drop CLS
    return feats
