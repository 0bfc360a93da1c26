"""InternViT vision tower (InternVL family).

Capability analog of the reference's InternVL support
(reference: srt/models/internvl.py InternVisionModel). TPU-first like the
other towers (models/vision_clip.py): stacked layers under ``lax.scan``,
patch conv as one matmul, dense attention over a few hundred patch
tokens. InternViT specifics vs CLIP: learned CLS + absolute position
embeddings, LayerNorm (with bias) pre/post blocks, optional full-embed-dim
RMS qk-norm, per-layer residual ``lambda_1/lambda_2`` layer scales, and a
pixel-shuffle downsample before the multimodal projector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def vision_param_shapes(v: dict) -> dict:
    D = v["hidden_size"]
    L = v["num_hidden_layers"]
    I = v["intermediate_size"]
    P = v["patch_size"]
    S = v["image_size"]
    n_pos = (S // P) ** 2 + 1

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    shapes = {
        "cls_token": s(1, 1, D),
        "pos_embed": s(1, n_pos, D),
        "patch_embed": s(3 * P * P, D),
        "patch_embed_b": s(D),
        "blocks": {
            "ln1": s(L, D), "ln1_b": s(L, D),
            "ln2": s(L, D), "ln2_b": s(L, D),
            "q_w": s(L, D, D), "k_w": s(L, D, D), "v_w": s(L, D, D),
            "proj_w": s(L, D, D), "proj_b": s(L, D),
            "fc1": s(L, D, I), "fc1_b": s(L, I),
            "fc2": s(L, I, D), "fc2_b": s(L, D),
            "lambda1": s(L, D), "lambda2": s(L, D),
        },
    }
    if v.get("attention_bias"):
        shapes["blocks"].update({
            "q_b": s(L, D), "k_b": s(L, D), "v_b": s(L, D),
        })
    if v.get("use_qk_norm"):
        shapes["blocks"].update({"q_norm": s(L, D), "k_norm": s(L, D)})
    return shapes


def vision_hf_key_map(v: dict, prefixes) -> dict:
    m = {}
    for pref in prefixes:
        e = pref + "embeddings."
        m.update({
            e + "cls_token": (("vision", "cls_token"), None, False),
            e + "position_embeddings": (("vision", "pos_embed"), None, False),
            e + "patch_embeddings.projection.weight":
                (("vision", "patch_embed"), None, True),
            e + "patch_embeddings.projection.bias":
                (("vision", "patch_embed_b"), None, False),
        })
        for l in range(v["num_hidden_layers"]):
            b = f"{pref}encoder.layer.{l}."
            bp = ("vision", "blocks")
            m.update({
                b + "layernorm_before.weight": (bp + ("ln1",), l, False),
                b + "layernorm_before.bias": (bp + ("ln1_b",), l, False),
                b + "layernorm_after.weight": (bp + ("ln2",), l, False),
                b + "layernorm_after.bias": (bp + ("ln2_b",), l, False),
                b + "attention.q_proj.weight": (bp + ("q_w",), l, True),
                b + "attention.k_proj.weight": (bp + ("k_w",), l, True),
                b + "attention.v_proj.weight": (bp + ("v_w",), l, True),
                b + "attention.projection_layer.weight":
                    (bp + ("proj_w",), l, True),
                b + "attention.projection_layer.bias":
                    (bp + ("proj_b",), l, False),
                b + "mlp.fc1.weight": (bp + ("fc1",), l, True),
                b + "mlp.fc1.bias": (bp + ("fc1_b",), l, False),
                b + "mlp.fc2.weight": (bp + ("fc2",), l, True),
                b + "mlp.fc2.bias": (bp + ("fc2_b",), l, False),
                b + "lambda_1": (bp + ("lambda1",), l, False),
                b + "lambda_2": (bp + ("lambda2",), l, False),
            })
            if v.get("attention_bias"):
                m.update({
                    b + "attention.q_proj.bias": (bp + ("q_b",), l, False),
                    b + "attention.k_proj.bias": (bp + ("k_b",), l, False),
                    b + "attention.v_proj.bias": (bp + ("v_b",), l, False),
                })
            if v.get("use_qk_norm"):
                m.update({
                    b + "attention.q_norm.weight":
                        (bp + ("q_norm",), l, False),
                    b + "attention.k_norm.weight":
                        (bp + ("k_norm",), l, False),
                })
    return m


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def vision_forward_intern(vp: dict, pixel_values: jax.Array, v: dict):
    """[N, 3, S, S] f32 -> post-encoder hidden [N, 1 + n_patches, D]."""
    D = v["hidden_size"]
    nh = v["num_attention_heads"]
    hd = D // nh
    P = v["patch_size"]
    eps = v.get("layer_norm_eps", 1e-6)
    N, C, S, _ = pixel_values.shape
    g = S // P

    # conv-as-matmul patchify: [N, g*g, C*P*P], (c, ph, pw) flattening
    # matches the Conv2d weight layout
    x = pixel_values.reshape(N, C, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, C * P * P)
    x = x @ vp["patch_embed"] + vp["patch_embed_b"]
    cls = jnp.broadcast_to(vp["cls_token"], (N, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["pos_embed"]

    def block(x, bp):
        h = _ln(x, bp["ln1"], bp["ln1_b"], eps)
        q = h @ bp["q_w"] + (bp["q_b"] if "q_b" in bp else 0.0)
        k = h @ bp["k_w"] + (bp["k_b"] if "k_b" in bp else 0.0)
        val = h @ bp["v_w"] + (bp["v_b"] if "v_b" in bp else 0.0)
        if "q_norm" in bp:
            # full-embed-dim RMS (InternVLVisionRMSNorm(embed_dim))
            q = _rms(q, bp["q_norm"], eps)
            k = _rms(k, bp["k_norm"], eps)
        T = x.shape[1]
        q = q.reshape(N, T, nh, hd) * (hd ** -0.5)
        k = k.reshape(N, T, nh, hd)
        val = val.reshape(N, T, nh, hd)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", attn, val).reshape(N, T, D)
        o = o @ bp["proj_w"] + bp["proj_b"]
        x = x + bp["lambda1"] * o

        h = _ln(x, bp["ln2"], bp["ln2_b"], eps)
        h = jax.nn.gelu(h @ bp["fc1"] + bp["fc1_b"], approximate=False)
        h = h @ bp["fc2"] + bp["fc2_b"]
        return x + bp["lambda2"] * h, None

    x, _ = jax.lax.scan(block, x, vp["blocks"])
    return x  # use_mean_pooling -> final layernorm is identity


def pixel_shuffle_downsample(feats: jax.Array, g: int,
                             scale: float) -> jax.Array:
    """HF InternVLModel.pixel_shuffle semantics: [N, g*g, C] (CLS already
    dropped) -> [N, (g*scale)^2, C/scale^2]."""
    N, _, C = feats.shape
    f = feats.reshape(N, g, g, C)
    # (batch, width, height, channels) per the HF doc
    f = f.reshape(N, g, int(g * scale), int(C / scale))
    f = f.transpose(0, 2, 1, 3)
    f = f.reshape(
        N, int(g * scale), int(g * scale), int(C / (scale * scale))
    )
    f = f.transpose(0, 2, 1, 3)
    return f.reshape(N, int(g * scale) ** 2, int(C / (scale * scale)))
