"""Qwen2.5-VL vision tower (windowed ViT + 2D rope + patch merger).

Capability analog of the reference's Qwen2.5-VL vision encoder
(reference: srt/models/qwen2_5_vl.py Qwen2_5_VisionTransformer +
srt/layers/attention/vision.py VisionAttention) — TPU-first re-design:

- **Stacked blocks under lax.scan** (like models/llama.py): one block is
  traced once; the per-block full-vs-window attention choice
  (``fullatt_block_indexes``) rides the scan xs as a boolean flag that
  selects between two precomputed [N, N] masks — no variable-length
  flash-varlen kernels, no cu_seqlens. At ViT sequence lengths (≤ a few
  thousand patches) dense masked attention is MXU-friendly and XLA fuses
  the mask into the softmax.
- **Host-precomputed layout** (``qwen_vision_layout``): the window
  permutation, per-patch window ids, and (h, w) rope positions are plain
  numpy computed once per image grid — the device sees only dense arrays.
- Patch embedding is one matmul: the HF Conv3d with stride == kernel is
  exactly ``flat_patches @ W.reshape(D, -1).T``.

Weights follow HF Qwen2_5_VisionTransformerPretrainedModel layout
(norm1/norm2 RMS eps 1e-6, fused qkv with bias, SiLU-gated MLP with bias,
merger ln_q + 2-layer GELU MLP).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def vision_param_shapes(v: dict) -> dict:
    D = v["hidden_size"]
    L = v["depth"]
    I = v["intermediate_size"]
    O = v["out_hidden_size"]
    P = v["patch_size"]
    Tp = v.get("temporal_patch_size", 2)
    C = v.get("in_channels", 3)
    M = v.get("spatial_merge_size", 2)
    pdim = C * Tp * P * P

    def s(*shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    return {
        "patch_embed": s(pdim, D),
        "blocks": {
            "norm1": s(L, D),
            "norm2": s(L, D),
            "qkv_w": s(L, D, 3 * D),
            "qkv_b": s(L, 3 * D),
            "proj_w": s(L, D, D),
            "proj_b": s(L, D),
            "gate_w": s(L, D, I),
            "gate_b": s(L, I),
            "up_w": s(L, D, I),
            "up_b": s(L, I),
            "down_w": s(L, I, D),
            "down_b": s(L, D),
        },
        "merger": {
            "ln_q": s(D),
            "fc1": s(M * M * D, M * M * D),
            "fc1_b": s(M * M * D),
            "fc2": s(M * M * D, O),
            "fc2_b": s(O),
        },
    }


def vision_hf_key_map(v: dict, prefixes=("visual.", "model.visual.")) -> dict:
    """HF name -> ((pytree path under "vision"), layer idx, transpose)."""
    m: Dict[str, tuple] = {}
    for pref in prefixes:
        m[pref + "patch_embed.proj.weight"] = (
            ("vision", "patch_embed"), None, True)  # [D, C*T*P*P] -> T
        for l in range(v["depth"]):
            b = f"{pref}blocks.{l}."
            bp = ("vision", "blocks")
            m.update({
                b + "norm1.weight": (bp + ("norm1",), l, False),
                b + "norm2.weight": (bp + ("norm2",), l, False),
                b + "attn.qkv.weight": (bp + ("qkv_w",), l, True),
                b + "attn.qkv.bias": (bp + ("qkv_b",), l, False),
                b + "attn.proj.weight": (bp + ("proj_w",), l, True),
                b + "attn.proj.bias": (bp + ("proj_b",), l, False),
                b + "mlp.gate_proj.weight": (bp + ("gate_w",), l, True),
                b + "mlp.gate_proj.bias": (bp + ("gate_b",), l, False),
                b + "mlp.up_proj.weight": (bp + ("up_w",), l, True),
                b + "mlp.up_proj.bias": (bp + ("up_b",), l, False),
                b + "mlp.down_proj.weight": (bp + ("down_w",), l, True),
                b + "mlp.down_proj.bias": (bp + ("down_b",), l, False),
            })
        mp = ("vision", "merger")
        m.update({
            pref + "merger.ln_q.weight": (mp + ("ln_q",), None, False),
            pref + "merger.mlp.0.weight": (mp + ("fc1",), None, True),
            pref + "merger.mlp.0.bias": (mp + ("fc1_b",), None, False),
            pref + "merger.mlp.2.weight": (mp + ("fc2",), None, True),
            pref + "merger.mlp.2.bias": (mp + ("fc2_b",), None, False),
        })
    return m


# ---------------------------------------------------------------- layout


def qwen_vision_layout(grid_thw: Tuple[int, int, int], v: dict):
    """Host-side per-image layout (reference: get_window_index +
    rot_pos_emb of the HF/SGLang vision tower, recomputed in numpy).

    The processor emits patches in merged-cell raster order (each
    spatial_merge_size^2 group contiguous). Returns, all in WINDOW order:

      perm        [n_merged] merged-cell permutation (original -> window)
      inv_perm    [n_merged] inverse (window -> original)
      wid         [N] per-patch window id
      hw_pos      [N, 2] (h, w) patch positions for the 2D rope
    """
    t, h, w = grid_thw
    M = v.get("spatial_merge_size", 2)
    win = v["window_size"] // M // v["patch_size"]  # merged cells per side
    gh, gw = h // M, w // M
    n_merged = t * gh * gw

    idx = np.arange(n_merged).reshape(t, gh, gw)
    pad_h = (-gh) % win
    pad_w = (-gw) % win
    ip = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-1)
    nh, nw = (gh + pad_h) // win, (gw + pad_w) // win
    ip = ip.reshape(t, nh, win, nw, win).transpose(0, 1, 3, 2, 4)
    ip = ip.reshape(t, nh * nw, win * win)
    # window id per merged cell (in window order), cells cropped of pads
    flat = ip.reshape(-1)
    keep = flat >= 0
    perm = flat[keep]
    widx = np.repeat(
        np.arange(t * nh * nw), win * win
    )[keep]  # window id per merged cell, window order

    inv_perm = np.argsort(perm)

    # per-PATCH (h, w) positions in merged-cell raster order, then permuted
    hpos = (np.arange(h)[:, None] + np.zeros((1, w), int)).reshape(
        gh, M, gw, M).transpose(0, 2, 1, 3).reshape(n_merged // t, M * M)
    wpos = (np.zeros((h, 1), int) + np.arange(w)[None, :]).reshape(
        gh, M, gw, M).transpose(0, 2, 1, 3).reshape(n_merged // t, M * M)
    hpos = np.tile(hpos, (t, 1))
    wpos = np.tile(wpos, (t, 1))
    hw = np.stack([hpos, wpos], axis=-1)        # [n_merged, M*M, 2]
    hw = hw[perm].reshape(-1, 2)                # window order, per patch
    wid = np.repeat(widx, M * M)                # per patch
    return perm, inv_perm, wid.astype(np.int32), hw.astype(np.int32)


# ---------------------------------------------------------------- forward


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps
    )
    return (n * w).astype(x.dtype)


def vision_forward_qwen(
    vp: dict,
    patches: jax.Array,     # [N, C*T*P*P] f32, window order
    hw_pos: jax.Array,      # [N, 2] i32 (h, w), window order
    win_mask: jax.Array,    # [N, N] bool — same-window attention
    full_mask: jax.Array,   # [N, N] bool — same-image attention
    full_flags: jax.Array,  # [L] bool — per block: full or windowed
    v: dict,
) -> jax.Array:
    """-> merged features [N / merge^2, out_hidden_size] f32, window order
    (caller applies inv_perm)."""
    D = v["hidden_size"]
    nh = v["num_heads"]
    hd = D // nh
    M = v.get("spatial_merge_size", 2)
    theta = 10000.0

    x = patches @ vp["patch_embed"]             # [N, D]

    # 2D rope: head_dim/4 freqs each for the h and w coordinates
    # (reference: Qwen2_5_VisionRotaryEmbedding + rot_pos_emb concat)
    inv_freq = 1.0 / (
        theta ** (np.arange(0, hd // 2, 2, dtype=np.float64) / (hd // 2))
    )
    inv_freq = jnp.asarray(inv_freq.astype(np.float32))
    ang_h = hw_pos[:, 0:1].astype(jnp.float32) * inv_freq  # [N, hd/4]
    ang_w = hw_pos[:, 1:2].astype(jnp.float32) * inv_freq
    ang = jnp.concatenate([ang_h, ang_w], axis=-1)          # [N, hd/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope(q):  # [N, nh, hd], half-split convention
        q1, q2 = q[..., : hd // 2], q[..., hd // 2:]
        c, s = cos[:, None, :], sin[:, None, :]
        return jnp.concatenate(
            [q1 * c - q2 * s, q2 * c + q1 * s], axis=-1
        )

    neg = jnp.asarray(-1e9, jnp.float32)

    def block(x, xs):
        bp, is_full = xs
        h = _rms(x, bp["norm1"])
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]
        q, k, val = jnp.split(qkv, 3, axis=-1)
        N = x.shape[0]
        q = rope(q.reshape(N, nh, hd)) * (hd ** -0.5)
        k = rope(k.reshape(N, nh, hd))
        val = val.reshape(N, nh, hd)
        logits = jnp.einsum("qhd,khd->hqk", q, k)
        mask = jnp.where(is_full, full_mask, win_mask)
        logits = jnp.where(mask[None], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", attn, val).reshape(N, D)
        x = x + (o @ bp["proj_w"] + bp["proj_b"])

        h = _rms(x, bp["norm2"])
        g = h @ bp["gate_w"] + bp["gate_b"]
        u = h @ bp["up_w"] + bp["up_b"]
        x = x + (jax.nn.silu(g) * u) @ bp["down_w"] + bp["down_b"]
        return x, None

    x, _ = jax.lax.scan(block, x, (vp["blocks"], full_flags))

    # merger: RMS per patch, then merge^2 groups -> 2-layer GELU MLP
    mg = vp["merger"]
    x = _rms(x, mg["ln_q"])
    x = x.reshape(-1, M * M * D)
    x = jax.nn.gelu(x @ mg["fc1"] + mg["fc1_b"], approximate=False)
    return x @ mg["fc2"] + mg["fc2_b"]


def full_flags(v: dict) -> np.ndarray:
    f = np.zeros((v["depth"],), bool)
    f[list(v.get("fullatt_block_indexes", []))] = True
    return f


def masks_for(wid: np.ndarray, img_id: np.ndarray, n_pad: int):
    """Dense [Np, Np] attention masks. Padded rows attend to themselves
    only (keeps the softmax finite); real rows never attend to pads."""
    N = wid.shape[0]
    Np = N + n_pad
    wm = np.zeros((Np, Np), bool)
    fm = np.zeros((Np, Np), bool)
    wm[:N, :N] = wid[:, None] == wid[None, :]
    fm[:N, :N] = img_id[:, None] == img_id[None, :]
    d = np.arange(N, Np)
    wm[d, d] = True
    fm[d, d] = True
    return wm, fm
