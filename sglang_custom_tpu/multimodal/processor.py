"""Host-side image preprocessing + image-token expansion.

Analog of the reference's multimodal processors
(reference: srt/multimodal/processors/llava.py + srt/managers/mm_utils.py
pad_input_ids — image placeholder spans are replaced with hash-derived
pseudo token ids so the radix prefix cache keys on image *content*, and
the processor produces CLIP-normalized pixel tensors).
"""

from __future__ import annotations

import base64
import hashlib
import io
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from sglang_custom_tpu.config.model_config import ModelConfig


def _to_array(image_data) -> Tuple[np.ndarray, bool]:
    """Accepts: np.ndarray HxWx3 uint8, np.ndarray [3,S,S] float
    (pre-processed pixel_values, passed through), file path, raw bytes, or
    base64/data-URI string. Returns (array, is_preprocessed)."""
    if isinstance(image_data, np.ndarray):
        if image_data.dtype in (np.float32, np.float64) and image_data.ndim == 3:
            return image_data.astype(np.float32), True
        return image_data, False
    if isinstance(image_data, (bytes, bytearray)):
        raw = bytes(image_data)
    elif isinstance(image_data, str):
        if image_data.startswith("data:"):
            raw = base64.b64decode(image_data.split(",", 1)[1])
        else:
            try:
                with open(image_data, "rb") as f:
                    raw = f.read()
            except OSError:
                raw = base64.b64decode(image_data)
    else:
        raise ValueError(f"unsupported image_data type {type(image_data)!r}")
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL required to decode image bytes") from e
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    return np.asarray(img), False


class MultimodalProcessor:
    """CLIP-style preprocessing: resize shortest side to S (bicubic),
    center-crop SxS, scale to [0,1], normalize with the model's mean/std,
    emit [3, S, S] float32 (HF CLIPImageProcessor semantics)."""

    def __init__(self, cfg: ModelConfig):
        assert cfg.is_multimodal
        self.cfg = cfg
        v = cfg.vision
        self.size = v["image_size"]
        self.mean = np.asarray(v["image_mean"], np.float32).reshape(3, 1, 1)
        self.std = np.asarray(v["image_std"], np.float32).reshape(3, 1, 1)

    def preprocess(self, image_data) -> Tuple[np.ndarray, int]:
        """-> (pixel_values [3, S, S] f32, content_hash)."""
        arr, done = _to_array(image_data)
        h = int.from_bytes(
            hashlib.sha256(np.ascontiguousarray(arr).tobytes()).digest()[:8],
            "little",
        )
        if done:
            assert arr.shape == (3, self.size, self.size), (
                f"pre-processed pixel_values must be [3,{self.size},{self.size}]"
            )
            return arr, h
        S = self.size
        stretch = self.cfg.vision.get("resize") == "stretch"
        try:
            from PIL import Image

            img = Image.fromarray(arr.astype(np.uint8))
            if stretch:
                # InternVL-style: resize directly to SxS (no crop)
                img = img.resize((S, S), Image.BICUBIC)
            else:
                w0, h0 = img.size
                scale = S / min(w0, h0)
                img = img.resize(
                    (max(S, round(w0 * scale)), max(S, round(h0 * scale))),
                    Image.BICUBIC,
                )
                w1, h1 = img.size
                left, top = (w1 - S) // 2, (h1 - S) // 2
                img = img.crop((left, top, left + S, top + S))
            px = np.asarray(img, np.float32)
        except ImportError:
            # numpy fallback: nearest-neighbor resize (tests / PIL-less envs)
            h0, w0 = arr.shape[:2]
            ys = (np.arange(S) * h0 // S).clip(0, h0 - 1)
            xs = (np.arange(S) * w0 // S).clip(0, w0 - 1)
            px = arr[np.ix_(ys, xs)].astype(np.float32)
        px = px.transpose(2, 0, 1) / 255.0  # [3, S, S]
        return (px - self.mean) / self.std, h


def expand_image_tokens(
    input_ids: Sequence[int],
    image_hashes: Sequence[int],
    cfg: ModelConfig,
    counts: Optional[Sequence[int]] = None,
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Replace each image placeholder token with per-image token counts of
    hash-derived pseudo ids (reference: mm_utils pad_input_ids).

    ``counts[i]`` tokens for image i (default: the model's fixed
    ``num_image_tokens`` — dynamic-resolution models pass explicit counts).
    Returns (expanded_ids, [(start, length) per image]). Pseudo ids are
    deterministic in the image content hash, so identical images share
    radix-cache prefixes and different images never collide on them. The
    embedding of a pseudo id is never used — those positions are overridden
    with projected vision features (models/llava.py).
    """
    out: List[int] = []
    spans: List[Tuple[int, int]] = []
    img_i = 0
    for tok in input_ids:
        if tok == cfg.image_token_id:
            if img_i >= len(image_hashes):
                raise ValueError(
                    f"prompt has more image tokens than images ({len(image_hashes)})"
                )
            h = image_hashes[img_i]
            n = counts[img_i] if counts is not None else cfg.num_image_tokens
            spans.append((len(out), n))
            rng = np.random.Generator(np.random.SFC64(h & 0xFFFFFFFFFFFF))
            out.extend(
                int(x) for x in rng.integers(0, cfg.vocab_size, size=n)
            )
            img_i += 1
        else:
            out.append(int(tok))
    if img_i != len(image_hashes):
        raise ValueError(
            f"{len(image_hashes)} images given but prompt has {img_i} "
            "image tokens"
        )
    return out, spans


# -------------------------------------------- Qwen2-VL dynamic resolution


def smart_resize(
    height: int, width: int, factor: int = 28,
    min_pixels: int = 56 * 56, max_pixels: int = 12845056,
) -> Tuple[int, int]:
    """Qwen2-VL native-resolution policy (reference behavior of the HF
    Qwen2VLImageProcessor): round dims to multiples of ``factor`` while
    keeping total pixels inside [min_pixels, max_pixels]."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class QwenVLProcessor:
    """Native-resolution preprocessing for the Qwen2.5-VL vision tower:
    smart-resize, normalize, extract flattened conv patches in merged-cell
    raster order, and report the (t, h, w) patch grid."""

    def __init__(self, cfg: ModelConfig):
        v = cfg.vision
        self.cfg = cfg
        self.v = v
        self.patch = v["patch_size"]
        self.merge = v.get("spatial_merge_size", 2)
        self.temporal = v.get("temporal_patch_size", 2)
        self.factor = self.patch * self.merge
        self.mean = np.asarray(v["image_mean"], np.float32).reshape(3, 1, 1)
        self.std = np.asarray(v["image_std"], np.float32).reshape(3, 1, 1)

    def preprocess(self, image_data):
        """-> (flat_patches [N, C*T*P*P] f32, grid (t, h, w), content_hash)."""
        arr, done = _to_array(image_data)
        h = int.from_bytes(
            hashlib.sha256(np.ascontiguousarray(arr).tobytes()).digest()[:8],
            "little",
        )
        if done:
            raise ValueError(
                "qwen2.5-vl takes raw images (dynamic resolution), not "
                "fixed-size pixel_values"
            )
        H0, W0 = arr.shape[:2]
        Hs, Ws = smart_resize(
            H0, W0, self.factor,
            self.v.get("min_pixels", 56 * 56),
            self.v.get("max_pixels", 12845056),
        )
        try:
            from PIL import Image

            img = Image.fromarray(arr.astype(np.uint8)).resize(
                (Ws, Hs), Image.BICUBIC
            )
            px = np.asarray(img, np.float32)
        except ImportError:  # nearest-neighbor fallback for PIL-less envs
            ys = (np.arange(Hs) * H0 // Hs).clip(0, H0 - 1)
            xs = (np.arange(Ws) * W0 // Ws).clip(0, W0 - 1)
            px = arr[np.ix_(ys, xs)].astype(np.float32)
        px = px.transpose(2, 0, 1) / 255.0            # [3, Hs, Ws]
        px = (px - self.mean) / self.std
        flat, grid = self.patchify(px)
        return flat, grid, h

    def patchify(self, px: np.ndarray):
        """[3, H, W] normalized pixels -> (flat patches, grid). Layout
        matches the HF processor: merged-cell raster order, each patch
        vector flattened (C, T, Ph, Pw) to feed the Conv3d-as-matmul."""
        C, H, W = px.shape
        P, M, T = self.patch, self.merge, self.temporal
        gh, gw = H // P, W // P
        t = 1
        frames = np.broadcast_to(px, (T, C, H, W))    # still image: repeat
        pt = frames.reshape(t, T, C, gh // M, M, P, gw // M, M, P)
        pt = pt.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = pt.reshape(t * gh * gw, C * T * P * P)
        return np.ascontiguousarray(flat, np.float32), (t, gh, gw)


def qwen_mrope_positions(
    seq_len: int,
    spans: Sequence[Tuple[int, int]],
    grids: Sequence[Tuple[int, int, int]],
    merge: int,
) -> Tuple[np.ndarray, int]:
    """3-channel mrope positions for an EXPANDED prompt (reference: HF
    get_rope_index / forward_batch_info.py:484 mrope_positions). Text runs
    carry equal channels; an image span of patch grid (t, h, w) carries
    (temporal, row, col) offsets from the running counter, which then
    advances by max(t, h/merge, w/merge). Returns (pos [3, L] i32, delta)
    with delta = final_counter - L (decode positions = index + delta)."""
    pos = np.zeros((3, seq_len), np.int64)
    st = 0   # running position counter
    idx = 0  # next sequence index
    for (start, n), (t, h, w) in zip(spans, grids):
        ntext = start - idx
        pos[:, idx:start] = st + np.arange(ntext)
        st += ntext
        idx = start
        gh, gw = h // merge, w // merge
        assert n == t * gh * gw, (n, t, gh, gw)
        pos[0, idx:idx + n] = st + np.repeat(np.arange(t), gh * gw)
        pos[1, idx:idx + n] = st + np.tile(
            np.repeat(np.arange(gh), gw), t
        )
        pos[2, idx:idx + n] = st + np.tile(np.arange(gw), t * gh)
        st += max(t, gh, gw)
        idx += n
    pos[:, idx:] = st + np.arange(seq_len - idx)
    st += seq_len - idx
    return pos.astype(np.int32), int(st - seq_len)


def create_processor(cfg: ModelConfig):
    """Per-family processor dispatch (reference: srt/multimodal/processors
    registry keyed by model family)."""
    if cfg.vision and cfg.vision.get("type") == "qwen2_5_vl":
        return QwenVLProcessor(cfg)
    return MultimodalProcessor(cfg)
