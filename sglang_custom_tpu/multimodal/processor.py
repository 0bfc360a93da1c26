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
        try:
            from PIL import Image

            img = Image.fromarray(arr.astype(np.uint8))
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
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Replace each image placeholder token with ``num_image_tokens``
    hash-derived pseudo ids (reference: mm_utils pad_input_ids).

    Returns (expanded_ids, [(start, length) per image]). Pseudo ids are
    deterministic in the image content hash, so identical images share
    radix-cache prefixes and different images never collide on them. The
    embedding of a pseudo id is never used — those positions are overridden
    with projected vision features (models/llava.py).
    """
    n = cfg.num_image_tokens
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
