"""Incremental detokenization + stop-string handling.

Analog of the reference's DetokenizerManager
(reference: srt/managers/detokenizer_manager.py:68 — per-request
DecodeStatus :57, incremental decode, stop-str trimming :113). In the
single-controller TPU design there is no separate detokenizer process; this
runs on the host thread between device steps (it overlaps with device
compute thanks to async dispatch).

Uses the standard HF incremental scheme: keep a window
``[surr_offset, read_offset)`` already surfaced as text; new text is only
emitted when it no longer ends in a replacement char (incomplete UTF-8).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class DecodeStatus:
    decoded_text: str = ""
    # token index from which we re-decode (context window for the tokenizer)
    surr_offset: int = 0
    # token index up to which text has been surfaced
    read_offset: int = 0


class IncrementalDetokenizer:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def new_status(self) -> DecodeStatus:
        return DecodeStatus()

    def step(
        self,
        status: DecodeStatus,
        output_ids: List[int],
        skip_special_tokens: bool = True,
    ) -> str:
        """Returns newly-surfaced text for the tokens appended since the
        last call; updates status in place."""
        if not output_ids:
            return ""
        surr_text = self.tokenizer.decode(
            output_ids[status.surr_offset : status.read_offset],
            skip_special_tokens=skip_special_tokens,
        )
        full_text = self.tokenizer.decode(
            output_ids[status.surr_offset :],
            skip_special_tokens=skip_special_tokens,
        )
        if full_text.endswith("�"):
            # Incomplete UTF-8 sequence: hold back until more tokens arrive.
            return ""
        new_text = full_text[len(surr_text) :]
        status.decoded_text += new_text
        status.surr_offset = max(status.read_offset - 8, 0)
        status.read_offset = len(output_ids)
        return new_text

    def finalize(
        self,
        status: DecodeStatus,
        output_ids: List[int],
        skip_special_tokens: bool = True,
    ) -> str:
        """Flush any held-back text at end of generation."""
        surr_text = self.tokenizer.decode(
            output_ids[status.surr_offset : status.read_offset],
            skip_special_tokens=skip_special_tokens,
        )
        full_text = self.tokenizer.decode(
            output_ids[status.surr_offset :],
            skip_special_tokens=skip_special_tokens,
        )
        new_text = full_text[len(surr_text) :]
        status.decoded_text += new_text
        status.read_offset = len(output_ids)
        return new_text


def find_stop_str(text: str, stop_strs: List[str]) -> Optional[Tuple[int, str]]:
    """Earliest stop-string hit in text, or None.
    Returns (cut_position, matched_stop)."""
    best = None
    for s in stop_strs:
        if not s:
            continue
        i = text.find(s)
        if i >= 0 and (best is None or i < best[0]):
            best = (i, s)
    return best


def partial_stop_len(text: str, stop_strs: List[str]) -> int:
    """Length of the longest tail of `text` that is a proper prefix of some
    stop string — that many chars must be held back from streaming."""
    held = 0
    for s in stop_strs:
        for k in range(1, len(s)):
            if len(text) >= k and text.endswith(s[:k]):
                held = max(held, k)
    return held
