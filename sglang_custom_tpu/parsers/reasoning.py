"""Reasoning-block parser: split `<think>...</think>` from normal output.

Capability analog of the reference's reasoning parser
(reference: srt/reasoning_parser.py — BaseReasoningFormatDetector with
one-shot `detect_and_parse` and streaming `parse_streaming_increment`,
model registry deepseek-r1/qwen3/kimi). Own design: a single small state
machine handles both one-shot and incremental parsing, with a
partial-tag holdback buffer so streaming never emits half a tag.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class ParseResult:
    normal_text: str = ""
    reasoning_text: str = ""


@dataclass
class _Format:
    start_tag: str
    end_tag: str
    # Models like DeepSeek-R1 open the think block in the chat template, so
    # generation starts *inside* reasoning without emitting the start tag.
    starts_in_reasoning: bool = False


_FORMATS: Dict[str, _Format] = {
    "deepseek-r1": _Format("<think>", "</think>", starts_in_reasoning=True),
    "deepseek-v3": _Format("<think>", "</think>", starts_in_reasoning=False),
    "qwen3": _Format("<think>", "</think>", starts_in_reasoning=False),
    # qwen3-thinking variants always think and omit the opening tag
    "qwen3-thinking": _Format("<think>", "</think>", starts_in_reasoning=True),
    "glm45": _Format("<think>", "</think>", starts_in_reasoning=False),
    "kimi": _Format("◁think▷", "◁/think▷", starts_in_reasoning=False),
}


def _longest_suffix_prefix(text: str, tag: str) -> int:
    """Length of the longest suffix of `text` that is a proper prefix of
    `tag` — the bytes we must hold back in streaming mode."""
    max_k = min(len(text), len(tag) - 1)
    for k in range(max_k, 0, -1):
        if text.endswith(tag[:k]):
            return k
    return 0


class ReasoningParser:
    """Incremental splitter of reasoning vs normal text.

    Usage (streaming)::

        p = ReasoningParser("deepseek-r1")
        res = p.parse_increment(chunk)   # repeatedly
        res.reasoning_text / res.normal_text

    or one-shot ``p.parse(full_text)``.
    """

    def __init__(self, model_type: str = "deepseek-r1",
                 stream_reasoning: bool = True):
        key = model_type.lower()
        if key not in _FORMATS:
            raise ValueError(
                f"unknown reasoning format {model_type!r}; "
                f"known: {sorted(_FORMATS)}"
            )
        self.fmt = _FORMATS[key]
        self.stream_reasoning = stream_reasoning
        self._in_reasoning = self.fmt.starts_in_reasoning
        self._seen_end = False
        self._buf = ""
        self._held_reasoning = ""  # when stream_reasoning=False

    @staticmethod
    def supported_formats():
        return sorted(_FORMATS)

    def parse(self, text: str) -> ParseResult:
        """One-shot parse of a complete generation."""
        fmt = self.fmt
        in_reasoning = self._in_reasoning or text.lstrip().startswith(
            fmt.start_tag
        )
        if not in_reasoning:
            return ParseResult(normal_text=text)
        body = text.replace(fmt.start_tag, "", 1)
        if fmt.end_tag not in body:
            return ParseResult(reasoning_text=body.strip())
        reasoning, normal = body.split(fmt.end_tag, 1)
        return ParseResult(
            normal_text=normal.strip(), reasoning_text=reasoning.strip()
        )

    def parse_increment(self, new_text: str) -> ParseResult:
        """Streaming parse: returns the text that is safe to emit now."""
        fmt = self.fmt
        self._buf += new_text
        out = ParseResult()

        while self._buf:
            if self._seen_end:
                out.normal_text += self._buf
                self._buf = ""
                break
            if not self._in_reasoning:
                idx = self._buf.find(fmt.start_tag)
                if idx >= 0:
                    out.normal_text += self._buf[:idx]
                    self._buf = self._buf[idx + len(fmt.start_tag):]
                    self._in_reasoning = True
                    continue
                hold = _longest_suffix_prefix(self._buf, fmt.start_tag)
                emit = len(self._buf) - hold
                out.normal_text += self._buf[:emit]
                self._buf = self._buf[emit:]
                break
            # inside reasoning
            idx = self._buf.find(fmt.end_tag)
            if idx >= 0:
                chunk = self._buf[:idx]
                self._buf = self._buf[idx + len(fmt.end_tag):]
                self._in_reasoning = False
                self._seen_end = True
                if self.stream_reasoning:
                    out.reasoning_text += chunk
                else:
                    self._held_reasoning += chunk
                    out.reasoning_text += self._held_reasoning
                    self._held_reasoning = ""
                # normal text after the tag loops back around
                continue
            hold = _longest_suffix_prefix(self._buf, fmt.end_tag)
            emit = len(self._buf) - hold
            chunk = self._buf[:emit]
            self._buf = self._buf[emit:]
            if self.stream_reasoning:
                out.reasoning_text += chunk
            else:
                self._held_reasoning += chunk
            break

        out.normal_text = out.normal_text
        return out
