"""Per-request sampling parameters.

Analog of the reference's SamplingParams (srt/sampling/sampling_params.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union


@dataclasses.dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1          # -1 = disabled (full vocab)
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    return_logprob: bool = False
    # Teacher-forced logprobs of the *input* tokens from this index on
    # (reference: logprob_start_len; used for choices/score APIs).
    return_input_logprob: bool = False
    logprob_start_len: int = 0
    n: int = 1
    # Constrained decoding (reference: sampling_params regex/json_schema +
    # srt/constrained/*): token-bitmask enforced grammar.
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    # EBNF / CFG grammar (reference: xgrammar_backend.py:148 — arbitrary
    # context-free grammars; constrained/ebnf_engine.py)
    ebnf: Optional[str] = None
    # OpenAI logit_bias: {token_id: bias in [-100, 100]} added to logits
    # before sampling (reference: sampling_batch_info apply_logits_bias).
    logit_bias: Optional[dict] = None
    # Custom logit processor (reference: srt/sampling/
    # custom_logit_processor.py, gated by --enable-custom-logit-processor):
    # a callable ``fn(logits_np [V] f32, req) -> logits_np`` for in-process
    # Engine use, or an importable "module:function" string over HTTP.
    # Routes the request down the host-sampling cold path.
    custom_logit_processor: Optional[object] = None

    def __post_init__(self):
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        self.stop = list(self.stop or [])
        self.stop_token_ids = list(self.stop_token_ids or [])
        if self.temperature < 1e-5:
            # Greedy: normalize so the kernel can branch on temperature == 0.
            self.temperature = 0.0

    @property
    def needs_penalties(self) -> bool:
        """Whether this request requires the penalized sampling step
        (reference: penaltylib orchestrator `is_required`)."""
        return (
            self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
            or self.repetition_penalty != 1.0
            or self.min_new_tokens > 0
            or bool(self.logit_bias)
        )

    def verify(self) -> None:
        assert self.max_new_tokens >= 0
        assert 0 <= self.min_new_tokens
        assert 0.0 <= self.top_p <= 1.0
        assert self.top_k == -1 or self.top_k >= 1
        assert 0.0 <= self.min_p <= 1.0
        assert -2.0 <= self.frequency_penalty <= 2.0
        assert -2.0 <= self.presence_penalty <= 2.0
        assert 0.0 < self.repetition_penalty <= 2.0
