"""Synthetic request streams: poisson arrivals, random or dataset prompts.

reference: sglang_test_framework/core/request_generator.py:99
RequestGenerator (poisson arrivals, random/ShareGPT datasets).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterator, List, Optional

import numpy as np


@dataclasses.dataclass
class SyntheticRequest:
    rid: str
    input_ids: List[int]
    max_new_tokens: int
    arrival_offset: float  # seconds after stream start


class RequestGenerator:
    def __init__(
        self,
        request_rate: float = 8.0,     # poisson requests/s; inf = all at once
        num_requests: int = 64,
        input_len: int = 128,
        output_len: int = 64,
        input_len_std: float = 0.0,
        output_len_std: float = 0.0,
        vocab_size: int = 32000,
        dataset_path: Optional[str] = None,
        tokenizer=None,
        seed: int = 0,
    ):
        self.rate = request_rate
        self.n = num_requests
        self.input_len = input_len
        self.output_len = output_len
        self.input_len_std = input_len_std
        self.output_len_std = output_len_std
        self.vocab_size = vocab_size
        self.dataset_path = dataset_path
        self.tokenizer = tokenizer
        self.rng = np.random.RandomState(seed)

    def _lengths(self) -> tuple:
        ilen = max(
            1, int(self.rng.normal(self.input_len, self.input_len_std))
        ) if self.input_len_std else self.input_len
        olen = max(
            1, int(self.rng.normal(self.output_len, self.output_len_std))
        ) if self.output_len_std else self.output_len
        return ilen, olen

    def _dataset_prompts(self) -> List[List[int]]:
        """ShareGPT-format json: [{"conversations": [{"value": ...}]}]
        (reference: request_generator.py dataset mode)."""
        with open(self.dataset_path) as f:
            data = json.load(f)
        prompts = []
        for item in data:
            conv = item.get("conversations") or []
            if conv:
                text = conv[0].get("value", "")
                if text and self.tokenizer is not None:
                    prompts.append(self.tokenizer.encode(text))
        return prompts

    def generate(self) -> Iterator[SyntheticRequest]:
        dataset = self._dataset_prompts() if self.dataset_path else None
        t = 0.0
        for i in range(self.n):
            if np.isfinite(self.rate) and self.rate > 0:
                t += float(self.rng.exponential(1.0 / self.rate))
            ilen, olen = self._lengths()
            if dataset:
                ids = dataset[i % len(dataset)][:ilen]
            else:
                ids = self.rng.randint(
                    1, self.vocab_size, size=ilen
                ).tolist()
            yield SyntheticRequest(
                rid=f"gen-{i}", input_ids=[int(x) for x in ids],
                max_new_tokens=olen, arrival_offset=t,
            )
