"""LRU cache of projected image embeddings keyed by content hash.

Analog of the reference's multimodal embedding cache
(reference: srt/mem_cache/multimodal_cache.py MultiModalCache — hash ->
embedding tensor with a byte-size budget). Host-side numpy: features are
re-shipped with each prefill batch anyway (embedding override), so caching
device arrays would only pin HBM.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import numpy as np


class MultimodalCache:
    def __init__(self, max_bytes: int = 512 << 20):
        self.max_bytes = max_bytes
        self._d: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._bytes = 0

    def get(self, key: int) -> Optional[np.ndarray]:
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key: int, value: np.ndarray) -> None:
        if key in self._d:
            self._d.move_to_end(key)
            return
        self._d[key] = value
        self._bytes += value.nbytes
        while self._bytes > self.max_bytes and len(self._d) > 1:
            _, old = self._d.popitem(last=False)
            self._bytes -= old.nbytes

    def __len__(self) -> int:
        return len(self._d)
