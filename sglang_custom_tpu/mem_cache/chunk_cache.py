"""No-prefix-sharing cache fallback (reference: srt/mem_cache/chunk_cache.py).

Same lifecycle interface as RadixCache but never shares or retains KV; used
when ``--disable-radix-cache`` is set. match_prefix always misses; finished
requests just hand their pages back to the allocator.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

from sglang_custom_tpu.mem_cache.radix_cache import MatchResult, TreeNode


class ChunkCache:
    def __init__(self, page_size: int, free_fn: Callable[[List[int]], None]):
        self.page_size = page_size
        self.free_fn = free_fn
        self.root = TreeNode()
        self.root.lock_ref = 1

    @property
    def evictable_tokens(self) -> int:
        return 0

    @property
    def protected_tokens(self) -> int:
        return 0

    def total_tokens(self) -> int:
        return 0

    def reset(self) -> None:
        pass

    def match_prefix(self, tokens) -> MatchResult:
        return MatchResult(pages=[], matched_len=0, last_node=self.root)

    def match_len(self, tokens) -> int:
        return 0

    def cache_finished_req(self, tokens, pages, cached_len, last_node) -> None:
        assert cached_len == 0
        self.free_fn(pages)

    def cache_unfinished_req(
        self, tokens, pages, cached_len, last_node
    ) -> Tuple[List[int], int, TreeNode]:
        return list(pages), cached_len, last_node

    def evict(self, num_tokens: int) -> int:
        return 0

    def inc_lock_ref(self, node) -> None:
        pass

    def dec_lock_ref(self, node) -> None:
        pass

    def sanity_check(self) -> None:
        pass
