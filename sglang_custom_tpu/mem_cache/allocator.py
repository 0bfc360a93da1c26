"""Host-side KV page allocator.

TPU-native re-design of the reference's allocator
(reference: srt/mem_cache/allocator.py — TokenToKVPoolAllocator /
PagedTokenToKVPoolAllocator with triton alloc kernels). On TPU the
allocation tables live on the *host* as numpy (the scheduler is a
single-controller loop, SURVEY.md §7), and only the resulting page tables
are shipped to the device each step — so allocation is a plain free-list,
no device kernels needed.

Page 0 is reserved as the *garbage page*: padded positions in a batch write
their KV there, which keeps the jitted step free of data-dependent control
flow.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

GARBAGE_PAGE = 0


class PageAllocator:
    """Free-list allocator over a fixed pool of KV pages."""

    def __init__(self, num_pages: int, page_size: int):
        assert num_pages >= 2, "need at least one usable page besides the garbage page"
        self.num_pages = num_pages
        self.page_size = page_size
        # Page 0 reserved; stack of free page ids.
        self._free = list(range(num_pages - 1, 0, -1))

    @property
    def available_pages(self) -> int:
        return len(self._free)

    @property
    def available_tokens(self) -> int:
        return len(self._free) * self.page_size

    def alloc(self, n_pages: int) -> Optional[List[int]]:
        """Allocate n pages; returns None (and allocates nothing) on pressure."""
        if n_pages > len(self._free):
            return None
        if n_pages == 0:
            return []
        pages = self._free[-n_pages:]
        del self._free[-n_pages:]
        pages.reverse()
        return pages

    def free(self, pages) -> None:
        for p in pages:
            p = int(p)
            assert p != GARBAGE_PAGE, "cannot free the garbage page"
            self._free.append(p)

    def pages_needed(self, num_tokens: int) -> int:
        return (num_tokens + self.page_size - 1) // self.page_size

    def check_leaks(self, expected_in_use: int = 0) -> bool:
        """True iff exactly `expected_in_use` pages are unaccounted for
        (reference analog: scheduler.py:1496 check_memory idle asserts)."""
        return self.num_pages - 1 - len(self._free) == expected_in_use
