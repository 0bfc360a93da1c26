"""Hierarchical radix cache: device KV + host DRAM offload tier.

Analog of the reference's HiCache (reference: mem_cache/hiradix_cache.py:26
HiRadixCache, memory_pool_host.py host pools, managers/cache_controller.py
transfer engine). TPU-first re-design:

- The radix tree is shared with the device tier (mem_cache/radix_cache.py);
  a node is either *device-resident* (``pages``) or *host-resident*
  (``host_pages`` into a pinned numpy pool). Eviction under HBM pressure
  offloads LRU subtrees to host instead of dropping them (write-back
  policy); a later prefix match uploads them back and the request prefills
  only its novel suffix.
- Transfers are whole-page jax gathers/scatters: one jitted
  donate-aliased scatter per upload keeps the multi-GB pool update
  in place (no full-pool copy), and page-count buckets keep the jit cache
  small. Synchronous v1 — the reference's async prefetch threads
  (cache_controller.py TransferBuffer) are a planned upgrade; transfers
  happen on the scheduler thread between steps.
- Works unchanged for MHA and MLA pools (both are paged on axis 2).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from sglang_custom_tpu.mem_cache.radix_cache import (
    MatchResult,
    RadixCache,
    TreeNode,
)
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

# TreeNode is __slots__; host residency lives in a side table keyed by node
# id to avoid changing the hot base-class layout.


class HostKVPool:
    """Pinned host DRAM page pool mirroring the device pool's page layout.

    Analog of the reference's HostKVCache (mem_cache/memory_pool_host.py).
    Layout [host_pages, L, Hkv, ps, 2D] — page-major so one memcpy moves
    a page (the trailing dim is the device pool's K|V-folded feature dim).
    """

    def __init__(self, num_pages: int, device_kv_shape, dtype):
        L, Hkv, _, ps, F = device_kv_shape
        self.num_pages = num_pages
        self.data = np.zeros((num_pages, L, Hkv, ps, F), dtype)
        self._free = list(range(num_pages - 1, -1, -1))

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        return [self._free.pop() for _ in range(n)]

    def free(self, slots: List[int]) -> None:
        self._free.extend(slots)


def _pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class HiRadixCache(RadixCache):
    def __init__(
        self,
        page_size: int,
        free_fn,
        alloc_fn,
        kv_pool,
        host_pages: int,
    ):
        super().__init__(page_size, free_fn)
        self.alloc_fn = alloc_fn        # PageAllocator.alloc
        self.kv_pool = kv_pool          # KVCachePool (kv re-bound per step)
        import jax
        import jax.numpy as jnp

        np_dtype = np.dtype(jnp.dtype(kv_pool.kv.dtype).name)
        self.host_pool = HostKVPool(host_pages, kv_pool.kv.shape, np_dtype)
        self._host_pages_of = {}        # node id -> host slot list
        # stats (reference: HiCache hit/write metrics)
        self.offloaded_tokens = 0
        self.loaded_tokens = 0

        @jax.jit
        def _gather(kv, pages):
            return kv[:, :, pages]

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _scatter(kv, pages, data):
            return kv.at[:, :, pages].set(data)

        self._gather_jit = _gather
        self._scatter_jit = _scatter

    # ------------------------------------------------------------- residency

    def _is_host(self, node: TreeNode) -> bool:
        return node.id in self._host_pages_of

    def _fetch_pages(self, pages: List[int]) -> np.ndarray:
        """Device pages -> host array [n, L, Hkv, ps, 2, D]."""
        import jax.numpy as jnp

        n = len(pages)
        padded = list(pages) + [0] * (_pow2(n) - n)
        out = self._gather_jit(self.kv_pool.kv, jnp.asarray(padded, jnp.int32))
        return np.moveaxis(np.asarray(out), 2, 0)[:n]

    def _upload_pages(self, pages: List[int], data: np.ndarray) -> None:
        """Host array [n, ...] -> device pages (in-place via donation)."""
        import jax.numpy as jnp

        n = len(pages)
        np2 = _pow2(n)
        # pad page ids with the garbage page 0 (writes there are harmless)
        padded = list(pages) + [0] * (np2 - n)
        if np2 != n:
            pad = np.zeros((np2 - n,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, pad], axis=0)
        dev = np.moveaxis(data, 0, 2)
        self.kv_pool.kv = self._scatter_jit(
            self.kv_pool.kv, jnp.asarray(padded, jnp.int32), jnp.asarray(dev)
        )

    # --------------------------------------------------------------- offload

    def _offload_node(self, node: TreeNode) -> bool:
        slots = self.host_pool.alloc(len(node.pages))
        if slots is None:
            self._reclaim_host(len(node.pages))
            slots = self.host_pool.alloc(len(node.pages))
        if slots is None:
            return False
        self.host_pool.data[slots] = self._fetch_pages(node.pages)
        self._host_pages_of[node.id] = slots
        self.free_fn(node.pages)
        node.pages = []
        self.offloaded_tokens += len(node.key)
        return True

    def _load_node(self, node: TreeNode) -> bool:
        slots = self._host_pages_of[node.id]
        dev = self.alloc_fn(len(slots))
        if dev is None:
            return False
        self._upload_pages(dev, self.host_pool.data[slots])
        node.pages = dev
        self.host_pool.free(slots)
        del self._host_pages_of[node.id]
        self.loaded_tokens += len(node.key)
        return True

    def _reclaim_host(self, need: int) -> None:
        """Drop LRU childless host-resident nodes to make room."""
        victims = sorted(
            (
                n for n in self._iter_nodes()
                if self._is_host(n) and not n.children and n.lock_ref == 0
            ),
            key=lambda n: n.last_access_time,
        )
        for v in victims:
            if self.host_pool.available >= need:
                return
            self._drop_subtree(v)

    def _drop_subtree(self, node: TreeNode) -> None:
        """Remove node + descendants, freeing both tiers."""
        stack = [node]
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n.pages:
                self.free_fn(n.pages)
            slots = self._host_pages_of.pop(n.id, None)
            if slots is not None:
                self.host_pool.free(slots)
            if n.lock_ref == 0:
                self._evictable_tokens -= len(n.key)
            else:  # cannot happen for eviction victims; defensive
                self._protected_tokens -= len(n.key)
        node.parent.children.pop(self._edge_key(node), None)

    # ----------------------------------------------------------- public API

    def match_prefix(self, tokens: List[int]) -> MatchResult:
        """Base match, then ensure the matched path is device-resident by
        uploading host-tier nodes; the match truncates at the first node
        that can't be loaded (no free device pages)."""
        m = super().match_prefix(tokens)
        path = []
        n = m.last_node
        while n is not self.root:
            path.append(n)
            n = n.parent
        path.reverse()
        pages: List[int] = []
        matched = 0
        last = self.root
        for node in path:
            if self._is_host(node) and not self._try_load(node, last):
                break
            pages.extend(node.pages)
            matched += len(node.key)
            last = node
        return MatchResult(pages=pages, matched_len=matched, last_node=last)

    def _try_load(self, node: TreeNode, loaded_prefix: TreeNode) -> bool:
        """Load a host node, making room by offloading LRU device subtrees
        if the allocator is dry. The already-loaded prefix is lock-ref'd so
        eviction can't free pages the caller has collected. (Deeper path
        nodes are necessarily host-resident — offload keeps device pages
        only above host pages — so they can't be eviction victims.)"""
        if self._load_node(node):
            return True
        need = len(self._host_pages_of[node.id]) * self.page_size
        if loaded_prefix is not self.root:
            self.inc_lock_ref(loaded_prefix)
        try:
            self.evict(need)
        finally:
            if loaded_prefix is not self.root:
                self.dec_lock_ref(loaded_prefix)
        return self._load_node(node)

    def evict(self, num_tokens: int) -> int:
        """Free >= num_tokens of device pages by *offloading* LRU device
        subtrees to host (write-back); hard-drop only when the host tier is
        full too (reference: hiradix_cache.py write-back eviction)."""
        evicted = 0
        while evicted < num_tokens:
            cands = self._device_frontier()
            if not cands:
                break
            node = min(cands, key=lambda n: n.last_access_time)
            freed = len(node.key)
            if not self._offload_node(node):
                # host tier full: hard-drop (with any host-resident subtree
                # below it, whose prefix continuity it carried)
                self._drop_subtree(node)
            evicted += freed
        return evicted

    def _device_frontier(self) -> List[TreeNode]:
        """Unlocked nodes holding device pages with no device pages below
        (the deepest device tier — safe to push to host)."""
        has_dev_below = {}

        def walk(n: TreeNode) -> bool:
            below = False
            for c in n.children.values():
                below |= walk(c)
            has_dev_below[n.id] = below
            return below or bool(n.pages)

        walk(self.root)
        return [
            n
            for n in self._iter_nodes()
            if n.pages and n.lock_ref == 0 and not has_dev_below[n.id]
        ]

    def insert(self, tokens, pages):
        """Base insert, preceded by a pre-pass that *replaces* any
        host-resident node on the insert path with the request's fresh
        device pages — insert must never hand back a page list with host
        gaps (cache_unfinished_req swaps the request onto tree pages)."""
        ps = self.page_size
        limit = (len(tokens) // ps) * ps
        node = self.root
        pos = 0
        while pos < limit:
            child = node.children.get(self._chunk(tokens, pos))
            if child is None:
                break
            if self._is_host(child):
                self._drop_subtree(child)
                break
            n_match = 0
            for i in range(len(child.key) // ps):
                lo = pos + i * ps
                if lo + ps > limit:
                    break
                if tuple(child.key[i * ps : (i + 1) * ps]) == tuple(
                    tokens[lo : lo + ps]
                ):
                    n_match += 1
                else:
                    break
            if n_match < len(child.key) // ps:
                break
            pos += len(child.key)
            node = child
        return super().insert(tokens, pages)

    def _split_node(self, node: TreeNode, n_pages: int) -> TreeNode:
        """Host slots must split with the edge (base splits device pages)."""
        slots = self._host_pages_of.pop(node.id, None)
        upper = super()._split_node(node, n_pages)
        if slots is not None:
            self._host_pages_of[upper.id] = slots[:n_pages]
            self._host_pages_of[node.id] = slots[n_pages:]
        return upper

    def reset(self) -> None:
        for n in list(self._iter_nodes()):
            slots = self._host_pages_of.pop(n.id, None)
            if slots is not None:
                self.host_pool.free(slots)
        super().reset()

    # ------------------------------------------------------------- debug

    def sanity_check(self) -> None:
        total = 0
        for n in self._iter_nodes():
            assert len(n.key) % self.page_size == 0 and len(n.key) > 0
            if self._is_host(n):
                assert not n.pages
                assert (
                    len(self._host_pages_of[n.id])
                    == len(n.key) // self.page_size
                )
            else:
                assert len(n.pages) == len(n.key) // self.page_size
            total += len(n.key)
        assert total == self._evictable_tokens + self._protected_tokens, (
            total, self._evictable_tokens, self._protected_tokens,
        )

    def host_stats(self) -> dict:
        return {
            "host_pages_total": self.host_pool.num_pages,
            "host_pages_used": self.host_pool.num_pages
            - self.host_pool.available,
            "offloaded_tokens": self.offloaded_tokens,
            "loaded_tokens": self.loaded_tokens,
        }
