"""RadixAttention prefix cache.

Re-design of the reference's radix tree (reference:
srt/mem_cache/radix_cache.py:123 RadixCache, :43 TreeNode — match_prefix
:163, insert :200, cache_finished_req :208, LRU evict :297, lock refs
:322-350) for a *paged* TPU KV pool.

Differences from the reference, driven by TPU design:

- Sharing is at **page granularity** (page_size tokens), because the Pallas
  attention kernel addresses KV by page id; edges in the tree always hold a
  whole number of pages. A child edge is keyed by its first page's token
  chunk, which makes lookup unambiguous without per-token walking.
- The tree is pure host-side Python/numpy. The device never sees the tree,
  only per-step page tables — so there are no device-side tree ops to keep
  XLA-friendly (SURVEY.md §7 phase 1: "RadixCache ... is host-side").
"""

from __future__ import annotations

import heapq
import time
from typing import Callable, Dict, List, Optional, Tuple


class TreeNode:
    __slots__ = (
        "children",
        "parent",
        "key",
        "pages",
        "lock_ref",
        "last_access_time",
        "id",
    )

    _counter = 0

    def __init__(self, parent: Optional["TreeNode"] = None):
        self.children: Dict[Tuple[int, ...], "TreeNode"] = {}
        self.parent = parent
        self.key: List[int] = []      # tokens along this edge (multiple of page_size)
        self.pages: List[int] = []    # page ids backing `key`
        self.lock_ref = 0
        self.last_access_time = time.monotonic()
        TreeNode._counter += 1
        self.id = TreeNode._counter

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time

    @property
    def evictable(self) -> bool:
        return self.lock_ref == 0 and len(self.children) == 0


class MatchResult:
    __slots__ = ("pages", "matched_len", "last_node")

    def __init__(self, pages: List[int], matched_len: int, last_node: TreeNode):
        self.pages = pages
        self.matched_len = matched_len
        self.last_node = last_node


class RadixCache:
    def __init__(self, page_size: int, free_fn: Callable[[List[int]], None]):
        self.page_size = page_size
        self.free_fn = free_fn  # returns pages to the PageAllocator
        self.root = TreeNode()
        self.root.lock_ref = 1  # root is never evicted
        self._evictable_tokens = 0
        self._protected_tokens = 0
        # KV event stream for external cache observers (reference:
        # disaggregation/kv_events.py:119 ZmqEventPublisher + radix
        # take_events radix_cache.py:497-544). Off by default; when
        # enabled, insert/evict/clear append events drained by
        # take_events() (engine RPC /get_kv_events).
        self.enable_events = False
        self._events: List[dict] = []

    def _event(self, kind: str, **kw) -> None:
        if self.enable_events:
            self._events.append({"event": kind, "ts": time.time(), **kw})

    def take_events(self) -> List[dict]:
        ev, self._events = self._events, []
        return ev

    # ---------------------------------------------------------------- helpers

    def _chunk(self, tokens: List[int], i: int) -> Tuple[int, ...]:
        return tuple(tokens[i : i + self.page_size])

    def _num_pages(self, tokens: List[int]) -> int:
        return len(tokens) // self.page_size  # floor: partial pages never cached

    # ----------------------------------------------------------------- public

    @property
    def evictable_tokens(self) -> int:
        return self._evictable_tokens

    @property
    def protected_tokens(self) -> int:
        return self._protected_tokens

    def total_tokens(self) -> int:
        return self._evictable_tokens + self._protected_tokens

    def reset(self) -> None:
        """Drop everything (reference: /flush_cache)."""

        def collect(node: TreeNode):
            for c in node.children.values():
                collect(c)
                self.free_fn(c.pages)

        collect(self.root)
        self.root = TreeNode()
        self.root.lock_ref = 1
        self._evictable_tokens = 0
        self._protected_tokens = 0
        self._event("all_cleared")

    def match_prefix(self, tokens: List[int]) -> MatchResult:
        """Longest cached prefix of `tokens`, truncated to whole pages.

        Splits a node if the match ends mid-edge (at a page boundary), so
        ``last_node`` exactly covers the matched prefix and can be lock-ref'd.
        """
        node = self.root
        pages: List[int] = []
        pos = 0
        limit = (len(tokens) // self.page_size) * self.page_size
        while pos < limit:
            child = node.children.get(self._chunk(tokens, pos))
            if child is None:
                break
            # Count how many whole pages of this edge match (page count
            # derived from the key: host-offloaded nodes have no device
            # pages but still match — mem_cache/hiradix_cache.py).
            edge_pages = len(child.key) // self.page_size
            n_match = 0
            for i in range(edge_pages):
                lo = pos + i * self.page_size
                if lo + self.page_size > limit:
                    break
                if tuple(child.key[i * self.page_size : (i + 1) * self.page_size]) == tuple(
                    tokens[lo : lo + self.page_size]
                ):
                    n_match += 1
                else:
                    break
            if n_match == 0:
                break
            if n_match < edge_pages:
                child = self._split_node(child, n_match)
                pages.extend(child.pages)
                pos += n_match * self.page_size
                node = child
                break
            pages.extend(child.pages)
            pos += len(child.key)
            node = child
        node.last_access_time = time.monotonic()
        return MatchResult(pages=pages, matched_len=pos, last_node=node)

    def match_len(self, tokens: List[int]) -> int:
        """PURE longest-prefix length: no splits, no residency changes.

        For sorting/routing probes (SchedulePolicy LPM, dp balancing) —
        match_prefix mutates the tree (node splits; tier promotion in
        HiRadixCache), which must only happen at admission."""
        node = self.root
        pos = 0
        ps = self.page_size
        limit = (len(tokens) // ps) * ps
        while pos < limit:
            child = node.children.get(self._chunk(tokens, pos))
            if child is None:
                break
            for i in range(len(child.key) // ps):
                lo = pos + i * ps
                if lo + ps > limit or tuple(
                    child.key[i * ps : (i + 1) * ps]
                ) != tuple(tokens[lo : lo + ps]):
                    return pos + i * ps
            pos += len(child.key)
            node = child
        return pos

    def insert(
        self, tokens: List[int], pages: List[int]
    ) -> Tuple[int, List[int], TreeNode]:
        """Insert a (tokens, pages) sequence; tokens truncated to whole pages.

        Returns ``(dup_len, tree_pages, last_node)``: ``dup_len`` is the
        length (in tokens) of the prefix that was *already* present — the
        caller owns freeing its duplicate pages for that range; ``tree_pages``
        is the tree's page list now backing the full (truncated) sequence;
        ``last_node`` covers the whole inserted sequence. Ownership of
        ``pages[dup_len/ps:]`` transfers to the tree.
        """
        limit = (len(tokens) // self.page_size) * self.page_size
        tokens = list(tokens[:limit])
        n_pages = limit // self.page_size
        assert len(pages) >= n_pages, (len(pages), n_pages)
        pages = list(pages[:n_pages])

        node = self.root
        pos = 0
        tree_pages: List[int] = []
        while pos < limit:
            child = node.children.get(self._chunk(tokens, pos))
            if child is None:
                break
            edge_pages = len(child.key) // self.page_size
            n_match = 0
            for i in range(edge_pages):
                lo = pos + i * self.page_size
                if lo + self.page_size > limit:
                    break
                if tuple(child.key[i * self.page_size : (i + 1) * self.page_size]) == tuple(
                    tokens[lo : lo + self.page_size]
                ):
                    n_match += 1
                else:
                    break
            if n_match == 0:
                break
            if n_match < edge_pages:
                child = self._split_node(child, n_match)
            tree_pages.extend(child.pages)
            pos += n_match * self.page_size
            node = child
            child.last_access_time = time.monotonic()
        dup_len = pos
        if pos < limit:
            new = TreeNode(parent=node)
            new.key = tokens[pos:limit]
            new.pages = pages[pos // self.page_size :]
            node.children[self._chunk(tokens, pos)] = new
            tree_pages.extend(new.pages)
            self._evictable_tokens += len(new.key)
            self._event("block_stored", tokens=len(new.key))
            node = new
        return dup_len, tree_pages, node

    # ------------------------------------------------- request lifecycle API

    def cache_finished_req(
        self,
        tokens: List[int],
        pages: List[int],
        cached_len: int,
        last_node: TreeNode,
    ) -> None:
        """A request finished: fold its KV into the tree
        (reference: radix_cache.py:208 cache_finished_req).

        ``pages`` backs all of ``tokens``; the first ``cached_len`` tokens are
        tree-owned shared-prefix pages, the rest are request-owned. The tree
        takes ownership of the request-owned whole pages; duplicates (already
        present via a concurrent identical request) and the partial tail page
        are freed.
        """
        ps = self.page_size
        limit = (len(tokens) // ps) * ps
        dup_len, _, _ = self.insert(tokens, pages)
        assert dup_len >= (cached_len // ps) * ps
        # Request-owned pages now duplicated by existing tree nodes:
        self.free_fn(pages[cached_len // ps : dup_len // ps])
        # Partial tail page (never cacheable):
        self.free_fn(pages[limit // ps :])
        self.dec_lock_ref(last_node)

    def cache_unfinished_req(
        self,
        tokens: List[int],
        pages: List[int],
        cached_len: int,
        last_node: TreeNode,
    ) -> Tuple[List[int], int, TreeNode]:
        """A chunked-prefill request finished a chunk: publish its KV so other
        requests can share it mid-flight (reference: cache_unfinished_req).

        Returns ``(new_pages, new_cached_len, new_last_node)`` — the request's
        page list swapped to tree-backed pages for the page-aligned prefix
        (duplicates freed), with the lock moved to the deeper node.
        """
        ps = self.page_size
        limit = (len(tokens) // ps) * ps
        dup_len, tree_pages, new_last_node = self.insert(tokens, pages)
        self.free_fn(pages[cached_len // ps : dup_len // ps])
        new_pages = list(tree_pages) + list(pages[limit // ps :])
        self.inc_lock_ref(new_last_node)
        self.dec_lock_ref(last_node)
        return new_pages, limit, new_last_node

    def evict(self, num_tokens: int) -> int:
        """Evict >= num_tokens worth of unlocked leaf pages, LRU-first
        (reference: radix_cache.py:297). Returns tokens actually evicted."""
        leaves = [n for n in self._iter_nodes() if n.evictable]
        heapq.heapify(leaves)
        evicted = 0
        while leaves and evicted < num_tokens:
            node = heapq.heappop(leaves)
            if not node.evictable:
                continue
            self.free_fn(node.pages)
            evicted += len(node.key)
            self._evictable_tokens -= len(node.key)
            self._event("block_removed", tokens=len(node.key))
            parent = node.parent
            parent.children.pop(self._edge_key(node), None)
            if parent is not self.root and parent.evictable:
                heapq.heappush(leaves, parent)
        return evicted

    def inc_lock_ref(self, node: TreeNode) -> None:
        """Protect the path root..node from eviction while a request runs
        (reference: radix_cache.py:322)."""
        while node is not self.root:
            if node.lock_ref == 0:
                self._evictable_tokens -= len(node.key)
                self._protected_tokens += len(node.key)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode) -> None:
        while node is not self.root:
            assert node.lock_ref > 0
            node.lock_ref -= 1
            if node.lock_ref == 0:
                self._evictable_tokens += len(node.key)
                self._protected_tokens -= len(node.key)
            node = node.parent

    # --------------------------------------------------------------- internal

    def _edge_key(self, node: TreeNode) -> Tuple[int, ...]:
        return tuple(node.key[: self.page_size])

    def _split_node(self, node: TreeNode, n_pages: int) -> TreeNode:
        """Split `node` after its first n_pages pages; returns the upper part."""
        ps = self.page_size
        upper = TreeNode(parent=node.parent)
        upper.key = node.key[: n_pages * ps]
        upper.pages = node.pages[:n_pages]
        upper.lock_ref = node.lock_ref
        upper.last_access_time = node.last_access_time
        node.parent.children[self._edge_key(node)] = upper
        node.key = node.key[n_pages * ps :]
        node.pages = node.pages[n_pages:]
        node.parent = upper
        upper.children[self._edge_key(node)] = node
        return upper

    def _iter_nodes(self):
        stack = list(self.root.children.values())
        while stack:
            n = stack.pop()
            yield n
            stack.extend(n.children.values())

    # ------------------------------------------------------------- debug

    def sanity_check(self) -> None:
        """Invariants: edge lengths page-aligned, token accounting consistent."""
        total = 0
        for n in self._iter_nodes():
            assert len(n.key) % self.page_size == 0 and len(n.key) > 0
            assert len(n.pages) == len(n.key) // self.page_size
            total += len(n.key)
        assert total == self._evictable_tokens + self._protected_tokens, (
            total,
            self._evictable_tokens,
            self._protected_tokens,
        )
