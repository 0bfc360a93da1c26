"""Sliding-window-aware KV page management (SWA radix + window eviction).

Capability analog of the reference's SWA cache stack
(reference: srt/mem_cache/swa_radix_cache.py SWARadixCache, 1,025 LoC +
memory_pool.py:471 SWAKVPool): for hybrid models (Gemma-2/3: sliding
layers interleaved with global layers) the KV behind every sliding window
is dead for the SWA layers but still live for the global layers, so a
single shared page table can never reclaim it.

TPU-first design — **dual page tables over ONE pool array**:

- The pool stays a single ``kv[L, H, P, ps, 2D]`` array. A page id's
  FULL-layer rows and SWA-layer rows are independent storage, so two
  independent ``PageAllocator``s hand out the *same id space*: allocator
  A owns column c's full-layer rows for request X while allocator B owns
  column c's swa-layer rows for request Y. No pool split, no per-layer
  cond in the scan — each layer just selects its table
  (``jnp.where(is_local, page_table_swa, page_table)`` in
  models/gemma.py), and the attention kernels are unchanged.
- During decode, swa pages wholly behind ``pos - window`` are freed and
  their table slots become DEAD tombstones (shipped as the garbage page —
  the kernel's window mask never reads them). Steady-state swa footprint
  per request: ``ceil(window/page_size) + 1`` pages — the plateau.
- On finish, the request's pages fold into the SWA radix with a per-page
  MERGE: live pages upgrade existing tombstones (ownership transfers),
  live-on-live are duplicates (freed), dead entries stay tombstones (the
  reference's swa_uuid tombstone mechanism). A future prefix match is
  usable up to length L only if the window region [L - W, L) is fully
  live; ``usable_prefix`` finds the longest such L.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from sglang_custom_tpu.mem_cache.allocator import GARBAGE_PAGE, PageAllocator
from sglang_custom_tpu.mem_cache.radix_cache import (
    MatchResult,
    RadixCache,
    TreeNode,
)
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

DEAD = -1  # tombstoned page entry (KV reclaimed; behind every window)


class SWARadixCache(RadixCache):
    """RadixCache whose page lists may contain DEAD tombstones, with a
    tombstone-upgrading merge insert."""

    def __init__(self, page_size: int, free_fn):
        def free_live(pages):
            free_fn([int(p) for p in pages if int(p) != DEAD])

        super().__init__(page_size, free_live)

    def insert_merge(
        self, tokens: List[int], pages: List[int]
    ) -> Tuple[List[int], List[int], TreeNode]:
        """Insert with per-page merge against existing nodes.

        For each already-present page position: if the tree holds a
        tombstone and ours is live, the tree ADOPTS our page (upgrade);
        if both are live ours is a duplicate (returned for freeing); if
        ours is dead the tree's entry stands. Returns
        ``(dup_pages_to_free, tree_pages, last_node)`` where tree_pages
        now backs the whole (page-truncated) sequence.
        """
        ps = self.page_size
        limit = (len(tokens) // ps) * ps
        tokens = list(tokens[:limit])
        n_pages = limit // ps
        assert len(pages) >= n_pages, (len(pages), n_pages)
        pages = [int(p) for p in pages[:n_pages]]

        import time as _time

        node = self.root
        pos = 0
        tree_pages: List[int] = []
        dups: List[int] = []
        while pos < limit:
            child = node.children.get(self._chunk(tokens, pos))
            if child is None:
                break
            edge_pages = len(child.key) // ps
            n_match = 0
            for i in range(edge_pages):
                lo = pos + i * ps
                if lo + ps > limit:
                    break
                if tuple(child.key[i * ps : (i + 1) * ps]) == tuple(
                    tokens[lo : lo + ps]
                ):
                    n_match += 1
                else:
                    break
            if n_match == 0:
                break
            if n_match < edge_pages:
                child = self._split_node(child, n_match)
            # per-page merge over the matched pages
            for i in range(n_match):
                ours = pages[pos // ps + i]
                theirs = int(child.pages[i])
                if theirs == DEAD and ours != DEAD:
                    child.pages[i] = ours  # upgrade tombstone
                elif theirs != DEAD and ours != DEAD and ours != theirs:
                    # ours == theirs happens for the request's own
                    # tree-backed prefix — never a duplicate to free
                    dups.append(ours)
            tree_pages.extend(int(p) for p in child.pages)
            pos += n_match * ps
            node = child
            child.last_access_time = _time.monotonic()
        if pos < limit:
            new = TreeNode(parent=node)
            new.key = tokens[pos:limit]
            new.pages = list(pages[pos // ps :])
            node.children[self._chunk(tokens, pos)] = new
            tree_pages.extend(new.pages)
            self._evictable_tokens += len(new.key)
            self._event("block_stored", tokens=len(new.key))
            node = new
        return dups, tree_pages, node


class SWAState:
    """All SWA-side page bookkeeping for one scheduler.

    Mirrors the scheduler's full-attention request lifecycle:
    match/usable_prefix -> commit -> extend -> (decode window_evict) ->
    publish_unfinished / finish, or release on retraction/abort. Request
    state lives on the Req (``swa_page_list``, ``swa_cached_len``,
    ``swa_last_node``).
    """

    def __init__(self, num_pages: int, page_size: int, window: int):
        assert window > 0
        self.page_size = page_size
        self.window = window
        self.allocator = PageAllocator(num_pages, page_size)
        self.tree = SWARadixCache(page_size, self.allocator.free)

    # ------------------------------------------------------------ helpers

    def _live_floor_page(self, seq_len: int) -> int:
        """First page index a query at position >= seq_len may still read
        (pages wholly before seq_len - window are dead)."""
        return max((seq_len - self.window) // self.page_size, 0)

    def _free_live(self, pages) -> None:
        self.allocator.free(
            [int(p) for p in pages if int(p) not in (DEAD, GARBAGE_PAGE)]
        )

    # ----------------------------------------------------------- admission

    def usable_prefix(self, fill_ids: List[int], cap: int):
        """Longest page-aligned L <= cap such that the swa tree covers L
        tokens AND the window region [L - W, L) is fully live. Returns
        (L, MatchResult)."""
        ps = self.page_size
        m = self.tree.match_prefix(fill_ids)
        hi = min(cap, m.matched_len) // ps
        for Lp in range(hi, -1, -1):
            lo = self._live_floor_page(Lp * ps)
            if all(int(p) != DEAD for p in m.pages[lo:Lp]):
                return Lp * ps, m
        return 0, m

    def commit(self, r, L: int, m: MatchResult,
               new_pages_needed: int) -> bool:
        """Allocate this extend's swa pages and bind the matched prefix."""
        pages = self.allocator.alloc(new_pages_needed)
        if pages is None:
            return False
        self.tree.inc_lock_ref(m.last_node)
        r.swa_last_node = m.last_node
        r.swa_cached_len = L
        r.swa_page_list = [int(p) for p in m.pages[: L // self.page_size]]
        r.swa_page_list += pages
        return True

    def extend(self, r, total_tokens: int) -> bool:
        ps = self.page_size
        needed = (total_tokens + ps - 1) // ps - len(r.swa_page_list)
        if needed <= 0:
            return True
        pages = self.allocator.alloc(needed)
        if pages is None:
            return False
        r.swa_page_list.extend(pages)
        return True

    # -------------------------------------------------------- window slide

    def window_evict(self, r, seq_len: int) -> int:
        """Free REQUEST-OWNED swa pages wholly behind the window
        (tree-owned prefix pages stay; LRU eviction reclaims those).
        Returns pages freed."""
        ps = self.page_size
        lo_dead = self._live_floor_page(seq_len)
        start = r.swa_cached_len // ps
        freed = 0
        for i in range(start, min(lo_dead, len(r.swa_page_list))):
            p = int(r.swa_page_list[i])
            if p not in (DEAD, GARBAGE_PAGE):
                self.allocator.free([p])
                r.swa_page_list[i] = DEAD
                freed += 1
        return freed

    # ----------------------------------------------------------- lifecycle

    def finish(self, r, tokens: List[int]) -> None:
        ps = self.page_size
        self.window_evict(r, len(tokens))
        pages = list(r.swa_page_list)
        limit = (len(tokens) // ps) * ps
        dups, _, _ = self.tree.insert_merge(tokens, pages)
        self._free_live(dups)
        self._free_live(pages[limit // ps :])  # partial tail page
        if r.swa_last_node is not None:
            self.tree.dec_lock_ref(r.swa_last_node)
        r.swa_page_list = []
        r.swa_last_node = None

    def publish_unfinished(self, r, tokens: List[int]) -> None:
        ps = self.page_size
        self.window_evict(r, len(tokens))
        pages = list(r.swa_page_list)
        limit = (len(tokens) // ps) * ps
        dups, tree_pages, node = self.tree.insert_merge(tokens, pages)
        self._free_live(dups)
        r.swa_page_list = list(tree_pages) + list(pages[limit // ps :])
        r.swa_cached_len = limit
        self.tree.inc_lock_ref(node)
        if r.swa_last_node is not None:
            self.tree.dec_lock_ref(r.swa_last_node)
        r.swa_last_node = node

    def release(self, r) -> None:
        """Retraction / abort / failed full-side admission."""
        ps = self.page_size
        self._free_live(r.swa_page_list[r.swa_cached_len // ps :])
        if r.swa_last_node is not None:
            self.tree.dec_lock_ref(r.swa_last_node)
        r.swa_page_list = []
        r.swa_last_node = None
        r.swa_cached_len = 0

    def evict(self, num_tokens: int) -> int:
        return self.tree.evict(num_tokens)

    def reset(self) -> None:
        self.tree.reset()

    # -------------------------------------------------------------- debug

    def live_tree_pages(self) -> int:
        return sum(
            1
            for n in self.tree._iter_nodes()
            for p in n.pages
            if int(p) != DEAD
        )

    def check_leaks(self) -> bool:
        return self.allocator.check_leaks(
            expected_in_use=self.live_tree_pages()
        )

    def pages_in_use(self) -> int:
        return self.allocator.num_pages - 1 - self.allocator.available_pages
