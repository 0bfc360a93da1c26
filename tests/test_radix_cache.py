"""Radix cache semantics (reference analog: test/srt/test_radix_attention.py
exercising mem_cache/radix_cache.py match/insert/evict/lock)."""

import pytest

from sglang_custom_tpu.mem_cache.allocator import PageAllocator
from sglang_custom_tpu.mem_cache.radix_cache import RadixCache

PS = 4  # small page size for tests


@pytest.fixture
def cache_and_alloc():
    alloc = PageAllocator(num_pages=64, page_size=PS)
    cache = RadixCache(page_size=PS, free_fn=alloc.free)
    return cache, alloc


def toks(n, base=0):
    return list(range(base, base + n))


def test_match_empty(cache_and_alloc):
    cache, _ = cache_and_alloc
    m = cache.match_prefix(toks(10))
    assert m.matched_len == 0 and m.pages == []


def test_insert_then_match(cache_and_alloc):
    cache, alloc = cache_and_alloc
    pages = alloc.alloc(3)
    # 12 tokens = 3 pages
    dup, tree_pages, node = cache.insert(toks(12), pages)
    assert dup == 0 and tree_pages == pages
    m = cache.match_prefix(toks(12))
    assert m.matched_len == 12
    assert m.pages == pages
    # partial-page queries truncate to page boundary
    m = cache.match_prefix(toks(11))
    assert m.matched_len == 8
    assert m.pages == pages[:2]
    # diverging suffix
    m = cache.match_prefix(toks(8) + [99, 98, 97, 96])
    assert m.matched_len == 8
    cache.sanity_check()


def test_insert_duplicate_prefix(cache_and_alloc):
    cache, alloc = cache_and_alloc
    p1 = alloc.alloc(2)
    cache.insert(toks(8), p1)
    # A second identical sequence computed independently: its pages are dups.
    p2 = alloc.alloc(3)
    dup, tree_pages, _ = cache.insert(toks(12), p2)
    assert dup == 8
    assert tree_pages[:2] == p1
    assert tree_pages[2] == p2[2]
    cache.sanity_check()


def test_node_split(cache_and_alloc):
    cache, alloc = cache_and_alloc
    pa = alloc.alloc(4)
    cache.insert(toks(16), pa)
    # Insert a sequence sharing only the first 2 pages.
    pb = alloc.alloc(4)
    seq_b = toks(8) + toks(8, base=100)
    dup, tree_pages, _ = cache.insert(seq_b, pb)
    assert dup == 8
    assert tree_pages[:2] == pa[:2]
    assert tree_pages[2:] == pb[2:]
    # Both full sequences still match.
    assert cache.match_prefix(toks(16)).matched_len == 16
    assert cache.match_prefix(seq_b).matched_len == 16
    cache.sanity_check()


def test_evict_lru_and_locks(cache_and_alloc):
    cache, alloc = cache_and_alloc
    pa = alloc.alloc(2)
    ra = cache.insert(toks(8), pa)
    pb = alloc.alloc(2)
    rb = cache.insert(toks(8, base=500), pb)
    node_a = cache.match_prefix(toks(8)).last_node
    cache.inc_lock_ref(node_a)
    assert cache.protected_tokens == 8
    free_before = alloc.available_pages

    evicted = cache.evict(100)
    # Only the unlocked branch is evictable.
    assert evicted == 8
    assert alloc.available_pages == free_before + 2
    assert cache.match_prefix(toks(8)).matched_len == 8
    assert cache.match_prefix(toks(8, base=500)).matched_len == 0

    cache.dec_lock_ref(node_a)
    assert cache.evict(100) == 8
    cache.sanity_check()


def test_finished_req_lifecycle(cache_and_alloc):
    cache, alloc = cache_and_alloc
    # Request ran with no cached prefix: 10 tokens over 3 pages.
    pages = alloc.alloc(3)
    node = cache.match_prefix(toks(10)).last_node
    cache.inc_lock_ref(node)
    used_before = 64 - 1 - alloc.available_pages
    cache.cache_finished_req(toks(10), pages, cached_len=0, last_node=node)
    # 2 full pages retained by tree, partial third page freed.
    assert cache.match_prefix(toks(10)).matched_len == 8
    used_after = 64 - 1 - alloc.available_pages
    assert used_after == used_before - 1
    cache.sanity_check()


def test_unfinished_req_swap(cache_and_alloc):
    cache, alloc = cache_and_alloc
    # Pre-existing cached prefix from another request.
    p_other = alloc.alloc(2)
    cache.insert(toks(8), p_other)
    # Our request computed the same 8 tokens itself plus 2 more (10 total).
    p_own = alloc.alloc(3)
    root = cache.match_prefix([]).last_node
    new_pages, new_cached, node = cache.cache_unfinished_req(
        toks(10), p_own, cached_len=0, last_node=root
    )
    # First two pages swapped to the tree's copies; dups freed.
    assert new_pages[:2] == p_other
    assert new_pages[2] == p_own[2]
    assert new_cached == 8
    assert node.lock_ref >= 1
    cache.dec_lock_ref(node)
    cache.sanity_check()


def test_reset(cache_and_alloc):
    cache, alloc = cache_and_alloc
    pages = alloc.alloc(4)
    cache.insert(toks(16), pages)
    cache.reset()
    assert alloc.check_leaks()
    assert cache.match_prefix(toks(16)).matched_len == 0
