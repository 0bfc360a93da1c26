from sglang_custom_tpu.mem_cache.allocator import GARBAGE_PAGE, PageAllocator


def test_alloc_free_roundtrip():
    a = PageAllocator(num_pages=10, page_size=16)
    assert a.available_pages == 9  # page 0 reserved
    p1 = a.alloc(4)
    assert len(p1) == 4
    assert GARBAGE_PAGE not in p1
    p2 = a.alloc(5)
    assert a.available_pages == 0
    assert a.alloc(1) is None
    a.free(p1)
    assert a.available_pages == 4
    a.free(p2)
    assert a.check_leaks()


def test_alloc_overcommit_leaves_state_intact():
    a = PageAllocator(num_pages=4, page_size=16)
    assert a.alloc(10) is None
    assert a.available_pages == 3


def test_pages_needed():
    a = PageAllocator(num_pages=4, page_size=16)
    assert a.pages_needed(0) == 0
    assert a.pages_needed(1) == 1
    assert a.pages_needed(16) == 1
    assert a.pages_needed(17) == 2
