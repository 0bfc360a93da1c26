from sglang_custom_tpu.mem_cache.allocator import GARBAGE_PAGE, PageAllocator
from sglang_custom_tpu.mem_cache.chunk_cache import ChunkCache
from sglang_custom_tpu.mem_cache.memory_pool import KVCachePool, ReqSlotPool
from sglang_custom_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode

__all__ = [
    "GARBAGE_PAGE",
    "PageAllocator",
    "ChunkCache",
    "KVCachePool",
    "ReqSlotPool",
    "MatchResult",
    "RadixCache",
    "TreeNode",
]
