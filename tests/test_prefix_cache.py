"""Prefix-caching allocator + evictor tests.

The reference ships the LRU evictor as dead code (evictor.rs, SURVEY.md
§2.2); here the CachedBlockAllocator wires it: content-hashed blocks survive
refcount-0 in an LRU table and are revived on hash hits.
"""

from atoma_infer_tpu.core.block import BlockDevice
from atoma_infer_tpu.core.block_allocator import (
    BlockAllocatorError,
    CachedBlockAllocator,
)
import pytest


def make_alloc(n=4):
    return CachedBlockAllocator(BlockDevice.DEVICE, 16, n)


class TestCachedBlockAllocator:
    def test_hash_hit_shares_block(self):
        a = make_alloc()
        b1 = a.allocate(block_hash=42)
        b2 = a.allocate(block_hash=42)
        assert b1 is b2
        assert b1.ref_count == 2

    def test_revive_after_free(self):
        a = make_alloc()
        b1 = a.allocate(block_hash=7)
        num = b1.block_number
        a.free(b1)
        assert a.get_num_free_blocks() == 4  # evictable counts as free
        b2 = a.allocate(block_hash=7)
        assert b2.block_number == num  # revived, not re-fetched
        assert b2.ref_count == 1

    def test_eviction_lru_order(self):
        a = make_alloc(n=2)
        b1 = a.allocate(block_hash=1)
        b2 = a.allocate(block_hash=2)
        a.free(b1)
        a.free(b2)
        b1.last_accessed = 1.0
        b2.last_accessed = 2.0
        # Fresh allocation must evict the LRU block (b1).
        b3 = a.allocate()
        assert b3.block_number == b1.block_number
        # hash 1 is gone; hash 2 still revivable.
        b4 = a.allocate(block_hash=2)
        assert b4.block_number == b2.block_number

    def test_exhaustion(self):
        a = make_alloc(n=1)
        a.allocate(block_hash=1)
        with pytest.raises(BlockAllocatorError):
            a.allocate(block_hash=2)

    def test_unhashed_blocks_not_cached(self):
        a = make_alloc()
        b = a.allocate()
        a.free(b)
        assert a.evictor.num_blocks == 0  # plain free list, no LRU entry
