"""Block allocator + block manager tests.

Mirrors the reference's tier-1 suite: allocate, append-slot, CoW, fork, swap
in/out, free, reset, sliding-window (ref: block_manager.rs:1163-1557,
block_allocator.rs:146-229).
"""

import pytest

from atoma_infer_tpu.core.block import BlockDevice
from atoma_infer_tpu.core.block_allocator import (
    BlockAllocator,
    BlockAllocatorError,
    CachedBlockAllocator,
)
from atoma_infer_tpu.core.block_manager import AllocationStatus, BlockSpaceManager
from atoma_infer_tpu.sequence import SequenceStatus

from utils import create_dummy_prompt, fork_group

BLOCK_SIZE = 16


def test_allocator_alloc_free():
    alloc = BlockAllocator(BlockDevice.DEVICE, BLOCK_SIZE, 4)
    blocks = [alloc.allocate() for _ in range(4)]
    assert alloc.get_num_free_blocks() == 0
    with pytest.raises(BlockAllocatorError):
        alloc.allocate()
    for b in blocks:
        alloc.free(b)
    assert alloc.get_num_free_blocks() == 4


def test_allocator_double_free_detected():
    alloc = BlockAllocator(BlockDevice.DEVICE, BLOCK_SIZE, 1)
    b = alloc.allocate()
    alloc.free(b)
    with pytest.raises(BlockAllocatorError):
        alloc.free(b)


def test_allocator_refcount_sharing():
    alloc = BlockAllocator(BlockDevice.DEVICE, BLOCK_SIZE, 1)
    b = alloc.allocate()
    b.ref_count = 3
    alloc.free(b)
    alloc.free(b)
    assert alloc.get_num_free_blocks() == 0
    alloc.free(b)
    assert alloc.get_num_free_blocks() == 1


def test_cached_allocator_prefix_reuse():
    alloc = CachedBlockAllocator(BlockDevice.DEVICE, BLOCK_SIZE, 2)
    b1 = alloc.allocate(block_hash=42, num_hashed_tokens=16)
    # Same hash while live → shared.
    b2 = alloc.allocate(block_hash=42)
    assert b1 is b2 and b1.ref_count == 2
    alloc.free(b1)
    alloc.free(b1)
    # After refcount hits 0 the block is evictable but revivable by hash.
    b3 = alloc.allocate(block_hash=42)
    assert b3 is b1
    # Exhausting the pool evicts hashed refcount-0 blocks.
    alloc.free(b3)
    _ = alloc.allocate()  # fresh block
    _ = alloc.allocate()  # evicts b1
    with pytest.raises(BlockAllocatorError):
        alloc.allocate()


def _manager(num_device=8, num_host=8, sliding_window=None, watermark=0.0):
    return BlockSpaceManager(
        block_size=BLOCK_SIZE,
        num_device_blocks=num_device,
        num_host_blocks=num_host,
        watermark=watermark,
        sliding_window=sliding_window,
    )


def test_can_allocate_statuses():
    mgr = _manager(num_device=4)
    # 4 blocks worth of prompt fits exactly.
    _, group_fit = create_dummy_prompt("fit", 4 * BLOCK_SIZE)
    assert mgr.can_allocate(group_fit) == AllocationStatus.OK
    # 5 blocks can never fit.
    _, group_never = create_dummy_prompt("never", 5 * BLOCK_SIZE)
    assert mgr.can_allocate(group_never) == AllocationStatus.NEVER
    # Fill the pool, then 1 block must wait.
    mgr.allocate(group_fit)
    _, group_later = create_dummy_prompt("later", BLOCK_SIZE)
    assert mgr.can_allocate(group_later) == AllocationStatus.LATER


def test_allocate_and_free():
    mgr = _manager(num_device=8)
    seq, group = create_dummy_prompt("r0", 3 * BLOCK_SIZE)
    mgr.allocate(group)
    assert mgr.get_num_free_device_blocks() == 5
    assert len(mgr.get_block_table_ids(seq.seq_id)) == 3
    mgr.free(seq)
    assert mgr.get_num_free_device_blocks() == 8
    # Double free is a no-op (table already removed).
    mgr.free(seq)
    assert mgr.get_num_free_device_blocks() == 8


def test_append_slot_new_block():
    mgr = _manager()
    seq, group = create_dummy_prompt("r0", BLOCK_SIZE)  # exactly one full block
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    # Sampled token fills a fresh block.
    seq.append_token_id(7, 0.0)
    cows = mgr.append_slots(seq)
    assert cows == []
    assert len(mgr.get_block_table_ids(seq.seq_id)) == 2


def test_append_slot_copy_on_write():
    mgr = _manager()
    seq, group = create_dummy_prompt("r0", BLOCK_SIZE - 1, best_of=2)
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    (child,) = fork_group(group, seq, 1)
    child.status = SequenceStatus.RUNNING
    mgr.fork(seq, child)
    free_before = mgr.get_num_free_device_blocks()

    # Both write into the shared last block → the second writer copies.
    seq.append_token_id(1, 0.0)
    cows_parent = mgr.append_slots(seq)
    assert cows_parent  # parent's last block was shared → CoW
    src, dst = cows_parent[0]
    assert src != dst
    child.append_token_id(2, 0.0)
    cows_child = mgr.append_slots(child)
    assert cows_child == []  # child now sole owner of the original block
    assert mgr.get_num_free_device_blocks() == free_before - 1


def test_fork_shares_blocks():
    mgr = _manager()
    seq, group = create_dummy_prompt("r0", 2 * BLOCK_SIZE)
    mgr.allocate(group)
    (child,) = fork_group(group, seq, 1)
    mgr.fork(seq, child)
    assert mgr.get_block_table_ids(seq.seq_id) == mgr.get_block_table_ids(
        child.seq_id
    )
    free = mgr.get_num_free_device_blocks()
    mgr.free(seq)
    assert mgr.get_num_free_device_blocks() == free  # still referenced by child
    mgr.free(child)
    assert mgr.get_num_free_device_blocks() == free + 2


def test_swap_out_in_roundtrip():
    mgr = _manager(num_device=4, num_host=4)
    seq, group = create_dummy_prompt("r0", 2 * BLOCK_SIZE)
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    dev_ids = mgr.get_block_table_ids(seq.seq_id)

    mapping_out = mgr.swap_out(group)
    assert sorted(m[0] for m in mapping_out) == sorted(dev_ids)
    assert mgr.get_num_free_device_blocks() == 4
    assert mgr.get_num_free_host_blocks() == 2
    seq.status = SequenceStatus.SWAPPED

    assert mgr.can_swap_in(group) == AllocationStatus.OK
    mapping_in = mgr.swap_in(group)
    assert len(mapping_in) == 2
    assert mgr.get_num_free_device_blocks() == 2
    assert mgr.get_num_free_host_blocks() == 4


def test_can_swap_in_never_when_too_big():
    mgr = _manager(num_device=2, num_host=8)
    seq, group = create_dummy_prompt("r0", 2 * BLOCK_SIZE)
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    mgr.swap_out(group)
    seq.status = SequenceStatus.SWAPPED
    # Needs 2 blocks + 1 headroom > 2 total.
    assert mgr.can_swap_in(group) == AllocationStatus.NEVER


def test_sliding_window_block_reuse():
    window = 2 * BLOCK_SIZE
    mgr = _manager(num_device=8, sliding_window=window)
    seq, group = create_dummy_prompt("r0", 4 * BLOCK_SIZE)
    # Prompt is 4 logical blocks but only 2 physical under the window.
    mgr.allocate(group)
    assert len(mgr.get_block_table_ids(seq.seq_id)) == 2
    assert mgr.get_num_free_device_blocks() == 6
    seq.status = SequenceStatus.RUNNING
    # Decode appends reuse blocks modulo the window: table grows logically but
    # repeats physical blocks.
    for i in range(BLOCK_SIZE + 1):
        seq.append_token_id(i, 0.0)
        mgr.append_slots(seq)
    ids = mgr.get_block_table_ids(seq.seq_id)
    assert len(set(ids)) == 2
    assert mgr.get_num_free_device_blocks() == 6
    mgr.free(seq)
    assert mgr.get_num_free_device_blocks() == 8


def test_reset():
    mgr = _manager()
    for i in range(3):
        _, group = create_dummy_prompt(f"r{i}", BLOCK_SIZE)
        mgr.allocate(group)
    assert mgr.get_num_free_device_blocks() == 5
    mgr.reset()
    assert mgr.get_num_free_device_blocks() == 8
    assert not mgr.block_tables


def test_computed_block_tracking():
    mgr = _manager()
    seq, group = create_dummy_prompt("r0", 3 * BLOCK_SIZE)
    mgr.allocate(group)
    seq.sequence_data.update_num_computed_tokens(2 * BLOCK_SIZE + 3)
    mgr.compute_full_blocks_in_sequence(seq)
    ids = mgr.get_block_table_ids(seq.seq_id)
    assert mgr.get_all_computed_blocks(seq) == ids[:2]
