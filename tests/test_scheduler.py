"""Scheduler tests mirroring the reference's tier-1 suite
(ref: scheduler.rs:2365-4105): add/abort, simple schedule, prefill
prioritization, budget caps, preemption, chunked prefill, swap, CoW
propagation, delay factor, prompt-limit ignore, infeasible swap.
"""

from collections import deque

from atoma_infer_tpu.config import CacheConfig, SchedulerConfig
from atoma_infer_tpu.core.block_manager import BlockSpaceManager
from atoma_infer_tpu.core.scheduler import Scheduler, SchedulingBudget
from atoma_infer_tpu.sequence import SequenceStatus

from utils import create_dummy_prompt, fork_group

BLOCK_SIZE = 16


def make_scheduler(
    max_num_batched_tokens=1024,
    max_num_sequences=32,
    max_model_len=1024,
    num_device_blocks=64,
    num_host_blocks=64,
    enable_chunked_prefill=False,
    delay_factor=0.0,
    watermark=0.0,
):
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_sequences=max_num_sequences,
        max_model_len=max_model_len,
        enable_chunked_prefill=enable_chunked_prefill,
        delay_factor=delay_factor,
    )
    cache_cfg = CacheConfig.new_from_blocks(
        BLOCK_SIZE, num_device_blocks, num_host_blocks
    )
    mgr = BlockSpaceManager(
        block_size=BLOCK_SIZE,
        num_device_blocks=num_device_blocks,
        num_host_blocks=num_host_blocks,
        watermark=watermark,
    )
    return Scheduler(sched_cfg, cache_cfg, block_manager=mgr)


def append_decode_token(group, token=1):
    """Simulate engine output processing for one decode step."""
    for seq in group.get_seqs(SequenceStatus.RUNNING):
        seq.append_token_id(token, 0.0)


def test_add_and_abort():
    sched = make_scheduler()
    seq, group = create_dummy_prompt("r0", 8)
    sched.add_sequence_group(group)
    assert sched.get_num_unfinished_seq_groups() == 1
    aborted = sched.abort_sequence_group("r0")
    assert aborted is group
    assert seq.status == SequenceStatus.FINISHED_ABORTED
    assert sched.get_num_unfinished_seq_groups() == 0


def test_simple_prefill_schedule():
    sched = make_scheduler()
    _, group = create_dummy_prompt("r0", 20)
    sched.add_sequence_group(group)
    metadata, out = sched.schedule()
    assert len(metadata) == 1
    assert metadata[0].is_prompt
    assert metadata[0].token_chunk_size == 20
    assert out.num_prefill_groups == 1
    assert out.num_batched_tokens == 20
    assert group.get_first_seq().status == SequenceStatus.RUNNING
    # Block table covers ceil(20/16)=2 blocks.
    seq_id = group.get_first_seq().seq_id
    assert len(metadata[0].block_tables[seq_id]) == 2


def test_prefill_never_mixed_with_decode():
    sched = make_scheduler()
    _, g0 = create_dummy_prompt("r0", 16)
    sched.add_sequence_group(g0)
    sched.schedule()  # prefill r0
    g0.update_num_computed_tokens(16)
    append_decode_token(g0)

    _, g1 = create_dummy_prompt("r1", 16)
    sched.add_sequence_group(g1)
    # Default algo prioritizes the new prefill and excludes the decode.
    metadata, out = sched.schedule()
    assert len(metadata) == 1
    assert metadata[0].request_id == "r1"
    assert metadata[0].is_prompt
    # Next step is pure decode with both groups.
    g1.update_num_computed_tokens(16)
    append_decode_token(g1)
    metadata, out = sched.schedule()
    assert len(metadata) == 2
    assert all(not m.is_prompt for m in metadata)
    assert out.num_batched_tokens == 2


def test_token_budget_caps_prefills():
    sched = make_scheduler(max_num_batched_tokens=64, max_model_len=64)
    for i in range(4):
        _, g = create_dummy_prompt(f"r{i}", 30)
        sched.add_sequence_group(g)
    metadata, out = sched.schedule()
    # 30+30 fits in 64; the third would overflow.
    assert len(metadata) == 2
    assert out.num_batched_tokens == 60
    assert len(sched.waiting) == 2


def test_max_seqs_cap():
    sched = make_scheduler(max_num_sequences=2)
    for i in range(4):
        _, g = create_dummy_prompt(f"r{i}", 8)
        sched.add_sequence_group(g)
    metadata, _ = sched.schedule()
    assert len(metadata) == 2


def test_prompt_over_limit_ignored():
    sched = make_scheduler(max_num_batched_tokens=1024, max_model_len=64)
    seq, g = create_dummy_prompt("r0", 100)
    sched.add_sequence_group(g)
    metadata, out = sched.schedule()
    assert metadata == []
    assert out.ignored_seq_groups == [g]
    assert seq.status == SequenceStatus.FINISHED_IGNORED


def test_prompt_never_fits_blocks_ignored():
    sched = make_scheduler(num_device_blocks=2)
    seq, g = create_dummy_prompt("r0", 3 * BLOCK_SIZE)
    sched.add_sequence_group(g)
    metadata, out = sched.schedule()
    assert metadata == []
    assert seq.status == SequenceStatus.FINISHED_IGNORED


def test_blocks_exhausted_prefill_waits():
    sched = make_scheduler(num_device_blocks=2)
    _, g0 = create_dummy_prompt("r0", 2 * BLOCK_SIZE)
    _, g1 = create_dummy_prompt("r1", BLOCK_SIZE)
    sched.add_sequence_group(g0)
    sched.add_sequence_group(g1)
    metadata, _ = sched.schedule()
    assert len(metadata) == 1
    assert metadata[0].request_id == "r0"
    assert len(sched.waiting) == 1  # r1 waits for blocks


def test_decode_preemption_by_recompute():
    # 2 blocks: two 1-block prompts fill the pool; first decode append that
    # needs a new block preempts the lower-priority group.
    sched = make_scheduler(num_device_blocks=2)
    seqs = []
    for i in range(2):
        s, g = create_dummy_prompt(f"r{i}", BLOCK_SIZE)
        sched.add_sequence_group(g)
        seqs.append((s, g))
    metadata, _ = sched.schedule()
    assert len(metadata) == 2
    for _, g in seqs:
        g.update_num_computed_tokens(BLOCK_SIZE)
        append_decode_token(g)
    metadata, out = sched.schedule()
    # One group decodes (taking the freed block), the other was recomputed.
    assert out.preempted == 1
    assert len(metadata) == 1
    assert len(sched.waiting) == 1
    preempted_group = sched.waiting[0]
    preempted_seq = preempted_group.get_first_seq()
    assert preempted_seq.status == SequenceStatus.WAITING
    assert preempted_seq.sequence_data.get_num_computed_tokens() == 0


def test_preempted_goes_to_front_of_waiting():
    sched = make_scheduler(num_device_blocks=2)
    for i in range(2):
        _, g = create_dummy_prompt(f"r{i}", BLOCK_SIZE)
        sched.add_sequence_group(g)
    sched.schedule()
    for g in list(sched.running):
        g.update_num_computed_tokens(BLOCK_SIZE)
        append_decode_token(g)
    # A newly arrived group sits in waiting; preempted must go FIRST.
    _, g_new = create_dummy_prompt("new", BLOCK_SIZE)
    sched.add_sequence_group(g_new)
    _, out = sched.schedule()
    assert out.preempted == 1
    assert sched.waiting[0].request_id != "new"


def test_beam_group_preempted_by_swap():
    sched = make_scheduler(num_device_blocks=4, num_host_blocks=8)
    # Higher-priority single-seq group arrives first and takes 3 blocks.
    _, g1 = create_dummy_prompt("r1", 3 * BLOCK_SIZE)
    sched.add_sequence_group(g1)
    sched.schedule()
    g1.update_num_computed_tokens(3 * BLOCK_SIZE)
    append_decode_token(g1)

    # Beam group with 2 running seqs arrives later (lowest priority; multi-seq
    # → swap on preemption). Takes the last free block.
    parent, beam_group = create_dummy_prompt("beam", BLOCK_SIZE, best_of=2)
    sched.add_sequence_group(beam_group)
    sched.schedule()
    beam_group.update_num_computed_tokens(BLOCK_SIZE)
    (child,) = fork_group(beam_group, parent, 1)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(parent, child)
    append_decode_token(beam_group, 1)

    # Zero free blocks → scheduling g1's decode preempts the beam group.
    _, out = sched.schedule()
    assert out.preempted >= 1
    assert out.blocks_to_swap_out
    assert len(sched.swapped) == 1
    assert all(
        s.status == SequenceStatus.SWAPPED
        for s in sched.swapped[0].get_unfinished_seqs()
    )


def test_swapped_in_after_blocks_free():
    sched = make_scheduler(num_device_blocks=4, num_host_blocks=8)
    parent, beam_group = create_dummy_prompt("beam", BLOCK_SIZE, best_of=2)
    sched.add_sequence_group(beam_group)
    sched.schedule()
    beam_group.update_num_computed_tokens(BLOCK_SIZE)
    (child,) = fork_group(beam_group, parent, 1)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(parent, child)
    append_decode_token(beam_group)

    # Swap it out manually via preemption path.
    sched._preempt_by_swap(beam_group, [])
    sched.running = deque()
    sched.swapped = deque([beam_group])

    metadata, out = sched.schedule()
    assert out.blocks_to_swap_in
    assert len(metadata) == 1
    assert all(
        s.status == SequenceStatus.RUNNING
        for s in beam_group.get_unfinished_seqs()
    )


def test_infeasible_swap_in_ignored():
    sched = make_scheduler(num_device_blocks=4, num_host_blocks=16)
    parent, group = create_dummy_prompt("big", 3 * BLOCK_SIZE, best_of=2)
    sched.add_sequence_group(group)
    sched.schedule()
    group.update_num_computed_tokens(3 * BLOCK_SIZE)
    (child,) = fork_group(group, parent, 1)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(parent, child)
    sched._preempt_by_swap(group, [])
    sched.running = deque()
    sched.swapped = deque([group])
    # Shrink the device pool so the group can never return.
    sched.block_manager.num_total_device_blocks = 2
    metadata, out = sched.schedule()
    assert metadata == []
    assert group in out.ignored_seq_groups
    assert all(
        s.status == SequenceStatus.FINISHED_IGNORED for s in group.get_seqs()
    )


def test_chunked_prefill_splits_prompt():
    sched = make_scheduler(
        max_num_batched_tokens=32,
        max_model_len=256,
        enable_chunked_prefill=True,
    )
    seq, g = create_dummy_prompt("r0", 80)
    sched.add_sequence_group(g)
    # Chunk 1: 32 tokens, no sampling.
    metadata, out = sched.schedule()
    assert metadata[0].token_chunk_size == 32
    assert not metadata[0].do_sample
    g.update_num_computed_tokens(32)
    # Chunk 2.
    metadata, _ = sched.schedule()
    assert metadata[0].token_chunk_size == 32
    assert not metadata[0].do_sample
    g.update_num_computed_tokens(32)
    # Final chunk samples.
    metadata, _ = sched.schedule()
    assert metadata[0].token_chunk_size == 16
    assert metadata[0].do_sample
    g.update_num_computed_tokens(16)
    assert not seq.is_prefill()


def test_chunked_prefill_mixes_decode_and_prefill():
    sched = make_scheduler(
        max_num_batched_tokens=48,
        max_model_len=256,
        enable_chunked_prefill=True,
    )
    _, g0 = create_dummy_prompt("r0", 16)
    sched.add_sequence_group(g0)
    sched.schedule()
    g0.update_num_computed_tokens(16)
    append_decode_token(g0)

    _, g1 = create_dummy_prompt("r1", 100)
    sched.add_sequence_group(g1)
    metadata, out = sched.schedule()
    # Decode of r0 + chunked prefill of r1 in one step; prefill listed first.
    assert len(metadata) == 2
    assert metadata[0].request_id == "r1" and metadata[0].is_prompt
    assert metadata[0].token_chunk_size == 47
    assert metadata[1].request_id == "r0" and not metadata[1].is_prompt
    assert out.num_batched_tokens == 48


def test_chunked_prefill_best_of_lockstep():
    """A best_of group whose combined prompt copies exceed the step budget
    must chunk candidates in LOCKSTEP (per-seq chunk = budget // n) rather
    than pin the waiting-queue head forever (round-2 livelock fix)."""
    from atoma_infer_tpu.sampling_params import (
        NextTokenChooserParameters,
        StoppingCriteriaParameters,
    )
    from atoma_infer_tpu.sequence import Sequence, SequenceGroup

    sched = make_scheduler(
        max_num_batched_tokens=64,
        max_model_len=256,
        enable_chunked_prefill=True,
    )
    prompt = list(range(80))
    seqs = [
        Sequence(
            seq_id=1000 + i,
            prompt="p",
            prompt_token_ids=list(prompt),
            block_size=BLOCK_SIZE,
        )
        for i in range(2)
    ]
    g = SequenceGroup(
        request_id="r0",
        sequences=seqs,
        next_token_chooser_params=NextTokenChooserParameters(),
        stopping_criteria=StoppingCriteriaParameters(max_new_tokens=8),
        best_of=2,
    )
    sched.add_sequence_group(g)

    # 2×80 = 160 tokens total vs 64-token budget → per-seq chunks of 32.
    metadata, out = sched.schedule()
    assert len(metadata) == 1
    assert metadata[0].token_chunk_size == 32      # per-seq contract
    assert not metadata[0].do_sample
    assert out.num_batched_tokens == 64            # group total in budget
    g.update_num_computed_tokens(32)

    metadata, _ = sched.schedule()
    assert metadata[0].token_chunk_size == 32
    assert not metadata[0].do_sample
    g.update_num_computed_tokens(32)

    # Final lockstep chunk (16 per candidate) samples.
    metadata, _ = sched.schedule()
    assert metadata[0].token_chunk_size == 16
    assert metadata[0].do_sample
    g.update_num_computed_tokens(16)
    assert not g.is_prefill()


def test_cow_propagated_in_outputs():
    sched = make_scheduler(num_device_blocks=8)
    parent, group = create_dummy_prompt("r0", BLOCK_SIZE - 1, best_of=2)
    sched.add_sequence_group(group)
    sched.schedule()
    group.update_num_computed_tokens(BLOCK_SIZE - 1)
    (child,) = fork_group(group, parent, 1)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(parent, child)
    append_decode_token(group)
    _, out = sched.schedule()
    assert out.blocks_to_copy  # CoW pair emitted for the shared last block


def test_decode_fast_path_counts_cow_demand():
    """ADVICE r4: a forked group mid-block with a shared last block and a
    full pool must fall back to the full pass (which preempts cleanly)
    instead of letting append_slots raise mid-loop after some tables were
    already mutated."""
    sched = make_scheduler(num_device_blocks=1)
    parent, group = create_dummy_prompt("r0", BLOCK_SIZE - 4, best_of=2)
    sched.add_sequence_group(group)
    sched.schedule()  # prefill takes the only device block
    group.update_num_computed_tokens(BLOCK_SIZE - 4)
    (child,) = fork_group(group, parent, 1)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(parent, child)
    append_decode_token(group)
    assert sched.block_manager.get_num_free_device_blocks() == 0
    # Mid-block append (no boundary) + shared last block → CoW demand 1
    # per seq; the fast path must decline so the full pass can preempt.
    _, out = sched.schedule()
    assert out.preempted >= 1 or sched.swapped
    assert not sched.running  # no half-mutated running set left behind


def test_delay_factor_waits_for_queue_fill():
    sched = make_scheduler(delay_factor=100.0)
    sched.last_prompt_latency = 10.0
    sched.prev_prompt = False
    _, g0 = create_dummy_prompt("r0", 16)
    sched.add_sequence_group(g0)
    # Nothing running → schedules immediately despite delay factor.
    metadata, _ = sched.schedule()
    assert len(metadata) == 1
    g0.update_num_computed_tokens(16)
    append_decode_token(g0)
    # With something running and a huge delay factor, a fresh arrival waits.
    sched.last_prompt_latency = 1e6
    _, g1 = create_dummy_prompt("r1", 16)
    sched.add_sequence_group(g1)
    metadata, _ = sched.schedule()
    assert all(m.request_id == "r0" for m in metadata)
    assert len(sched.waiting) == 1


def test_budget_accounting():
    budget = SchedulingBudget(token_budget=100, max_num_seqs=4)
    assert budget.can_schedule(num_new_tokens=100, num_new_seqs=4)
    budget.add_num_batched_tokens("a", 60)
    budget.add_num_batched_tokens("a", 60)  # double add ignored
    assert budget.num_batched_tokens == 60
    assert budget.remaining_token_budget() == 40
    budget.add_num_seqs("a", 2)
    assert not budget.can_schedule(num_new_tokens=41, num_new_seqs=1)
    assert not budget.can_schedule(num_new_tokens=1, num_new_seqs=3)
    budget.subtract_num_batched_tokens("a", 60)
    assert budget.remaining_token_budget() == 100
    budget.subtract_num_batched_tokens("a", 60)  # double subtract ignored
    assert budget.remaining_token_budget() == 100


def test_finished_groups_removed():
    sched = make_scheduler()
    seq, g = create_dummy_prompt("r0", 16)
    sched.add_sequence_group(g)
    sched.schedule()
    g.update_num_computed_tokens(16)
    seq.status = SequenceStatus.FINISHED_STOPPED
    sched.free_seq(seq)
    sched.remove_finished_sequences()
    assert not sched.has_unfinished_seqs()
    assert sched.block_manager.get_num_free_device_blocks() == 64
