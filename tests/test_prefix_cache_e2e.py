"""End-to-end prefix caching: block manager → scheduler → engine.

The reference ships computed-block tracking + the evictor as dead code
(block_manager.rs:1045-1119, evictor.rs); here the path is live: a request
sharing a prompt prefix with an earlier request skips recomputing the cached
blocks' tokens, and outputs are identical with caching on or off.
"""

import asyncio

import pytest

from atoma_infer_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    ValidationConfig,
)
from atoma_infer_tpu.core.block_manager import BlockSpaceManager
from atoma_infer_tpu.engine.llm_service import LlmService
from atoma_infer_tpu.entrypoints.offline import build_tiny_random
from atoma_infer_tpu.sequence import SequenceStatus
from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

from utils import create_dummy_prompt

BS = 16


def make_manager(blocks=64):
    return BlockSpaceManager(
        block_size=BS,
        num_device_blocks=blocks,
        num_host_blocks=8,
        enable_prefix_caching=True,
    )


def complete_prefill(bm, seq, group):
    """Simulate prefill compute: advance computed tokens + mark blocks."""
    remaining = seq.sequence_data.get_num_uncomputed_tokens()
    if remaining:
        group.update_num_computed_tokens(remaining)
    bm.compute_full_blocks_in_sequence(seq)


class TestManagerPrefixReuse:
    def test_second_request_hits_cached_prefix(self):
        bm = make_manager()
        seq1, g1 = create_dummy_prompt("r1", 4 * BS + 3, block_size=BS)
        bm.allocate(g1)
        assert seq1.sequence_data.get_num_computed_tokens() == 0
        complete_prefill(bm, seq1, g1)
        table1 = bm.get_block_table_ids(seq1.seq_id)

        # Same full prompt → all 4 full blocks cached (live sharing).
        seq2, g2 = create_dummy_prompt("r2", 4 * BS + 3, block_size=BS)
        bm.allocate(g2)
        assert seq2.sequence_data.get_num_computed_tokens() == 4 * BS
        assert bm.get_block_table_ids(seq2.seq_id)[:4] == table1[:4]
        # Partial last block is NOT shared.
        assert bm.get_block_table_ids(seq2.seq_id)[4] != table1[4]

    def test_revive_after_free(self):
        bm = make_manager()
        seq1, g1 = create_dummy_prompt("r1", 3 * BS, block_size=BS)
        bm.allocate(g1)
        complete_prefill(bm, seq1, g1)
        bm.free(seq1)  # blocks move to the evictor, revivable

        seq2, g2 = create_dummy_prompt("r2", 3 * BS, block_size=BS)
        bm.allocate(g2)
        # Whole prompt cached → capped at prompt_len - 1.
        assert seq2.sequence_data.get_num_computed_tokens() == 3 * BS - 1

    def test_different_prefix_no_hit(self):
        bm = make_manager()
        seq1, g1 = create_dummy_prompt("r1", 2 * BS, block_size=BS)
        bm.allocate(g1)
        complete_prefill(bm, seq1, g1)

        seq2 = create_dummy_prompt("r2", 2 * BS, block_size=BS)[0]
        seq2.sequence_data.prompt_token_ids[0] = 9999  # diverge at token 0
        from utils import create_dummy_prompt as _
        from atoma_infer_tpu.sampling_params import (
            NextTokenChooserParameters,
            StoppingCriteriaParameters,
        )
        from atoma_infer_tpu.sequence import SequenceGroup

        g2 = SequenceGroup(
            request_id="r2",
            sequences=[seq2],
            next_token_chooser_params=NextTokenChooserParameters(),
            stopping_criteria=StoppingCriteriaParameters(max_new_tokens=4),
        )
        bm.allocate(g2)
        assert seq2.sequence_data.get_num_computed_tokens() == 0

    def test_eviction_under_pressure_no_leak(self):
        bm = make_manager(blocks=8)
        for r in range(4):
            seq, g = create_dummy_prompt(f"r{r}", 3 * BS, block_size=BS)
            # Unique prompts to force fresh blocks + eviction.
            seq.sequence_data.prompt_token_ids[0] = 1000 + r
            bm.allocate(g)
            complete_prefill(bm, seq, g)
            bm.free(seq)
        # All blocks either free or evictable — pool intact.
        assert bm.get_num_free_device_blocks() == 8

    def test_partial_block_prompt_not_hashed(self):
        bm = make_manager()
        seq1, g1 = create_dummy_prompt("r1", BS - 1, block_size=BS)
        bm.allocate(g1)
        complete_prefill(bm, seq1, g1)
        seq2, g2 = create_dummy_prompt("r2", BS - 1, block_size=BS)
        bm.allocate(g2)
        assert seq2.sequence_data.get_num_computed_tokens() == 0


def make_service(enable_prefix_caching, **sched):
    model, params, tokenizer = build_tiny_random()
    s = dict(
        max_num_batched_tokens=512,
        max_num_sequences=16,
        max_model_len=512,
    )
    s.update(sched)
    config = EngineConfig(
        model=ModelConfig(model_name="tiny-random", dtype="float32"),
        cache=CacheConfig(
            block_size=16,
            num_device_blocks_override=128,
            num_host_blocks_override=16,
            enable_prefix_caching=enable_prefix_caching,
        ),
        scheduler=SchedulerConfig(**s),
        validation=ValidationConfig(max_input_tokens=400, max_total_tokens=512),
    )
    return LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )


class ChunkSpy:
    """Records prefill token_chunk_size per request through the worker."""

    def __init__(self, worker):
        self.worker = worker
        self.prefill_chunks = {}
        self._orig = worker.execute_model

    def __call__(self, request):
        for meta in request.sequence_groups_metadata:
            if meta.is_prompt:
                self.prefill_chunks.setdefault(meta.request_id, 0)
                self.prefill_chunks[meta.request_id] += meta.token_chunk_size
        return self._orig(request)


async def generate(service, prompts, max_new_tokens=8, sequential=True):
    task = asyncio.create_task(service.engine.run())
    results = []
    for i, p in enumerate(prompts):
        fut = await service.handle_request(
            GenerateRequest(
                request_id=f"req-{i}",
                inputs=p,
                parameters=GenerateParameters(
                    max_new_tokens=max_new_tokens, do_sample=False
                ),
            )
        )
        if sequential:
            results.append(await asyncio.wait_for(fut, timeout=120))
        else:
            results.append(fut)
    if not sequential:
        results = await asyncio.wait_for(asyncio.gather(*results), timeout=120)
    service.stop()
    task.cancel()
    return results


class TestServicePrefixCaching:
    PREFIX = "shared prefix " * 24  # ≥ 256 chars → many full 16-token blocks

    def test_second_request_computes_fewer_tokens(self):
        service = make_service(True)
        spy = ChunkSpy(service.engine.worker)
        service.engine.worker.execute_model = spy

        prompts = [self.PREFIX + "tail one", self.PREFIX + "tail two"]
        results = asyncio.run(generate(service, prompts))
        assert all(len(r.outputs[0].token_ids) > 0 for r in results)
        first = spy.prefill_chunks["req-0"]
        second = spy.prefill_chunks["req-1"]
        # The shared full blocks must be skipped for the second request.
        assert second <= first - 128, (first, second)

    def test_outputs_identical_with_and_without_caching(self):
        prompts = [self.PREFIX + "tail one", self.PREFIX + "tail two",
                   "something unrelated"]
        base = asyncio.run(generate(make_service(False), prompts))
        cached = asyncio.run(generate(make_service(True), prompts))
        for r0, r1 in zip(base, cached):
            assert r0.outputs[0].token_ids == r1.outputs[0].token_ids

    def test_concurrent_identical_prompts(self):
        service = make_service(True)
        prompts = [self.PREFIX + "same tail"] * 4
        results = asyncio.run(generate(service, prompts, sequential=False))
        toks = [tuple(r.outputs[0].token_ids) for r in results]
        assert len(set(toks)) == 1  # greedy → identical
