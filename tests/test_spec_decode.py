"""Speculative decoding (engine/spec_decode.py): proposer unit tests,
lookahead block allocation, and end-to-end greedy parity.

The invariant under test everywhere: speculative decoding must reproduce
non-speculative greedy decoding TOKEN-FOR-TOKEN, no matter what the drafts
are (acceptance keeps exactly the prefix the model itself would have chosen,
plus the bonus token). The reference carries only spec-decode metric types
(ref: sequence.rs:2131-2154); this implements and verifies the feature.
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
from atoma_infer_tpu.engine.llm_service import LlmService
from atoma_infer_tpu.engine.spec_decode import NgramProposer
from atoma_infer_tpu.entrypoints.offline import build_tiny_random
from atoma_infer_tpu.types import GenerateParameters, GenerateRequest


class TestNgramProposer:
    def test_proposes_continuation_of_most_recent_match(self):
        p = NgramProposer(num_speculative_tokens=3, ngram_max=2, ngram_min=1)
        #         0  1  2  3  4  5  6
        tokens = [5, 6, 7, 8, 5, 6, 9]  # trailing 1-gram "9": no match
        assert p.propose(tokens) == []
        tokens = [5, 6, 7, 8, 5, 6]  # trailing 2-gram "5 6" matches at 0
        assert p.propose(tokens) == [7, 8, 5]

    def test_most_recent_occurrence_wins(self):
        p = NgramProposer(num_speculative_tokens=2, ngram_max=1, ngram_min=1)
        tokens = [3, 1, 3, 2, 3]  # trailing "3" matches at 0 and 2; use 2
        assert p.propose(tokens) == [2, 3]

    def test_draft_clamped_by_max_len(self):
        p = NgramProposer(num_speculative_tokens=4, ngram_max=1, ngram_min=1)
        tokens = [1, 2, 3, 4, 5, 1]
        assert p.propose(tokens) == [2, 3, 4, 5]
        assert p.propose(tokens, max_len=2) == [2, 3]
        assert p.propose(tokens, max_len=0) == []

    def test_longer_ngram_preferred(self):
        p = NgramProposer(num_speculative_tokens=2, ngram_max=2, ngram_min=1)
        # trailing 2-gram "1 2" matches at 0 → [7, 8]; a 1-gram match of "2"
        # at index 4 would give [9, 1] — the longer n-gram must win.
        tokens = [1, 2, 7, 8, 2, 9, 1, 2]
        assert p.propose(tokens) == [7, 8]

    def test_no_proposal_on_short_or_unmatched(self):
        p = NgramProposer(num_speculative_tokens=2)
        assert p.propose([1]) == []
        assert p.propose([1, 2, 3, 4]) == []

    def test_validation(self):
        with pytest.raises(ValueError):
            NgramProposer(0)
        with pytest.raises(ValueError):
            NgramProposer(2, ngram_max=1, ngram_min=2)


class TestLookaheadSlots:
    def test_append_slots_lookahead_allocates_spanning_blocks(self):
        from atoma_infer_tpu.core.block_manager import BlockSpaceManager
        from atoma_infer_tpu.sequence import Sequence, SequenceGroup

        bm = BlockSpaceManager(block_size=4, num_device_blocks=16,
                               num_host_blocks=0)
        seq = Sequence(seq_id=1, prompt="p", prompt_token_ids=[1, 2, 3],
                       block_size=4)
        group = SequenceGroup(request_id="r", sequences=[seq])
        bm.allocate(group)
        assert len(bm.get_block_table_ids(1)) == 1  # 3 tokens in 1 block
        # Next token (len 4 → still block 1) + 6 lookahead slots → len 10
        # spans 3 blocks total.
        cows = bm.append_slots(seq, num_lookahead_slots=6)
        assert cows == []
        assert len(bm.get_block_table_ids(1)) == 3

    def test_lookahead_cow_covers_every_shared_landing_block(self):
        from atoma_infer_tpu.core.block_manager import BlockSpaceManager
        from atoma_infer_tpu.sequence import Sequence, SequenceGroup

        bm = BlockSpaceManager(block_size=4, num_device_blocks=16,
                               num_host_blocks=0)
        parent = Sequence(seq_id=1, prompt="p",
                          prompt_token_ids=[1, 2, 3, 4, 5], block_size=4)
        group = SequenceGroup(request_id="r", sequences=[parent])
        bm.allocate(group)
        child = parent.fork(2)
        bm.fork(parent, child)  # both blocks now shared (ref_count 2)
        before = list(bm.get_block_table_ids(1))
        # len 5, last block (index 1) is shared and the write lands in it.
        cows = bm.append_slots(parent, num_lookahead_slots=0)
        after = bm.get_block_table_ids(1)
        assert len(cows) == 1
        assert cows[0][0] == before[1] and cows[0][1] == after[1]
        # Child keeps the original block.
        assert bm.get_block_table_ids(2)[1] == before[1]


def make_service(num_spec: int, **scheduler_overrides) -> LlmService:
    model, params, tokenizer = build_tiny_random()
    sched = dict(
        max_num_batched_tokens=512,
        max_num_sequences=16,
        max_model_len=512,
        enable_chunked_prefill=False,
        num_speculative_tokens=num_spec,
        spec_ngram_min=1,
    )
    sched.update(scheduler_overrides)
    config = EngineConfig(
        model=ModelConfig(model_name="tiny-random", dtype="float32"),
        cache=CacheConfig(
            block_size=16,
            num_device_blocks_override=128,
            num_host_blocks_override=32,
        ),
        scheduler=SchedulerConfig(**sched),
        validation=ValidationConfig(max_input_tokens=256,
                                    max_total_tokens=512),
    )
    return LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )


def _generate(service, request_id, prompt, max_new_tokens=24):
    async def go():
        task = asyncio.create_task(service.engine.run())
        fut = await service.handle_request(
            GenerateRequest(
                request_id=request_id,
                inputs=prompt,
                parameters=GenerateParameters(max_new_tokens=max_new_tokens),
            )
        )
        r = await asyncio.wait_for(fut, timeout=120)
        service.stop()
        task.cancel()
        return r

    return asyncio.run(go())


PROMPT = "the cat sat on the mat the cat sat on the mat the cat"


class TestSpecDecodeEndToEnd:
    def test_greedy_parity_ngram_drafts(self):
        base = _generate(make_service(0), "base", PROMPT)
        spec = _generate(make_service(4), "spec", PROMPT)
        assert (
            spec.outputs[0].token_ids == base.outputs[0].token_ids
        ), "speculative greedy decode must be token-identical"
        assert spec.outputs[0].output_text == base.outputs[0].output_text
        assert len(spec.outputs[0].logprobs) == len(
            spec.outputs[0].token_ids
        )

    def test_greedy_parity_adversarial_drafts(self):
        """Arbitrary (wrong) drafts must not change the output: verification
        accepts exactly the prefix greedy would have produced."""
        from atoma_infer_tpu.server import metrics

        base = _generate(make_service(0), "base", PROMPT)

        service = make_service(3)

        class AlwaysWrong:
            def propose(self, token_ids, max_len=None):
                k = 3 if max_len is None else min(3, max_len)
                # Token ids near-certain to mismatch the greedy choice.
                return [(int(t) + 1) % 100 for t in token_ids[-1:]] * k if k > 0 else []

        proposed_before = metrics.SPEC_PROPOSED.value
        service.engine.scheduler.spec_proposer = AlwaysWrong()
        adv = _generate(service, "adv", PROMPT)
        assert adv.outputs[0].token_ids == base.outputs[0].token_ids
        assert metrics.SPEC_PROPOSED.value > proposed_before

    def test_spec_mixed_with_chunked_prefill(self):
        """A verify-layout step may also carry another request's prefill
        chunk (chunked-prefill mixing): the prefill's sampled token must
        come from its chunk's LAST row, drafts notwithstanding — outputs
        of BOTH requests must match the non-speculative run."""

        def run(num_spec):
            service = make_service(
                num_spec,
                enable_chunked_prefill=True,
                max_num_batched_tokens=64,
            )

            async def go():
                task = asyncio.create_task(service.engine.run())
                # Repetitive prompt decodes (and drafts) while the long
                # prompt prefills in 64-token chunks alongside.
                fut_a = await service.handle_request(
                    GenerateRequest(
                        request_id="spec-seq",
                        inputs=PROMPT,
                        parameters=GenerateParameters(max_new_tokens=20),
                    )
                )
                await asyncio.sleep(0.3)  # let A reach decode
                fut_b = await service.handle_request(
                    GenerateRequest(
                        request_id="chunky",
                        inputs="z" * 200,
                        parameters=GenerateParameters(max_new_tokens=6),
                    )
                )
                ra, rb = await asyncio.wait_for(
                    asyncio.gather(fut_a, fut_b), timeout=120
                )
                service.stop()
                task.cancel()
                return ra.outputs[0].token_ids, rb.outputs[0].token_ids

            return asyncio.run(go())

        base_a, base_b = run(0)
        spec_a, spec_b = run(4)
        assert spec_a == base_a
        assert spec_b == base_b

    def test_spec_respects_max_new_tokens(self):
        """Accepted drafts may cross the max_new_tokens boundary inside one
        step; the output must still be capped exactly."""
        spec = _generate(make_service(4), "cap", PROMPT, max_new_tokens=5)
        assert len(spec.outputs[0].token_ids) <= 5

    def test_spec_with_sliding_window_rejected(self):
        """Lookahead writes wrap modulo a block-level window and can
        destroy in-window KV when drafts are rejected — must be refused."""
        with pytest.raises(ValueError, match="sliding window"):
            EngineConfig(
                model=ModelConfig(model_name="m"),
                cache=CacheConfig(block_size=16, sliding_window=64),
                scheduler=SchedulerConfig(
                    num_speculative_tokens=2,
                    max_num_batched_tokens=512,
                    max_model_len=512,
                ),
                validation=ValidationConfig(),
            )

    def test_spec_with_pp_rejected(self):
        with pytest.raises(ValueError, match="pipeline"):
            EngineConfig(
                model=ModelConfig(
                    model_name="m", pipeline_parallel_size=2
                ),
                cache=CacheConfig(block_size=16),
                scheduler=SchedulerConfig(
                    num_speculative_tokens=2,
                    max_num_batched_tokens=512,
                    max_model_len=512,
                ),
                validation=ValidationConfig(),
            )
