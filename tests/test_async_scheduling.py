"""Async scheduling (vLLM-v1 style) end-to-end tests.

Step N+1 is scheduled and dispatched before step N's sampled tokens reach
the host (engine/llm_engine.py async stepping + worker device-token feed).
Correctness bar: token-identical outputs to the synchronous engine — the
placeholder bookkeeping, the device-side token feed, and the one-step-late
stop detection must all be invisible in the results.
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
from atoma_infer_tpu.entrypoints.offline import build_tiny_random
from atoma_infer_tpu.types import GenerateParameters, GenerateRequest


def make_service(async_scheduling: bool, **scheduler_overrides) -> LlmService:
    model, params, tokenizer = build_tiny_random()
    sched = dict(
        max_num_batched_tokens=512,
        max_num_sequences=16,
        max_model_len=512,
        async_scheduling=async_scheduling,
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
        validation=ValidationConfig(max_input_tokens=256, max_total_tokens=512),
    )
    return LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )


def run_batch(async_scheduling: bool, requests, **scheduler_overrides):
    """Run a list of GenerateRequests through a fresh service; return the
    results in request order."""

    async def scenario():
        service = make_service(async_scheduling, **scheduler_overrides)
        task = asyncio.create_task(service.engine.run())
        futs = [await service.handle_request(r) for r in requests]
        results = await asyncio.wait_for(asyncio.gather(*futs), timeout=120)
        service.stop()
        task.cancel()
        return results

    return asyncio.run(scenario())


def greedy_requests(n=12, max_new=10, seed_text="the quick brown fox"):
    return [
        GenerateRequest(
            request_id=f"req-{i}",
            inputs=f"{seed_text} {i} " * (1 + i % 4),
            parameters=GenerateParameters(max_new_tokens=max_new),
        )
        for i in range(n)
    ]


class TestAsyncScheduling:
    def test_greedy_token_identical_to_sync(self):
        reqs = greedy_requests()
        sync = run_batch(False, reqs)
        asy = run_batch(True, reqs)
        for s, a in zip(sync, asy):
            assert a.outputs[0].token_ids == s.outputs[0].token_ids
            assert a.outputs[0].output_text == s.outputs[0].output_text
            assert a.outputs[0].finish_reason == s.outputs[0].finish_reason
            assert a.outputs[0].logprobs == pytest.approx(
                s.outputs[0].logprobs, abs=1e-5
            )

    def test_seeded_sampling_identical_to_sync(self):
        reqs = [
            GenerateRequest(
                request_id=f"samp-{i}",
                inputs=f"sample prompt {i}",
                parameters=GenerateParameters(
                    max_new_tokens=8,
                    do_sample=True,
                    seed=1234 + i,
                    temperature=0.9,
                    top_k=40,
                ),
            )
            for i in range(8)
        ]
        sync = run_batch(False, reqs)
        asy = run_batch(True, reqs)
        for s, a in zip(sync, asy):
            assert a.outputs[0].token_ids == s.outputs[0].token_ids

    def test_penalties_fall_back_to_sync_path(self):
        # Repetition penalty needs real token values on the host each step —
        # the engine must run these synchronously and still be correct.
        reqs = [
            GenerateRequest(
                request_id=f"pen-{i}",
                inputs=f"penalized prompt {i}",
                parameters=GenerateParameters(
                    max_new_tokens=8, repetition_penalty=1.3
                ),
            )
            for i in range(4)
        ]
        sync = run_batch(False, reqs)
        asy = run_batch(True, reqs)
        for s, a in zip(sync, asy):
            assert a.outputs[0].token_ids == s.outputs[0].token_ids

    def test_depth2_split_prefill_wave_identical(self):
        """Depth-2 hazard: after a prefill wave splits across two steps, the
        first wave's decode rows read a token sampled by an in-flight step
        OLDER than the feed source — the engine must drop to the sync path
        for that step (llm_engine._async_eligible) to stay token-identical."""
        reqs = greedy_requests(n=12, max_new=10)
        overrides = dict(max_num_batched_tokens=256, max_model_len=256)
        sync = run_batch(False, reqs, **overrides)
        asy = run_batch(True, reqs, async_depth=2, **overrides)
        for s, a in zip(sync, asy):
            assert a.outputs[0].token_ids == s.outputs[0].token_ids
            assert a.outputs[0].logprobs == pytest.approx(
                s.outputs[0].logprobs, abs=1e-5
            )

    def test_depth2_staggered_finish_truncation(self):
        """Sequences finishing while newer steps are in flight must not leak
        trailing placeholder tokens into their outputs (depth-2 cleanup in
        _patch_sequence)."""
        reqs = [
            GenerateRequest(
                request_id=f"stag-{i}",
                inputs=f"staggered prompt {i}",
                parameters=GenerateParameters(max_new_tokens=3 + 2 * i),
            )
            for i in range(6)
        ]
        sync = run_batch(False, reqs)
        asy = run_batch(True, reqs, async_depth=2)
        for s, a in zip(sync, asy):
            want = len(s.outputs[0].token_ids)
            assert len(a.outputs[0].token_ids) == want
            assert len(a.outputs[0].logprobs) == want
            assert a.outputs[0].token_ids == s.outputs[0].token_ids
            assert a.outputs[0].output_text == s.outputs[0].output_text

    def test_streaming_chunks_match_final(self):
        async def scenario():
            service = make_service(True)
            task = asyncio.create_task(service.engine.run())
            fut, queue = await service.handle_request(
                GenerateRequest(
                    request_id="stream-async",
                    inputs="stream me asynchronously",
                    parameters=GenerateParameters(max_new_tokens=6),
                ),
                stream=True,
            )
            chunks = []
            while True:
                chunk = await asyncio.wait_for(queue.get(), timeout=60)
                if chunk is None:
                    break
                chunks.append(chunk)
            result = await asyncio.wait_for(fut, timeout=60)
            service.stop()
            task.cancel()
            return chunks, result

        chunks, result = asyncio.run(scenario())
        assert 1 <= len(chunks) <= 6
        assert chunks[-1].finished
        assert [c.token_id for c in chunks] == result.outputs[0].token_ids

    def test_chunked_prefill_async(self):
        reqs = greedy_requests(n=6, max_new=6, seed_text="long " * 12)
        sync = run_batch(
            False, reqs, enable_chunked_prefill=True, max_num_batched_tokens=64
        )
        asy = run_batch(
            True, reqs, enable_chunked_prefill=True, max_num_batched_tokens=64
        )
        for s, a in zip(sync, asy):
            assert a.outputs[0].token_ids == s.outputs[0].token_ids

    def test_abort_mid_flight_async(self):
        async def scenario():
            service = make_service(True)
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="abort-async",
                    inputs="a long request " * 8,
                    parameters=GenerateParameters(max_new_tokens=200),
                )
            )
            await asyncio.sleep(0.4)
            assert service.engine.abort_request("abort-async")
            result = await asyncio.wait_for(fut, timeout=60)
            service.stop()
            task.cancel()
            return result

        result = asyncio.run(scenario())
        assert len(result.outputs[0].token_ids) < 200
