"""Full-service integration tests (the reference's MockModel tier
— backends/vllm/src/tests/mod.rs:166-352 — with a tiny random-weight real
model instead of a mock, since CPU JAX runs it fast).

Drives tokenize → validate → schedule → worker → sample → detokenize →
stream/finish for many concurrent requests through the asyncio engine loop.
"""

import asyncio

import jax.numpy as jnp
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


def make_service(best_of=1, **scheduler_overrides) -> LlmService:
    model, params, tokenizer = build_tiny_random()
    sched = dict(
        max_num_batched_tokens=512,
        max_num_sequences=16,
        max_model_len=512,
        enable_chunked_prefill=False,
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
        validation=ValidationConfig(
            best_of=best_of, max_input_tokens=256, max_total_tokens=512
        ),
    )
    return LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )


def run(coro):
    return asyncio.run(coro)


class TestEngineIntegration:
    def test_many_concurrent_requests(self):
        async def scenario():
            service = make_service()
            task = asyncio.create_task(service.engine.run())
            futs = []
            for i in range(32):
                fut = await service.handle_request(
                    GenerateRequest(
                        request_id=f"req-{i}",
                        inputs=f"prompt number {i} " * (1 + i % 5),
                        parameters=GenerateParameters(max_new_tokens=8),
                    )
                )
                futs.append(fut)
            results = await asyncio.wait_for(asyncio.gather(*futs), timeout=120)
            service.stop()
            task.cancel()
            return results

        results = run(scenario())
        assert len(results) == 32
        for r in results:
            assert len(r.outputs) == 1
            # The random model may emit EOS early ("stopped"); otherwise the
            # budget caps it.
            assert 1 <= len(r.outputs[0].token_ids) <= 8
            assert r.outputs[0].finish_reason in ("length_capped", "stopped")
            assert r.metrics.first_token_time is not None

    def test_streaming(self):
        async def scenario():
            service = make_service()
            task = asyncio.create_task(service.engine.run())
            fut, queue = await service.handle_request(
                GenerateRequest(
                    request_id="stream-1",
                    inputs="stream me",
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

        chunks, result = run(scenario())
        assert 1 <= len(chunks) <= 6
        assert chunks[-1].finished
        assert [c.token_id for c in chunks] == result.outputs[0].token_ids

    def test_sampled_determinism_by_seed(self):
        async def scenario(seed):
            service = make_service()
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="s",
                    inputs="sampling test",
                    parameters=GenerateParameters(
                        max_new_tokens=8,
                        do_sample=True,
                        temperature=1.0,
                        top_k=40,
                        seed=seed,
                    ),
                )
            )
            r = await asyncio.wait_for(fut, timeout=60)
            service.stop()
            task.cancel()
            return r.outputs[0].token_ids

        a = run(scenario(7))
        b = run(scenario(7))
        c = run(scenario(8))
        assert a == b
        assert a != c  # overwhelmingly likely

    def test_chunked_prefill_mode(self):
        async def scenario():
            service = make_service(
                enable_chunked_prefill=True, max_num_batched_tokens=64
            )
            task = asyncio.create_task(service.engine.run())
            # Prompt longer than the per-step token budget → multiple chunks.
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="chunky",
                    inputs="x" * 150,
                    parameters=GenerateParameters(max_new_tokens=4),
                )
            )
            r = await asyncio.wait_for(fut, timeout=120)
            service.stop()
            task.cancel()
            return r

        r = run(scenario())
        assert 1 <= len(r.outputs[0].token_ids) <= 4

    def test_warmup_then_serve(self):
        """service.warmup pre-runs the bucket executables (VERDICT r4 next
        #1: the profile-then-serve startup analog) and leaves the engine
        fully serviceable: no leaked groups/blocks, real requests work."""
        async def scenario():
            service = make_service()
            task = asyncio.create_task(service.engine.run())
            dt = await service.warmup(num_seqs=4, prompt_len=16)
            assert dt > 0
            # Warmup requests are fully retired — nothing lingers.
            assert not service.engine._groups or all(
                not rid.startswith("_warmup")
                for rid in service.engine._groups
            )
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="after-warmup",
                    inputs="hello there",
                    parameters=GenerateParameters(max_new_tokens=8),
                )
            )
            r = await asyncio.wait_for(fut, timeout=120)
            service.stop()
            task.cancel()
            return r

        r = run(scenario())
        assert len(r.outputs[0].token_ids) >= 1

    def test_validation_rejects_bad_params(self):
        async def scenario():
            service = make_service()
            from atoma_infer_tpu.engine.validation import ValidationError

            with pytest.raises(ValidationError):
                await service.handle_request(
                    GenerateRequest(
                        request_id="bad",
                        inputs="x",
                        parameters=GenerateParameters(temperature=-1.0),
                    )
                )
            with pytest.raises(ValidationError):
                await service.handle_request(
                    GenerateRequest(
                        request_id="bad2",
                        inputs="y",
                        parameters=GenerateParameters(top_p=1.5),
                    )
                )
            service.stop()

        run(scenario())

    def test_abort_mid_flight(self):
        async def scenario():
            service = make_service()
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="victim",
                    inputs="abort me please",
                    parameters=GenerateParameters(max_new_tokens=64),
                )
            )
            await asyncio.sleep(0.3)  # let it start decoding
            aborted = service.engine.abort_request("victim")
            r = await asyncio.wait_for(fut, timeout=60)
            service.stop()
            task.cancel()
            return aborted, r

        aborted, r = run(scenario())
        assert aborted
        assert r.outputs[0].finish_reason == "aborted"
        # Lazy detokenization (plain request: no stream, no stop strings)
        # decodes nothing per token; the abort path must still return the
        # partial text for the tokens generated so far (ADVICE r4).
        if r.outputs[0].token_ids:
            assert r.outputs[0].output_text


class TestInt8KvService:
    def test_int8_kv_end_to_end(self):
        """Full service with kv_cache_dtype=int8: greedy decode tokens match
        the bf16-cache run for the first steps (drift gate at service level)."""
        import jax.numpy as jnp
        from atoma_infer_tpu.config import (
            CacheConfig,
            EngineConfig,
            ModelConfig,
            SchedulerConfig,
            ValidationConfig,
        )
        from atoma_infer_tpu.entrypoints.offline import build_tiny_random

        def run(kv_dtype):
            model, params, tokenizer = build_tiny_random()
            config = EngineConfig(
                model=ModelConfig(
                    model_name="tiny-random",
                    dtype="float32",
                    kv_cache_dtype=kv_dtype,
                ),
                cache=CacheConfig(
                    block_size=16,
                    num_device_blocks_override=128,
                    num_host_blocks_override=32,
                ),
                scheduler=SchedulerConfig(
                    max_num_batched_tokens=512,
                    max_num_sequences=16,
                    max_model_len=512,
                ),
                validation=ValidationConfig(
                    max_input_tokens=256, max_total_tokens=512
                ),
            )
            service = LlmService.start(
                config, model=model, params=params, tokenizer=tokenizer
            )

            async def go():
                task = asyncio.create_task(service.engine.run())
                fut = await service.handle_request(
                    GenerateRequest(
                        request_id="q",
                        inputs="int8 kv cache test prompt",
                        parameters=GenerateParameters(max_new_tokens=8),
                    )
                )
                r = await asyncio.wait_for(fut, timeout=60)
                service.stop()
                task.cancel()
                return r.outputs[0].token_ids

            return run_coro(go())

        def run_coro(coro):
            return asyncio.run(coro)

        dense = run(None)
        quant = run("int8")
        assert len(quant) >= 1
        # Greedy paths agree at least initially (tiny random model, fp32).
        assert dense[0] == quant[0]
        # FP8 KV (e4m3, scale-free, XLA attention path) serves end-to-end
        # with the same initial greedy agreement.
        fp8 = run("fp8")
        assert len(fp8) >= 1
        assert dense[0] == fp8[0]


class TestLongContextPressure:
    def test_long_prompts_chunked_prefill_with_preemption(self):
        """BASELINE config #4 shape at test scale: prompts far over the
        per-step budget under a tight block pool — chunked prefill + swap /
        recompute preemption must still complete every request."""
        async def scenario():
            service = make_service(
                enable_chunked_prefill=True,
                max_num_batched_tokens=64,
                max_num_sequences=8,
                max_model_len=1024,
            )
            # Tighten the device pool so decode forces preemption.
            task = asyncio.create_task(service.engine.run())
            futs = []
            for i in range(6):
                fut = await service.handle_request(
                    GenerateRequest(
                        request_id=f"long-{i}",
                        inputs="y" * 200,
                        parameters=GenerateParameters(max_new_tokens=6),
                    )
                )
                futs.append(fut)
            results = await asyncio.wait_for(asyncio.gather(*futs), timeout=180)
            service.stop()
            task.cancel()
            # All blocks reclaimed after completion (leak check — the verify
            # skill's library invariant).
            free = service.engine.scheduler.block_manager.get_num_free_device_blocks()
            return results, free

        results, free = run(scenario())
        assert len(results) == 6
        for r in results:
            assert 1 <= len(r.outputs[0].token_ids) <= 6
        assert free == 128  # full pool back


class TestBestOf:
    def test_best_of_returns_top_n(self):
        async def scenario():
            service = make_service(best_of=4)
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="bo",
                    inputs="pick the best",
                    parameters=GenerateParameters(
                        max_new_tokens=6,
                        best_of=3,
                        n=1,
                        do_sample=True,
                        temperature=1.0,
                        seed=3,
                    ),
                )
            )
            r = await asyncio.wait_for(fut, timeout=120)
            service.stop()
            task.cancel()
            return r

        r = run(scenario())
        # 3 candidates generated, 1 returned — the highest-logprob one.
        assert len(r.outputs) == 1


class TestSwapPressure:
    def test_swap_round_trip_outputs_identical(self):
        """Force preemption-by-swap (best_of groups under a tight block
        pool) and assert swaps actually happened AND outputs are
        token-identical to an unpressured run — KV contents must survive
        the device→host→device round trip, and seeded sampling must replay
        identically regardless of scheduling (BASELINE #4 stress shape)."""

        def run_with(blocks):
            async def scenario():
                service = make_service(
                    best_of=4,
                    max_num_batched_tokens=256,
                    max_num_sequences=8,
                    max_model_len=256,
                )
                bm = service.engine.scheduler.block_manager
                ce = service.engine.worker.cache_engine
                # Tighten the pool after startup profiling.
                if blocks is not None:
                    from atoma_infer_tpu.core.block_manager import (
                        BlockSpaceManager,
                    )
                    new_bm = BlockSpaceManager(
                        block_size=16,
                        num_device_blocks=blocks,
                        num_host_blocks=64,
                    )
                    service.engine.scheduler.block_manager = new_bm
                swaps = {"out": 0, "in": 0}
                orig_out, orig_in = ce.swap_out, ce.swap_in

                def spy_out(mapping):
                    swaps["out"] += len(mapping)
                    return orig_out(mapping)

                def spy_in(mapping):
                    swaps["in"] += len(mapping)
                    return orig_in(mapping)

                ce.swap_out, ce.swap_in = spy_out, spy_in

                task = asyncio.create_task(service.engine.run())
                futs = []
                for i in range(4):
                    fut = await service.handle_request(
                        GenerateRequest(
                            request_id=f"swap-{i}",
                            inputs=f"pressure prompt {i} " * 4,
                            parameters=GenerateParameters(
                                max_new_tokens=24,
                                best_of=2,
                                do_sample=True,
                                temperature=0.8,
                                seed=1234 + i,
                            ),
                        )
                    )
                    futs.append(fut)
                results = await asyncio.wait_for(
                    asyncio.gather(*futs), timeout=180
                )
                service.stop()
                task.cancel()
                return results, swaps

            return run(scenario())

        base, base_swaps = run_with(None)           # ample pool
        tight, tight_swaps = run_with(12)           # forces swap preemption
        assert base_swaps["out"] == 0
        assert tight_swaps["out"] > 0 and tight_swaps["in"] > 0
        for rb, rt in zip(base, tight):
            toks_b = sorted(tuple(o.token_ids) for o in rb.outputs)
            toks_t = sorted(tuple(o.token_ids) for o in rt.outputs)
            assert toks_b == toks_t


class TestRandomPhysicalBlockOrder:
    """Physical-layout independence (ref: the random-block-order decode test
    on real weights, models/src/llama_nccl.rs:361-613): shuffling the block
    allocator's free list — so every sequence's KV pages land at arbitrary
    physical block numbers — must not change a single output token. Pins the
    block-table indirection through prefill KV writes, decode attention
    reads, CoW and sampling, end to end."""

    def _run(self, shuffle: bool):
        import random
        from collections import deque

        async def scenario():
            # Python block manager: its allocator free list is a plain deque
            # we can shuffle (the native core allocates by its own order).
            service = make_service(use_native_core=False)
            if shuffle:
                alloc = (
                    service.engine.scheduler.block_manager.device_allocator
                )
                blocks = list(alloc.free_blocks)
                random.Random(1234).shuffle(blocks)
                alloc.free_blocks = deque(blocks)
            task = asyncio.create_task(service.engine.run())
            futs = []
            for i in range(8):
                futs.append(
                    await service.handle_request(
                        GenerateRequest(
                            request_id=f"blk-{i}",
                            inputs=f"physical order {i} " * (1 + i % 3),
                            parameters=GenerateParameters(max_new_tokens=20),
                        )
                    )
                )
            results = await asyncio.wait_for(
                asyncio.gather(*futs), timeout=120
            )
            service.stop()
            task.cancel()
            return results

        return run(scenario())

    def test_outputs_identical_under_shuffled_blocks(self):
        seq = self._run(shuffle=False)
        shuf = self._run(shuffle=True)
        for a, b in zip(seq, shuf):
            assert a.outputs[0].token_ids == b.outputs[0].token_ids
            assert a.outputs[0].logprobs == pytest.approx(
                b.outputs[0].logprobs, abs=1e-4
            )


class TestPersistentFailureStops:
    """A step error that never clears (e.g. a program that cannot compile
    in HBM) must not spin the liveness loop forever: after
    MAX_STEP_FAILURES consecutive failures the engine fails outstanding
    request futures and stops."""

    def test_outstanding_futures_fail(self):
        async def scenario():
            service = make_service()

            def boom():
                raise RuntimeError("synthetic persistent failure")

            service.engine.step = boom
            task = asyncio.create_task(service.engine.run())
            fut = await service.handle_request(
                GenerateRequest(
                    request_id="doomed",
                    inputs="hello",
                    parameters=GenerateParameters(max_new_tokens=4),
                )
            )
            with pytest.raises(RuntimeError, match="persistently"):
                await asyncio.wait_for(fut, timeout=60)
            await asyncio.wait_for(task, timeout=60)  # loop exited
            return True

        assert run(scenario())
