"""Serving benchmark: request throughput + TTFT through the full engine.

Measures the BASELINE.md north-star serving metrics (p50/p90 TTFT, request
and token throughput, KV blocks/GB HBM) by driving the continuous-batching
engine with a Poisson-ish arrival pattern — the library-level analog of the
reference's cadence test (backends/vllm/src/tests/mod.rs:166-352), with real
timing instead of wave-count assertions.

Usage:
    python benchmarks/serve_bench.py --cpu              # tiny smoke model
    python benchmarks/serve_bench.py --model /path/to/Llama-3.2-1B \
        --dtype bfloat16 --requests 64 --input-len 512 --max-tokens 64
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


async def run_bench(args) -> dict:
    from atoma_infer_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        ValidationConfig,
    )
    from atoma_infer_tpu.engine.llm_service import LlmService
    from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

    config = EngineConfig(
        model=ModelConfig(model_name=args.model, dtype=args.dtype),
        cache=CacheConfig(
            block_size=args.block_size,
            num_device_blocks_override=args.num_blocks,
            num_host_blocks_override=(args.num_blocks or 256) // 2,
        ),
        scheduler=SchedulerConfig(
            max_num_batched_tokens=args.max_batched_tokens,
            max_num_sequences=args.max_seqs,
            max_model_len=args.max_model_len,
            enable_chunked_prefill=args.chunked_prefill,
            async_scheduling=args.async_scheduling,
        ),
        validation=ValidationConfig(
            max_input_tokens=args.max_model_len - args.max_tokens - 1,
            max_total_tokens=args.max_model_len,
        ),
    )
    service = LlmService.start(config)
    engine_task = asyncio.create_task(service.engine.run())

    prompt = "benchmark " * (args.input_len // 10)
    # Warm up compiles with one request.
    warm = await service.handle_request(
        GenerateRequest(
            request_id="warmup",
            inputs=prompt,
            parameters=GenerateParameters(max_new_tokens=2),
        )
    )
    await warm

    t0 = time.monotonic()
    futs = []
    for i in range(args.requests):
        fut = await service.handle_request(
            GenerateRequest(
                request_id=f"bench-{uuid.uuid4().hex[:8]}",
                inputs=prompt,
                parameters=GenerateParameters(max_new_tokens=args.max_tokens),
            )
        )
        futs.append(fut)
        if args.arrival_delay_ms:
            await asyncio.sleep(args.arrival_delay_ms / 1000)
    results = await asyncio.gather(*futs)
    wall = time.monotonic() - t0

    ttfts = sorted(
        r.metrics.first_token_time - r.metrics.arrival_time for r in results
    )
    total_tokens = sum(len(o.token_ids) for r in results for o in r.outputs)
    total_prompt = sum(len(r.prompt_token_ids) for r in results)

    cache_cfg = config.cache
    model_cfg = service.engine.worker.model.config
    block_bytes = cache_cfg.block_bytes(
        model_cfg.num_layers,
        model_cfg.num_kv_heads,
        model_cfg.head_dim,
        config.model.kv_dtype_size,
    )
    service.stop()
    engine_task.cancel()

    def pct(v, p):
        return v[min(len(v) - 1, int(p * len(v)))]

    return {
        "requests": args.requests,
        "wall_s": round(wall, 3),
        "requests_per_s": round(args.requests / wall, 2),
        "decode_tokens_per_s": round(total_tokens / wall, 1),
        "prefill_tokens": total_prompt,
        "ttft_p50_s": round(pct(ttfts, 0.50), 4),
        "ttft_p90_s": round(pct(ttfts, 0.90), 4),
        "ttft_p99_s": round(pct(ttfts, 0.99), 4),
        "kv_blocks_per_gb_hbm": round((1 << 30) / block_bytes, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="tiny-random")
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--requests", type=int, default=32)
    parser.add_argument("--input-len", type=int, default=100)
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--num-blocks", type=int, default=512)
    parser.add_argument("--max-batched-tokens", type=int, default=2048)
    parser.add_argument("--max-seqs", type=int, default=64)
    parser.add_argument("--max-model-len", type=int, default=2048)
    parser.add_argument("--chunked-prefill", action="store_true")
    parser.add_argument("--async-scheduling", action="store_true")
    parser.add_argument("--arrival-delay-ms", type=float, default=0.0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(asyncio.run(run_bench(args))))


if __name__ == "__main__":
    main()
