"""BASELINE config #4: Llama-3.1-8B INT4 weight-only, 32k prompt, chunked
prefill + KV block swap/evict under memory pressure.

Drives the FULL engine (scheduler + block manager + cache engine + worker),
not a hand-built step: a short request is admitted first and decodes; then a
32k-token prompt arrives and chunk-prefills through a device block pool sized
so the scheduler must preempt-swap the first request out (device→host) and
later swap it back in to finish. Measures:
  - 32k chunked-prefill TTFT and prefill tok/s (INT4 8B, chunk = 2048)
  - decode tok/s at 32k context
  - swap traffic actually executed (blocks out/in — asserts pressure was real)

Random INT4 weights (perf depends only on shapes); ByteTokenizer maps one
char → one token so prompt length is exact. ``--cpu`` shrinks to a smoke
model for CI.

Usage:
    python benchmarks/longctx_int4_bench.py            # real TPU, ~8B INT4
    python benchmarks/longctx_int4_bench.py --cpu      # tiny CPU smoke
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_model(cpu: bool):
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.entrypoints.offline import ByteTokenizer
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.quant import QuantizedTensor

    if cpu:
        cfg = LlamaConfig(
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=4096,
            rope_theta=10000.0,
            tie_word_embeddings=True,
            eos_token_ids=(1,),
            bos_token_id=0,
        )
        model = Llama(cfg, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        return model, params, ByteTokenizer(cfg.vocab_size)

    # Llama-3.1-8B shapes, INT4 weight-only (~3.6GB packed + scales).
    cfg = LlamaConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        max_position_embeddings=40960,
        tie_word_embeddings=False,
        eos_token_ids=(1,),
        bos_token_id=0,
    )
    model = Llama(cfg, dtype=jnp.bfloat16)
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    G = 128

    def rand_q(key, d_in, d_out):
        k1, _ = jax.random.split(jax.random.PRNGKey(key))
        # INT4 packing: two nibbles per int8 byte → [L, d_in//2, d_out].
        qw = jax.random.randint(k1, (L, d_in // 2, d_out), -127, 127, jnp.int8)
        scales = jnp.full((L, d_in // G, d_out), 0.01, jnp.bfloat16)
        return QuantizedTensor(qweight=qw, scales=scales, bits=4, group_size=G)

    params = {
        "embed": jax.random.normal(
            jax.random.PRNGKey(0), (cfg.vocab_size, H), jnp.bfloat16
        )
        * 0.01,
        "layers": {
            "input_norm": jnp.ones((L, H), jnp.bfloat16),
            "q_proj": rand_q(1, H, 4096),
            "k_proj": rand_q(2, H, 1024),
            "v_proj": rand_q(3, H, 1024),
            "o_proj": rand_q(4, 4096, H),
            "post_norm": jnp.ones((L, H), jnp.bfloat16),
            "gate_proj": rand_q(5, H, I),
            "up_proj": rand_q(6, H, I),
            "down_proj": rand_q(7, I, H),
        },
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head": jax.random.normal(
            jax.random.PRNGKey(8), (H, cfg.vocab_size), jnp.bfloat16
        )
        * 0.01,
    }
    return model, params, ByteTokenizer(cfg.vocab_size)


async def run(args) -> dict:
    from atoma_infer_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        ValidationConfig,
    )
    from atoma_infer_tpu.engine.llm_service import LlmService
    from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

    model, params, tokenizer = build_model(args.cpu)

    if args.cpu:
        prompt_len, short_len, chunk = 768, 160, 256
        # Pool: long holds 49 blocks; two best_of=2 shorts (10-block shared
        # prompts + diverging tails) overflow the remainder → the scheduler
        # must preempt a short BY SWAP (multi-seq groups swap, single-seq
        # recompute — ref scheduler.rs:1778-1826) and swap it back later.
        device_blocks, host_blocks = 74, 64
        block_size, max_model_len = 16, 2048
        short_tokens, long_tokens, n_short = 48, 8, 2
    else:
        prompt_len, short_len, chunk = 32768, 2048, 2048
        block_size, max_model_len = 32, 33792
        # One 32k seq = 1025 blocks (4MB/block at 8B shapes, ~4GB). The
        # admission watermark (1% ≈ 13 blocks) guarantees every admitted
        # group lands with ≥13 free, so pressure must come from DECODE
        # GROWTH of the admitted set: long (1025, decoding 256 tokens so it
        # stays resident) + three best_of=2 2k-prompt groups (64 shared
        # blocks each) admit with 23 free; their 6 tails grow ~0.19
        # blocks/step and exhaust the allocator after ~120 decode steps —
        # well inside the long request's 256-step residency → forced
        # preempt-by-swap of the youngest group (device→host over the
        # tunnel) and swap-in later. (Growth is a RATE: at a 1290 pool the
        # long request finished before ~390 steps of growth ran dry.)
        device_blocks, host_blocks = 1240, 512
        short_tokens, long_tokens, n_short = 512, 256, 3

    config = EngineConfig(
        model=ModelConfig(model_name="injected", quantization="int4"),
        cache=CacheConfig(
            block_size=block_size,
            num_device_blocks_override=device_blocks,
            num_host_blocks_override=host_blocks,
        ),
        scheduler=SchedulerConfig(
            max_num_batched_tokens=chunk,
            max_num_sequences=8,
            max_model_len=max_model_len,
            enable_chunked_prefill=True,
        ),
        validation=ValidationConfig(
            max_input_tokens=max_model_len - 1024,
            max_total_tokens=max_model_len,
            best_of=2,
        ),
    )
    service = LlmService.start(
        config, model=model, params=params, tokenizer=tokenizer
    )
    engine_task = asyncio.create_task(service.engine.run())

    # Count the swap traffic the worker actually executes.
    cache_engine = service.engine.worker.cache_engine
    swaps = {"out": 0, "in": 0}
    real_execute = cache_engine.execute

    def counting_execute(swap_in, swap_out, copies):
        swaps["in"] += len(swap_in or ())
        swaps["out"] += len(swap_out or ())
        return real_execute(swap_in, swap_out, copies)

    cache_engine.execute = counting_execute

    # Warm up compiles with a FULL-LENGTH prompt: every chunked-prefill and
    # decode bucket the measured request will hit compiles here, so the
    # measured TTFT is the steady-state number, not first-compile latency
    # (remote compiles are minutes per program shape).
    warm = await service.handle_request(
        GenerateRequest(
            request_id="warmup",
            inputs="w" * prompt_len,
            parameters=GenerateParameters(max_new_tokens=4),
        )
    )
    await warm
    print("# warmup done", file=sys.stderr)

    t0 = time.monotonic()
    long_fut = await service.handle_request(
        GenerateRequest(
            request_id="long32k",
            inputs="l" * prompt_len,
            parameters=GenerateParameters(max_new_tokens=long_tokens),
        )
    )
    # The 32k prompt is admitted first (it needs most of the pool); the
    # best_of groups arrive while it chunk-prefills and create the decode
    # pressure that forces a swap preemption.
    await asyncio.sleep(0.1)
    short_futs = [
        await service.handle_request(
            GenerateRequest(
                request_id=f"short-{i}",
                inputs="s" * short_len,
                parameters=GenerateParameters(
                    max_new_tokens=short_tokens,
                    best_of=2,
                    do_sample=True,
                    temperature=0.8,
                    seed=99 + i,
                ),
            )
        )
        for i in range(n_short)
    ]
    long_res, *short_res = await asyncio.gather(long_fut, *short_futs)
    wall = time.monotonic() - t0

    # All must complete with their full budgets (correctness under swap).
    assert len(long_res.outputs[0].token_ids) == long_tokens, long_res
    for r in short_res:
        assert len(r.outputs[0].token_ids) == short_tokens, r

    ttft_long = (
        long_res.metrics.first_token_time - long_res.metrics.arrival_time
    )
    decode_tokens = long_tokens + n_short * short_tokens
    block_bytes = config.cache.block_bytes(
        model.config.num_layers,
        model.config.num_kv_heads,
        model.config.head_dim,
        config.model.kv_dtype_size,
    )
    service.stop()
    engine_task.cancel()

    assert swaps["out"] > 0, "no swap-out executed — pool not under pressure"
    assert swaps["in"] > 0, "no swap-in executed — victim never restored"

    return {
        "metric": "longctx_int4_ttft_32k_s",
        "value": round(ttft_long, 3),
        "unit": "s",
        "vs_baseline": None,
        "detail": {
            "prefill_tokens_per_s": round(prompt_len / ttft_long, 1),
            "decode_tokens": decode_tokens,
            "wall_s": round(wall, 2),
            "swapped_blocks_out": swaps["out"],
            "swapped_blocks_in": swaps["in"],
            "swap_bytes_out": swaps["out"] * block_bytes,
            "kv_blocks_per_gb_hbm": round((1 << 30) / block_bytes, 1),
        },
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(asyncio.run(run(args))))


if __name__ == "__main__":
    main()
