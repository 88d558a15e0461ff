"""Isolate the engine's jitted step-program cost from engine host overhead.

Builds the EXACT program the serving engine dispatches for a 256-seq decode
step (ModelWorker._step_fn with sampler, selected-token gather, feed path)
and times it two ways:
  (a) bench.py-style: chained dispatch loop, one final fetch;
  (b) engine-style: fetch tokens+logprobs every step (what PendingStep does).
The difference attributes dispatch/fetch serialization through the tunnel.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seqs", type=int, default=256)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--feed", type=int, default=1)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.config import CacheConfig, SchedulerConfig
    from atoma_infer_tpu.engine.cache_engine import CacheEngine
    from atoma_infer_tpu.engine.sampler import SamplingTensors
    from atoma_infer_tpu.engine.worker import ModelWorker
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.sampling_params import NextTokenChooserParameters

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32,
            num_key_value_heads=8, head_dim=64,
            max_position_embeddings=4096, tie_word_embeddings=True,
        )
    else:
        cfg = LlamaConfig(
            vocab_size=2048, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=32,
            max_position_embeddings=2048, tie_word_embeddings=True,
        )
        args.seqs = min(args.seqs, 32)
        args.steps = min(args.steps, 8)

    S = args.seqs
    block_size = 32
    ctx = 64  # same starting context as engine_decode_bench prompts
    total = ctx + args.steps + 2
    pages_per_seq = -(-total // block_size)
    num_blocks = S * pages_per_seq + 16

    model = Llama(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    cache_cfg = CacheConfig(
        block_size=block_size,
        num_device_blocks_override=num_blocks,
        num_host_blocks_override=8,
    )
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max(S * ctx, total + 1),
        max_num_sequences=S,
        max_model_len=total + 1,
    )
    cache_engine = CacheEngine(
        num_layers=cfg.num_hidden_layers,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        block_size=block_size,
        num_device_blocks=num_blocks,
        num_host_blocks=8,
    )
    worker = ModelWorker(model, params, cache_engine, sched_cfg, cache_cfg)

    rng = np.random.default_rng(0)
    tables_np = (
        rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    ).reshape(S, pages_per_seq).astype(np.int32)
    # Pad table width to the engine's bucket (max_pages_per_seq)
    P = worker.max_pages_per_seq
    tables_full = np.zeros((S, P), dtype=np.int32)
    tables_full[:, : min(P, pages_per_seq)] = tables_np[:, :P]

    sp = NextTokenChooserParameters()
    sampling = SamplingTensors.build([sp] * S, [[0]] * S, S, [0] * S)
    sampling_arrays = {
        "temperature": jnp.asarray(sampling.temperature),
        "top_k": jnp.asarray(sampling.top_k),
        "top_p": jnp.asarray(sampling.top_p),
        "typical_p": jnp.asarray(sampling.typical_p),
        "do_sample": jnp.asarray(sampling.do_sample),
        "seeds": jnp.asarray(sampling.seeds),
        "repetition_penalty": jnp.asarray(sampling.repetition_penalty),
        "frequency_penalty": jnp.asarray(sampling.frequency_penalty),
        "recent_tokens": jnp.asarray(sampling.recent_tokens),
    }
    tables = jnp.asarray(tables_full)
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)
    sel = jnp.arange(S, dtype=jnp.int32)
    feed = bool(args.feed)
    prev_map = jnp.arange(S, dtype=jnp.int32) if feed else None

    def dispatch(i, tokens, steps_dev):
        kv_len = ctx + i
        page = tables[jnp.arange(S), kv_len // block_size]
        slots = page * block_size + kv_len % block_size
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=jnp.full((S,), kv_len + 1, jnp.int32),
            query_start_loc=qsl,
            num_seqs=num_seqs,
            block_size=block_size,
            decode_only=True,
        )
        kv_cache, kv_scales, toks, lps, top = worker._step_fn(
            params,
            cache_engine.kv_cache,
            cache_engine.kv_scales,
            tokens,
            jnp.full((S,), kv_len, jnp.int32),
            meta,
            sel,
            sampling_arrays,
            steps_dev,
            tokens if feed else None,
            prev_map,
            needs_sampling=False,
            needs_penalties=False,
            needs_typical=False,
            top_n=0,
            spec=False,
            feed=feed,
        )
        cache_engine.kv_cache = kv_cache
        return toks, lps

    def dispatch_hostfed(i, tokens, *, refresh_sampling: bool):
        """Engine-style: every per-step input is a fresh host numpy array
        transferred via jnp.asarray (what ModelWorker.dispatch does)."""
        kv_len = ctx + i
        page = tables_full[np.arange(S), (kv_len // block_size) % P]
        slots_np = (page * block_size + kv_len % block_size).astype(np.int32)
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots_np),
            block_tables=jnp.asarray(tables_full),
            seq_lens=jnp.asarray(np.full(S, kv_len + 1, np.int32)),
            query_start_loc=jnp.asarray(np.arange(S + 1, dtype=np.int32)),
            num_seqs=jnp.asarray(np.asarray(S, np.int32)),
            block_size=block_size,
            decode_only=True,
        )
        if refresh_sampling:
            sa = {
                k: jnp.asarray(np.asarray(v))
                for k, v in sampling_np.items()
            }
        else:
            sa = sampling_arrays
        kv_cache, kv_scales, toks, lps, top = worker._step_fn(
            params,
            cache_engine.kv_cache,
            cache_engine.kv_scales,
            jnp.asarray(np.zeros(S, np.int32)),
            jnp.asarray(np.full(S, kv_len, np.int32)),
            meta,
            jnp.asarray(np.arange(S, dtype=np.int32)),
            sa,
            jnp.asarray(np.full(S, i, np.int32)),
            tokens if feed else None,
            jnp.asarray(np.arange(S, dtype=np.int32)) if feed else None,
            needs_sampling=False,
            needs_penalties=False,
            needs_typical=False,
            top_n=0,
            spec=False,
            feed=feed,
        )
        cache_engine.kv_cache = kv_cache
        return toks, lps

    sampling_np = {
        "temperature": sampling.temperature,
        "top_k": sampling.top_k,
        "top_p": sampling.top_p,
        "typical_p": sampling.typical_p,
        "do_sample": sampling.do_sample,
        "seeds": sampling.seeds,
        "repetition_penalty": sampling.repetition_penalty,
        "frequency_penalty": sampling.frequency_penalty,
        "recent_tokens": sampling.recent_tokens,
    }

    tokens = jnp.zeros((S,), jnp.int32)
    steps_dev = jnp.zeros((S,), jnp.int32)
    t0 = time.perf_counter()
    toks, lps = dispatch(0, tokens, steps_dev)
    np.asarray(toks)
    print(f"first step (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    # (a) chained, single final fetch
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch(i, toks, steps_dev + i)
    np.asarray(toks)
    dt_a = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(a) chained dispatch, final fetch:   {dt_a:.2f} ms/step", flush=True)

    # (b) fetch every step (PendingStep.complete pattern)
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch(args.steps + i, toks, steps_dev + i)
        np.asarray(toks)
        np.asarray(lps)
    dt_b = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(b) fetch-every-step:                {dt_b:.2f} ms/step", flush=True)

    # (c) host-fed args (meta/tokens/selected fresh transfers), chained
    base = 2 * args.steps
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch_hostfed(base + i, toks, refresh_sampling=False)
    np.asarray(toks)
    dt_c = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(c) host-fed meta, chained:          {dt_c:.2f} ms/step", flush=True)

    # (d) host-fed args incl. resent sampling arrays + fetch each step
    base = 3 * args.steps
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch_hostfed(base + i, toks, refresh_sampling=True)
        np.asarray(toks)
        np.asarray(lps)
    dt_d = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(d) host-fed + sampling + fetch:     {dt_d:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
