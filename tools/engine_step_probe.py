"""Isolate the engine's jitted step-program cost from engine host overhead.

Builds the EXACT program the serving engine dispatches for a 256-seq decode
step (ModelWorker._invoke: packed-metadata transfer + sampler + feed path)
and times it two ways:
  (a) bench.py-style: chained dispatch loop, one final fetch;
  (b) engine-style: fetch tokens+logprobs every step (what PendingStep does).
The difference attributes dispatch/fetch serialization through the tunnel.

This probe found the round-3→4 engine gap: the step program and its
transfers were fine (~10-13 ms chained) — per-step fetch round-trips and
in-window compiles were the cost (see engine_decode_bench).
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
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.config import CacheConfig, SchedulerConfig
    from atoma_infer_tpu.engine.cache_engine import CacheEngine
    from atoma_infer_tpu.engine.input_prep import ModelInput
    from atoma_infer_tpu.engine.sampler import SamplingTensors
    from atoma_infer_tpu.engine.worker import ModelWorker, _pack_outputs
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
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
    ctx = 64
    total = ctx + 2 * args.steps + 2
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
    P = worker.max_pages_per_seq
    tables = np.zeros((S, P), dtype=np.int32)
    perm = (
        rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    ).reshape(S, pages_per_seq)
    tables[:, : min(P, pages_per_seq)] = perm[:, :P]

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
    zero_steps = np.zeros(S, dtype=np.int32)

    def model_input_for(i: int) -> ModelInput:
        kv_len = ctx + i
        page = tables[np.arange(S), (kv_len // block_size) % P]
        slots = (page * block_size + kv_len % block_size).astype(np.int32)
        return ModelInput(
            token_ids=np.zeros(S, np.int32),  # overridden by feed
            positions=np.full(S, kv_len, np.int32),
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=np.full(S, kv_len + 1, np.int32),
            query_start_loc=np.arange(S + 1, dtype=np.int32),
            num_seqs=np.asarray(S, dtype=np.int32),
            selected_token_indices=np.arange(S, dtype=np.int32),
            sample_mask=np.ones(S, bool),
            seq_ids=list(range(S)),
            request_ids=[f"r{j}" for j in range(S)],
            num_prefills=0,
        )

    prev_map = np.arange(S, dtype=np.int32)

    def dispatch(i, prev_tokens):
        toks, lps, top = worker._invoke(
            model_input_for(i), sampling_arrays, zero_steps, sampling,
            prev=(prev_tokens, prev_map),
        )
        return toks, lps

    tokens = jnp.zeros((S,), jnp.int32)
    t0 = time.perf_counter()
    toks, lps = dispatch(0, tokens)
    np.asarray(toks)
    print(f"first step (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    # (a) chained, single final fetch
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch(i, toks)
    np.asarray(toks)
    dt_a = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(a) chained dispatch, final fetch:   {dt_a:.2f} ms/step", flush=True)

    # (b) packed fetch every step (PendingStep pattern)
    t0 = time.perf_counter()
    for i in range(1, 1 + args.steps):
        toks, lps = dispatch(args.steps + i, toks)
        packed = _pack_outputs(toks, lps)
        packed.copy_to_host_async()
        np.asarray(packed)
    dt_b = (time.perf_counter() - t0) / args.steps * 1000
    print(f"(b) packed fetch-every-step:         {dt_b:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
