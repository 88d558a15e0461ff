"""Benchmark: decode throughput (tokens/sec/chip) on a Llama-3.2-1B-shaped
model with continuous-batching-style paged KV.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: a fully on-device N-step decode loop (each step: forward over a
64-sequence decode batch against the paged cache → argmax → tokens feed the
next step). The data dependence between steps forces real execution (the
remote-compile tunnel caches repeated identical dispatches), and matches how
the serving engine should amortize dispatch overhead (SURVEY.md §7 hard
part #3).

vs_baseline is null: the reference publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata

    on_tpu = jax.default_backend() not in ("cpu",)

    # Llama-3.2-1B shapes (random weights — perf only depends on shapes).
    cfg = LlamaConfig(
        vocab_size=128256,
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=16,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=64,
        max_position_embeddings=4096,
        tie_word_embeddings=True,
    )
    if not on_tpu:
        # CPU smoke mode for CI: shrink so the bench finishes fast.
        cfg = LlamaConfig(
            vocab_size=2048,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=32,
            max_position_embeddings=2048,
            tie_word_embeddings=True,
        )

    model = Llama(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    S = 64                      # decode batch (sequences)
    block_size = 32
    ctx = 512                   # starting context per sequence
    steps = 64 if on_tpu else 4
    pages_per_seq = (ctx + steps) // block_size + 1
    num_blocks = S * pages_per_seq + 8

    # Per-layer cache tuple: keeps every buffer donated in place (a stacked
    # array costs full-cache copies per step).
    L, P_, bs_, row_ = model.kv_cache_shape(num_blocks, block_size)
    kv_cache = tuple(
        jnp.zeros((P_, bs_, row_), dtype=jnp.bfloat16) for _ in range(L)
    )
    rng = np.random.default_rng(0)
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(
        perm.reshape(S, pages_per_seq), dtype=jnp.int32
    )
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    def decode_loop(params, kv_cache, tokens, n_steps):
        def body(i, carry):
            tokens, kv_cache = carry
            kv_len = ctx + i
            positions = jnp.full((S,), kv_len, jnp.int32)
            page = tables[jnp.arange(S), kv_len // block_size]
            slots = page * block_size + kv_len % block_size
            meta = AttentionMetadata(
                slot_mapping=slots,
                block_tables=tables,
                seq_lens=jnp.full((S,), kv_len + 1, jnp.int32),
                query_start_loc=qsl,
                num_seqs=num_seqs,
                block_size=block_size,
            )
            hidden, kv_cache = model.forward(
                params, tokens, positions, kv_cache, meta
            )
            logits = model.compute_logits(params, hidden)
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tokens, kv_cache

        return jax.lax.fori_loop(0, n_steps, body, (tokens, kv_cache))

    run = jax.jit(decode_loop, static_argnames=("n_steps",), donate_argnums=(1,))

    tokens0 = jnp.zeros((S,), jnp.int32)
    # Warm up (compile); time by fetching data — through the remote tunnel
    # block_until_ready does not reliably wait, and repeat dispatches of
    # identical computations are cached, so the loop is chained (tokens feed
    # the next step) and a short-run baseline is subtracted.
    t, kv_cache = run(params, kv_cache, tokens0, 2)
    np.asarray(t)

    t0 = time.perf_counter()
    t, kv_cache = run(params, kv_cache, t, 2)
    np.asarray(t)
    base = time.perf_counter() - t0

    t0 = time.perf_counter()
    t, kv_cache = run(params, kv_cache, t, 2 + steps)
    np.asarray(t)
    dt = max(time.perf_counter() - t0 - base, 1e-9)

    tokens_per_s = S * steps / dt
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_llama1b_bf16",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
