"""Prefill throughput + single-request TTFT (BASELINE north-star p50 TTFT).

Measures the jitted prefill step (512-token prompt, Llama-3.2-1B shapes) —
the device-side component of TTFT (scheduler/tokenizer overhead is
microseconds; HTTP adds network latency).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata

    cfg = LlamaConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True,
    )
    model = Llama(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    T = 512           # prompt tokens
    block_size = 32
    pages = T // block_size + 1
    num_blocks = pages + 8
    L, P_, bs_, row_ = model.kv_cache_shape(num_blocks, block_size)
    kv0 = tuple(jnp.zeros((P_, bs_, row_), jnp.bfloat16) for _ in range(L))
    tables = jnp.asarray([list(range(1, pages + 1))], jnp.int32)
    slots = (
        tables[0, jnp.arange(T) // block_size] * block_size
        + jnp.arange(T) % block_size
    ).astype(jnp.int32)
    meta = AttentionMetadata(
        slot_mapping=slots,
        block_tables=tables,
        seq_lens=jnp.asarray([T], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray(1, jnp.int32),
        block_size=block_size,
    )

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, kv, tokens):
        hidden, kv = model.forward(
            params, tokens, jnp.arange(T, dtype=jnp.int32), kv, meta
        )
        logits = model.compute_logits(params, hidden[-1:])
        return jnp.argmax(logits, -1).astype(jnp.int32), kv

    tokens0 = jnp.zeros((T,), jnp.int32)
    nxt, kv = prefill(params, kv0, tokens0)
    np.asarray(nxt)

    N = 32
    ts = []
    kvs = kv
    for i in range(N):
        t0 = time.perf_counter()
        nxt, kvs = prefill(params, kvs, tokens0 + i % 7)
        np.asarray(nxt)  # per-call sync: TTFT is a latency metric
        ts.append(time.perf_counter() - t0)
    ts.sort()
    p50 = ts[len(ts) // 2]
    print(
        json.dumps(
            {
                "metric": "prefill_ttft_p50_llama1b_bf16_512tok",
                "value": round(p50 * 1000, 2),
                "unit": "ms",
                "prefill_tokens_per_s": round(T / p50, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
