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
    import argparse

    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.quant import QuantizedTensor

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=("1b", "8b"), default="1b")
    parser.add_argument(
        "--bits", type=int, default=0, choices=(0, 8),
        help="0 = bf16 weights; 8 = INT8 weights + INT8 KV (north-star "
        "config TTFT)",
    )
    args = parser.parse_args()

    if args.model == "8b":
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, head_dim=128,
            max_position_embeddings=4096, tie_word_embeddings=False,
        )
    else:
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            head_dim=64, max_position_embeddings=4096, tie_word_embeddings=True,
        )
    model = Llama(cfg, dtype=jnp.bfloat16)
    if args.bits == 8:
        L, H, I, G = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, 128
        qd = cfg.num_attention_heads * cfg.head_dim
        kvd = cfg.num_key_value_heads * cfg.head_dim

        def rand_q(key, d_in, d_out):
            return QuantizedTensor(
                qweight=jax.random.randint(
                    jax.random.PRNGKey(key), (L, d_in, d_out), -127, 127,
                    jnp.int8,
                ),
                scales=jnp.full((L, d_in // G, d_out), 0.01, jnp.bfloat16),
                bits=8, group_size=G,
            )

        params = {
            "embed": jax.random.normal(
                jax.random.PRNGKey(0), (cfg.vocab_size, H), jnp.bfloat16
            ) * 0.01,
            "layers": {
                "input_norm": jnp.ones((L, H), jnp.bfloat16),
                "q_proj": rand_q(1, H, qd), "k_proj": rand_q(2, H, kvd),
                "v_proj": rand_q(3, H, kvd), "o_proj": rand_q(4, qd, H),
                "post_norm": jnp.ones((L, H), jnp.bfloat16),
                "gate_proj": rand_q(5, H, I), "up_proj": rand_q(6, H, I),
                "down_proj": rand_q(7, I, H),
            },
            "final_norm": jnp.ones((H,), jnp.bfloat16),
            "lm_head": QuantizedTensor(
                qweight=jax.random.randint(
                    jax.random.PRNGKey(8), (H, cfg.vocab_size), -127, 127,
                    jnp.int8,
                ),
                scales=jnp.full((1, cfg.vocab_size), 0.0001, jnp.bfloat16),
                bits=8, group_size=H,
            ),
        }
    else:
        params = model.init_params(jax.random.PRNGKey(0))

    T = 512           # prompt tokens
    block_size = 32
    pages = T // block_size + 1
    num_blocks = pages + 8
    L, P_, bs_, row_ = model.kv_cache_shape(num_blocks, block_size)
    kv_dtype = jnp.int8 if args.bits == 8 else jnp.bfloat16
    kv0 = tuple(jnp.zeros((P_, bs_, row_), kv_dtype) for _ in range(L))
    if args.bits == 8:
        from atoma_infer_tpu.ops.kv_cache import alloc_kv_scales

        sc0 = tuple(alloc_kv_scales(P_, bs_) for _ in range(L))
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

    if args.bits == 8:

        @partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, kv, sc, tokens):
            hidden, kv, sc = model.forward(
                params, tokens, jnp.arange(T, dtype=jnp.int32), kv, meta,
                kv_scales=sc,
            )
            logits = model.compute_logits(params, hidden[-1:])
            return jnp.argmax(logits, -1).astype(jnp.int32), kv, sc

        tokens0 = jnp.zeros((T,), jnp.int32)
        nxt, kvs, scs = prefill(params, kv0, sc0, tokens0)
        np.asarray(nxt)
        N = 32
        ts = []
        for i in range(N):
            t0 = time.perf_counter()
            nxt, kvs, scs = prefill(params, kvs, scs, tokens0 + i % 7)
            np.asarray(nxt)
            ts.append(time.perf_counter() - t0)
    else:

        @partial(jax.jit, donate_argnums=(1,))
        def prefill(params, kv, tokens):
            hidden, kv = model.forward(
                params, tokens, jnp.arange(T, dtype=jnp.int32), kv, meta
            )
            logits = model.compute_logits(params, hidden[-1:])
            return jnp.argmax(logits, -1).astype(jnp.int32), kv

        tokens0 = jnp.zeros((T,), jnp.int32)
        nxt, kvs = prefill(params, kv0, tokens0)
        np.asarray(nxt)
        N = 32
        ts = []
        for i in range(N):
            t0 = time.perf_counter()
            nxt, kvs = prefill(params, kvs, tokens0 + i % 7)
            np.asarray(nxt)  # per-call sync: TTFT is a latency metric
            ts.append(time.perf_counter() - t0)
    ts.sort()
    p50 = ts[len(ts) // 2]
    tag = f"llama{args.model}_" + ("int8" if args.bits == 8 else "bf16")
    print(
        json.dumps(
            {
                "metric": f"prefill_ttft_p50_{tag}_512tok",
                "value": round(p50 * 1000, 2),
                "unit": "ms",
                "prefill_tokens_per_s": round(T / p50, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
