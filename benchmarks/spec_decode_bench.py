"""Speculative-decoding step benchmark: verify-step cost vs plain decode.

Speculative decoding (engine/spec_decode.py) replaces a 1-token decode step
with a (1+K)-token verification step per sequence. Its win is bounded by two
measurables: how much MORE a verify step costs (it rides the same weights
read, so ideally ≪ (1+K)×), and the draft acceptance rate the workload
yields. This benchmark measures the first on real shapes and reports the
effective tokens/s as a function of the second:

    eff(α) = S · (1 + E[m]) / t_verify,   E[m] = Σ_{j=1..K} α^j
    breakeven α*:  eff(α*) = S / t_decode

Methodology follows bench.py (engine-style dispatch loop, donated caches,
device-resident tokens; lax.fori_loop and lone-op timings are unreliable on
the tunneled TPU — see CLAUDE.md). Random weights: step cost depends only on
shapes; acceptance is workload-dependent and reported as the independent
variable. Prints ONE JSON line.

Usage:
    python benchmarks/spec_decode_bench.py            # real TPU, 1B shapes
    python benchmarks/spec_decode_bench.py --cpu      # tiny smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--seqs", type=int, default=None)
    parser.add_argument("--spec-tokens", type=int, default=4)
    parser.add_argument("--block-size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata

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

    model = Llama(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    K = args.spec_tokens
    # Spec decode targets latency-bound (small/medium batch) serving.
    S = args.seqs or (64 if on_tpu else 8)
    bs = args.block_size
    ctx = 512 if on_tpu else 64
    steps = args.steps or (64 if on_tpu else 4)
    max_len = ctx + steps * (1 + K) + 1
    pages_per_seq = max_len // bs + 1
    num_blocks = S * pages_per_seq + 8

    L, P_, bs_, row_ = model.kv_cache_shape(num_blocks, bs)
    rng = np.random.default_rng(0)
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    def fresh_cache():
        return tuple(
            jnp.zeros((P_, bs_, row_), dtype=jnp.bfloat16) for _ in range(L)
        )

    # ---------------- plain decode step (bench.py shape) ----------------
    qsl1 = jnp.arange(S + 1, dtype=jnp.int32)

    @jax.jit
    def meta_decode(kv_len):
        page = tables[jnp.arange(S), kv_len // bs]
        slots = page * bs + kv_len % bs
        return (
            jnp.full((S,), kv_len, jnp.int32),
            slots,
            jnp.full((S,), kv_len + 1, jnp.int32),
        )

    @partial(jax.jit, donate_argnums=(1,))
    def step_decode(params, kv_cache, tokens, positions, slots, seq_lens):
        meta = AttentionMetadata(
            slot_mapping=slots, block_tables=tables, seq_lens=seq_lens,
            query_start_loc=qsl1, num_seqs=num_seqs, block_size=bs,
            decode_only=True,
        )
        hidden, kv_cache = model.forward(
            params, tokens, positions, kv_cache, meta
        )
        logits = model.compute_logits(params, hidden)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_cache

    # ---------------- verify step: (1+K)-token ragged chunks -------------
    Q = 1 + K
    T = S * Q
    qslv = jnp.arange(0, T + 1, Q, dtype=jnp.int32)
    # Verification rows: all Q rows per sequence (worker gathers [S, K+1]).
    vrows = (jnp.arange(S)[:, None] * Q + jnp.arange(Q)[None, :]).reshape(-1)

    @jax.jit
    def meta_verify(kv_len0):
        # Sequence s verifies positions kv_len0-1 .. kv_len0-1+K.
        pos = kv_len0 - 1 + jnp.arange(Q, dtype=jnp.int32)      # [Q]
        pos_all = jnp.tile(pos, (S, 1))                          # [S, Q]
        page = jnp.take_along_axis(
            tables, pos_all // bs, axis=1
        )                                                        # [S, Q]
        slots = (page * bs + pos_all % bs).reshape(-1)
        positions = pos_all.reshape(-1)
        seq_lens = jnp.full((S,), kv_len0 + K, jnp.int32)
        return positions, slots, seq_lens

    @partial(jax.jit, donate_argnums=(1,))
    def step_verify(params, kv_cache, tokens, positions, slots, seq_lens):
        meta = AttentionMetadata(
            slot_mapping=slots, block_tables=tables, seq_lens=seq_lens,
            query_start_loc=qslv, num_seqs=num_seqs, block_size=bs,
            decode_only=False,
        )
        hidden, kv_cache = model.forward(
            params, tokens, positions, kv_cache, meta
        )
        sel = hidden[vrows]
        logits = model.compute_logits(params, sel)
        return (
            jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(S, Q),
            kv_cache,
        )

    def run(step_fn, meta_fn, tok_shape, advance):
        kv_cache = fresh_cache()
        tokens = jnp.zeros(tok_shape, jnp.int32)
        flat = tokens.reshape(-1)[: tok_shape[0] if len(tok_shape) == 1 else T]
        pos, slots, sl = meta_fn(jnp.asarray(ctx, jnp.int32))
        out, kv_cache = step_fn(params, kv_cache, flat, pos, slots, sl)
        np.asarray(out)  # compile + sync
        t0 = time.perf_counter()
        for i in range(1, 1 + steps):
            kv_len = jnp.asarray(ctx + i * advance, jnp.int32)
            pos, slots, sl = meta_fn(kv_len)
            flat = out.reshape(-1)[:T] if len(tok_shape) > 1 else out
            out, kv_cache = step_fn(params, kv_cache, flat, pos, slots, sl)
        np.asarray(out)
        return (time.perf_counter() - t0) / steps

    t_decode = run(step_decode, meta_decode, (S,), 1)
    t_verify = run(step_verify, meta_verify, (S, Q), Q)

    def eff(alpha):
        e_m = sum(alpha ** j for j in range(1, K + 1))
        return S * (1.0 + e_m) / t_verify

    base = S / t_decode
    # Breakeven acceptance: smallest α with eff(α) >= base.
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if eff(mid) >= base:
            hi = mid
        else:
            lo = mid
    breakeven = hi if eff(1.0) >= base else None

    print(
        json.dumps(
            {
                "metric": "spec_decode_effective_tokens_per_sec",
                "value": round(eff(0.8), 1),
                "unit": "tokens/s (K=%d, 80%% acceptance)" % K,
                "vs_baseline": round(eff(0.8) / base, 3),
                "detail": {
                    "seqs": S,
                    "ctx": ctx,
                    "decode_step_ms": round(t_decode * 1e3, 3),
                    "verify_step_ms": round(t_verify * 1e3, 3),
                    "plain_tokens_per_sec": round(base, 1),
                    "eff_at_acceptance": {
                        str(a): round(eff(a), 1)
                        for a in (0.5, 0.7, 0.8, 0.9, 1.0)
                    },
                    "breakeven_acceptance": (
                        round(breakeven, 3) if breakeven is not None else None
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
