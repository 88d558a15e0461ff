"""INT8-KV quality gate: logprob drift vs bf16 KV at matched weights.

BASELINE.md requires "logprobs matched to bf16 at equal bit-width" for the
INT8-KV north star. This tool runs the SAME model + weights + prompt cache
twice — once with a bf16 KV cache, once with that cache quantized to INT8
pages (the production fused quantize/write/attend path on TPU) — decodes N
greedy steps from the same start tokens, and reports:

  - mean / max |Δ logprob| of the bf16-run's chosen token
  - greedy token agreement rate between the two runs

Usage:
    python tools/kv_quant_gate.py            # real TPU, 1B shapes
    python tools/kv_quant_gate.py --cpu      # tiny smoke (XLA dequant path)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--seqs", type=int, default=16)
    parser.add_argument("--ctx", type=int, default=512)
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.kv_cache import (
        alloc_kv_scales,
        kv_quant_scales,
        quantize_kv_rows,
        SCALE_LANES,
    )

    if args.cpu:
        cfg = LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=32,
            max_position_embeddings=1024, tie_word_embeddings=True,
        )
        args.seqs, args.ctx, args.steps = 4, 64, 8
        bs = 16
    else:
        # Llama-3.2-1B shapes.
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32,
            num_key_value_heads=8, head_dim=64,
            max_position_embeddings=4096, tie_word_embeddings=True,
        )
        bs = 32

    model = Llama(cfg, dtype=jnp.bfloat16 if not args.cpu else jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    S, ctx, steps = args.seqs, args.ctx, args.steps
    pages_per_seq = (ctx + steps) // bs + 2
    num_blocks = S * pages_per_seq + 8
    L, P_, bs_, row = model.kv_cache_shape(num_blocks, bs)
    D = cfg.head_dim
    Hk = cfg.num_key_value_heads

    rng = np.random.default_rng(0)
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    # A shared "prompt" cache: plausible KV rows (zero-mean, unit-ish scale).
    base_rows = (
        rng.standard_normal((num_blocks, bs_, row)).astype(np.float32) * 0.3
    )
    kv_bf16 = tuple(
        jnp.asarray(base_rows * (1 + 0.01 * i), model.dtype) for i in range(L)
    )
    # INT8 cache quantized FROM THE SAME rows via the production helpers, so
    # any divergence is quantization error, not different contents.
    kv_int8, kv_sc = [], []
    for i in range(L):
        flat = jnp.asarray(base_rows * (1 + 0.01 * i)).reshape(
            num_blocks * bs_, Hk, 2 * D
        )
        # Cache rows are head-interleaved [K_h | V_h]; split accordingly so
        # quantize_kv_rows (the engine's quantize path) re-produces the same
        # interleaved layout the bf16 run reads.
        k_rows = flat[:, :, :D]
        v_rows = flat[:, :, D:]
        sc = kv_quant_scales(k_rows, v_rows)                    # [N, 2]
        qrows = quantize_kv_rows(k_rows, v_rows, sc)            # [N, row] i8
        kv_int8.append(qrows.reshape(num_blocks, bs_, row))
        scp = jnp.zeros((num_blocks * bs_, SCALE_LANES), jnp.bfloat16)
        scp = scp.at[:, :2].set(sc.astype(jnp.bfloat16))
        kv_sc.append(scp.reshape(num_blocks, bs_, SCALE_LANES))
    kv_int8 = tuple(kv_int8)
    kv_sc = tuple(kv_sc)

    def meta_for(i):
        kv_len = ctx + i
        page = np.asarray(tables)[np.arange(S), kv_len // bs]
        return (
            jnp.full((S,), kv_len, jnp.int32),
            jnp.asarray(page * bs + kv_len % bs, jnp.int32),
            jnp.full((S,), kv_len + 1, jnp.int32),
        )

    @partial(jax.jit, donate_argnums=(1, 2), static_argnums=(7,))
    def step(params, kv_cache, kv_scales, tokens, positions, slots, seq_lens,
             quant):
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=seq_lens,
            query_start_loc=qsl,
            num_seqs=num_seqs,
            block_size=bs,
            decode_only=True,
        )
        if quant:
            hidden, kv_cache, kv_scales = model.forward(
                params, tokens, positions, kv_cache, meta, kv_scales=kv_scales
            )
        else:
            hidden, kv_cache = model.forward(
                params, tokens, positions, kv_cache, meta
            )
        logits = model.compute_logits(params, hidden)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, logprobs, kv_cache, kv_scales

    def rollout(kv_cache, kv_scales, quant, forced=None):
        """Decode ``steps`` tokens. With ``forced`` (the bf16 run's input
        stream) the rollout is TEACHER-FORCED: both runs see identical
        contexts every step, so Δlogprob isolates quantization numerics —
        free-running comparison is meaningless after the first legitimate
        argmax flip (contexts diverge)."""
        toks = jnp.zeros((S,), jnp.int32)
        inputs, all_toks, all_lps = [], [], []
        for i in range(steps):
            if forced is not None:
                toks = jnp.asarray(forced[i])
            inputs.append(np.asarray(toks))
            pos, slots, sl = meta_for(i)
            toks, lps, kv_cache, kv_scales = step(
                params, kv_cache, kv_scales, toks, pos, slots, sl, quant
            )
            all_toks.append(np.asarray(toks))
            all_lps.append(np.asarray(lps))
        return np.stack(inputs), np.stack(all_toks), np.stack(all_lps)

    inputs_b, toks_b, lps_b = rollout(kv_bf16, None, False)
    _, toks_q, lps_q = rollout(kv_int8, kv_sc, True, forced=inputs_b)

    # Δ logprob of the bf16-chosen token under each run.
    st, sq = np.arange(steps)[:, None], np.arange(S)[None, :]
    chosen_b = lps_b[st, sq, toks_b]
    chosen_q = lps_q[st, sq, toks_b]
    dlp = np.abs(chosen_b - chosen_q)
    agree = float((toks_b == toks_q).mean())

    print(
        json.dumps(
            {
                "metric": "int8_kv_logprob_drift",
                "mean_abs_dlogprob": round(float(dlp.mean()), 5),
                "max_abs_dlogprob": round(float(dlp.max()), 5),
                "greedy_token_agreement": round(agree, 4),
                "steps": steps,
                "seqs": S,
                "ctx": ctx,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
