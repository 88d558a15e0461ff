"""Attention-kernel microbenchmark: effective KV-cache read bandwidth.

Measures the fused decode attention kernel (quantize/write/attend) alone —
one layer, Llama-1B attention shapes — at several context lengths, reporting
effective KV bandwidth (bytes of cache the kernel must stream per step /
measured step time) against the v5e HBM peak (~819 GB/s).

Methodology (CLAUDE.md): remote dispatch overhead is ~1-2ms, so UNROLL
inner_steps kernel calls inside one jit, chained through q so XLA cannot
CSE them, and time a python dispatch loop whose inputs change per iteration.

Usage:
    python tools/attn_bench.py                 # real TPU
    python tools/attn_bench.py --cpu           # interpret-mode smoke (tiny)
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
    parser.add_argument("--seqs", type=int, default=64)
    parser.add_argument("--block-size", type=int, default=32)
    parser.add_argument("--max-ctx", type=int, default=32768)
    parser.add_argument(
        "--ctxs", type=int, nargs="*", default=[512, 2048, 8192, 32640]
    )
    parser.add_argument("--inner-steps", type=int, default=8)
    parser.add_argument("--outer-steps", type=int, default=8)
    parser.add_argument(
        "--heads", type=int, nargs=3, metavar=("HQ", "HK", "D"), default=None,
        help="override (num_q_heads, num_kv_heads, head_dim); e.g. "
        "'--heads 32 4 128' streams the same KV bytes as the 1B default "
        "(32 8 64) with half the per-head matmuls — isolates matmul-count "
        "fixed cost from bandwidth",
    )
    parser.add_argument(
        "--fp8", action="store_true",
        help="FP8 (e4m3, scale-free) KV pages: bytes decoded in-kernel on "
        "the VPU (_e4m3_decode) before the MXU dots",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="INT8 KV cache through the fused quantize/write/attend kernel "
        "(scale pages ride the chunk DMAs; MXU-dequant mixed int8 dots)",
    )
    parser.add_argument(
        "--contiguous", action="store_true",
        help="sequential physical pages per sequence (the common allocator "
        "pattern) — exercises the kernel's 4-page coalesced DMA branch; "
        "default is a random permutation (worst case, single-page DMAs)",
    )
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.seqs, args.max_ctx = 4, 256
        args.ctxs = [64, 192]
        args.inner_steps = args.outer_steps = 2

    import jax
    import jax.numpy as jnp

    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.paged_attention import (
        ragged_paged_attention_fused,
        ragged_paged_attention_fused_quant,
    )

    # Llama-3.2-1B attention shapes.
    Hq, Hk, D = (32, 8, 64) if not args.cpu else (8, 4, 32)
    if args.heads is not None:
        Hq, Hk, D = args.heads
    S, bs = args.seqs, args.block_size
    P = args.max_ctx // bs + 1
    num_blocks = S * P + 8
    row = 2 * Hk * D
    scale = D**-0.5

    rng = np.random.default_rng(0)
    if args.int8:
        from atoma_infer_tpu.ops.kv_cache import alloc_kv_scales

        kv0 = jnp.asarray(
            rng.integers(-127, 128, (num_blocks, bs, row)), jnp.int8
        )
        sc0 = alloc_kv_scales(num_blocks, bs) + jnp.bfloat16(0.01)
    elif args.fp8:
        kv0 = jnp.asarray(
            rng.standard_normal((num_blocks, bs, row)), jnp.float8_e4m3fn
        )
    else:
        kv0 = jnp.asarray(
            rng.standard_normal((num_blocks, bs, row)), jnp.bfloat16
        )
    if args.contiguous:
        ids = np.arange(1, S * P + 1)
    else:
        ids = rng.permutation(num_blocks - 1)[: S * P] + 1
    tables = jnp.asarray(ids.reshape(S, P), dtype=jnp.int32)
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    @partial(jax.jit, donate_argnums=(1, 2), static_argnums=(6,))
    def steps(q, kv_cache, kv_scales, slots, seq_lens, kn, inner):
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=seq_lens,
            query_start_loc=qsl,
            num_seqs=num_seqs,
            block_size=bs,
            decode_only=True,
        )
        out = jnp.zeros((S, Hq, D), q.dtype)
        for _ in range(inner):
            # Chain q through the previous output so XLA cannot CSE the
            # unrolled kernel calls.
            qi = q + 0.0 * out.mean()
            if args.int8:
                out, kv_cache, kv_scales = ragged_paged_attention_fused_quant(
                    qi, kv_cache, kv_scales, kn, kn, meta, scale=scale,
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                out, kv_cache = ragged_paged_attention_fused(
                    qi, kv_cache, kn, kn, meta, scale=scale,
                    interpret=jax.default_backend() == "cpu",
                )
        return out, kv_cache, kv_scales

    results = []
    for ctx in args.ctxs:
        kv_cache = jnp.array(kv0, copy=True)  # kv0 survives the donation
        kv_scales = (
            jnp.array(sc0, copy=True)
            if args.int8
            else jnp.zeros((1, bs, 128), jnp.bfloat16)
        )
        q = jnp.asarray(
            rng.standard_normal((S, Hq, D)), jnp.bfloat16
        )
        kn = jnp.asarray(rng.standard_normal((S, Hk, D)), jnp.bfloat16)

        def meta_for(i):
            kv_len = ctx + i
            page = np.asarray(tables)[np.arange(S), kv_len // bs]
            return (
                jnp.asarray(page * bs + kv_len % bs, jnp.int32),
                jnp.full((S,), kv_len + 1, jnp.int32),
            )

        slots, sl = meta_for(0)
        out, kv_cache, kv_scales = steps(
            q, kv_cache, kv_scales, slots, sl, kn, args.inner_steps
        )
        np.asarray(out)  # compile + sync

        t0 = time.perf_counter()
        for i in range(1, 1 + args.outer_steps):
            slots, sl = meta_for(i)
            out, kv_cache, kv_scales = steps(
                q, kv_cache, kv_scales, slots, sl, kn, args.inner_steps
            )
        np.asarray(out)
        dt = time.perf_counter() - t0

        n = args.inner_steps * args.outer_steps
        step_ms = dt / n * 1e3
        itemsize = 1 if (args.int8 or args.fp8) else 2
        # int8 rows + bf16 scale pages; bf16: cache rows only.
        kv_bytes = S * ctx * (row * itemsize + (256 if args.int8 else 0))
        gbps = kv_bytes / (dt / n) / 1e9
        results.append(
            {
                "ctx": ctx,
                "step_ms": round(step_ms, 3),
                "kv_gb_per_s": round(gbps, 1),
                "pct_hbm_peak": round(100 * gbps / 819, 1),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"metric": "attn_kernel_bandwidth", "results": results}))


if __name__ == "__main__":
    main()
