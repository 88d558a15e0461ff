"""North-star benchmark: Llama-3.1-8B INT8 weight-only decode tok/s/chip.

BASELINE.md: "tokens/sec/chip (Llama-3.1-8B INT8 decode)". Random INT8
weights (performance depends only on shapes); engine-style dispatch
(see bench.py for the methodology notes).
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
    parser.add_argument(
        "--bits", type=int, default=8, choices=(4, 8),
        help="weight quantization width (8 = north star, 4 = config #4 "
        "weights; INT4 runs the Pallas bitcast-unpack kernel)",
    )
    parser.add_argument(
        "--layers", type=int, default=32,
        help="layer count override (layer-scaling cost attribution)",
    )
    parser.add_argument(
        "--seqs", type=int, default=176,
        help="decode batch size (weights are read once per step, so "
        "throughput scales with batch until KV/attention dominate; "
        "176 is the HBM-fit maximum on v5e-1 after the stacked-weight "
        "kernel views removed 3.1GB of per-layer slice temps — 192 OOMs "
        "by 31MB; sweep: 112→5253, 128→5542, 160→5786, 176→5831 tok/s)",
    )
    parser.add_argument(
        "--block-size", type=int, default=32,
        help="KV page size in tokens (int8 KV needs a multiple of 32; "
        "bigger pages halve the per-entry DMA descriptor issues — KV page "
        "+ scale page each ride one descriptor — at the cost of internal "
        "fragmentation)",
    )
    args = parser.parse_args()
    bits = args.bits

    cfg = LlamaConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=args.layers,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        max_position_embeddings=4096,
        tie_word_embeddings=False,
    )
    model = Llama(cfg, dtype=jnp.bfloat16)

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    G = 128  # quant group size

    def rand_q(key, shape_in, shape_out):
        k1, _ = jax.random.split(jax.random.PRNGKey(key))
        rows = shape_in // 2 if bits == 4 else shape_in
        qw = jax.random.randint(
            k1, (L, rows, shape_out), -127, 127, jnp.int8
        )
        scales = jnp.full(
            (L, shape_in // G, shape_out), 0.01, jnp.bfloat16
        )
        return QuantizedTensor(
            qweight=qw, scales=scales, bits=bits, group_size=G
        )

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
        # LM head INT8 with per-channel scales (single group — see
        # weights.py loader note on grouped-partial materialization).
        "lm_head": QuantizedTensor(
            qweight=jax.random.randint(
                jax.random.PRNGKey(8), (H, cfg.vocab_size), -127, 127,
                jnp.int8,
            ),
            scales=jnp.full((1, cfg.vocab_size), 0.0001, jnp.bfloat16),
            bits=8,
            group_size=H,
        ),
    }

    # int8 weights (~8GB) + bf16 embed + int8 lm_head + KV must fit
    # 15.75GB HBM (112 seqs fits with int8 KV; 128 exceeds by 545MB).
    S = args.seqs
    block_size = args.block_size
    ctx = 512
    steps = 32
    pages_per_seq = (ctx + steps) // block_size + 1
    num_blocks = S * pages_per_seq + 8

    # REAL int8 KV cache + bf16 scale pages (BASELINE config #3: INT8
    # weights AND INT8 KV — the fused quantize+write+attend Pallas path).
    from atoma_infer_tpu.ops.kv_cache import alloc_kv_scales

    Lc, P_, bs_, row_ = model.kv_cache_shape(num_blocks, block_size)
    kv_cache = tuple(
        jnp.zeros((P_, bs_, row_), dtype=jnp.int8) for _ in range(Lc)
    )
    kv_scales = tuple(alloc_kv_scales(P_, bs_) for _ in range(Lc))
    rng = np.random.default_rng(0)
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    @jax.jit
    def meta_for(i):
        kv_len = ctx + i
        page = tables[jnp.arange(S), kv_len // block_size]
        slots = page * block_size + kv_len % block_size
        return (
            jnp.full((S,), kv_len, jnp.int32),
            slots,
            jnp.full((S,), kv_len + 1, jnp.int32),
        )

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(params, kv_cache, kv_scales, tokens, positions, slots, seq_lens):
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=tables,
            seq_lens=seq_lens,
            query_start_loc=qsl,
            num_seqs=num_seqs,
            block_size=block_size,
            decode_only=True,  # pure decode → fused quant+write+attend
        )
        hidden, kv_cache, kv_scales = model.forward(
            params, tokens, positions, kv_cache, meta, kv_scales=kv_scales
        )
        logits = model.compute_logits(params, hidden)
        return (
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
            kv_cache,
            kv_scales,
        )

    tokens = jnp.zeros((S,), jnp.int32)
    pos, slots, sl = meta_for(0)
    t0c = time.time()
    tokens, kv_cache, kv_scales = step(
        params, kv_cache, kv_scales, tokens, pos, slots, sl
    )
    np.asarray(tokens)
    print(f"# compile {time.time()-t0c:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(1, 1 + steps):
        pos, slots, sl = meta_for(i)
        tokens, kv_cache, kv_scales = step(
            params, kv_cache, kv_scales, tokens, pos, slots, sl
        )
    np.asarray(tokens)
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_per_chip_llama8b_int{bits}",
                "value": round(S * steps / dt, 1),
                "unit": "tokens/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
