"""BASELINE config #5 artifact: Llama-3.1-70B INT8 tensor-parallel over a
16-chip (2-host v5e-16) mesh — structural validation + roofline projection.

Real v5e-16 hardware is not available in this environment (one tunneled
chip), so this produces the two things that CAN be produced honestly:

1. **Structural validation**: the FULL 70B decode step (80 layers, INT8
   weights, GQA-8, vocab-sharded lm_head, page-major KV sharded over kv
   heads, shard_map attention) is jit-LOWERED against a real 16-device mesh
   (virtual CPU devices) with the exact NamedShardings the serving stack
   uses (`parallel/sharding.py`). Lowering type-checks every sharding and
   collective without materializing 70GB of weights.

2. **Roofline projection**: per-chip HBM traffic (INT8 weights + KV) and
   per-layer ICI all-reduce volume → projected decode step time, tok/s/chip,
   and the 1→16-chip scaling-efficiency bound, printed as one JSON line.

Multi-host execution path: `LlmService.start` with num_hosts>1 joins
`jax.distributed` and the same mesh spans both hosts' chips
(docs/architecture.md, replicated-scheduler design; tests/test_multihost.py
proves schedule determinism).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.quant import QuantizedTensor
    from atoma_infer_tpu.parallel import (
        kv_cache_layer_sharding,
        make_mesh,
        param_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    TP = 16
    devices = jax.devices()
    assert len(devices) >= TP, f"need {TP} virtual devices, got {len(devices)}"
    mesh = make_mesh(tp=TP, devices=devices[:TP])

    # Llama-3.1-70B.
    cfg = LlamaConfig(
        vocab_size=128256,
        hidden_size=8192,
        intermediate_size=28672,
        num_hidden_layers=80,
        num_attention_heads=64,
        num_key_value_heads=8,
        head_dim=128,
        max_position_embeddings=8192,
        tie_word_embeddings=False,
    )
    model = Llama(cfg, dtype=jnp.bfloat16, mesh=mesh)
    L, H, I, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    G = 128  # quant group

    def qsds(d_in, d_out):
        return QuantizedTensor(
            qweight=jax.ShapeDtypeStruct((L, d_in, d_out), jnp.int8),
            scales=jax.ShapeDtypeStruct((L, d_in // G, d_out), jnp.bfloat16),
            bits=8,
            group_size=G,
        )

    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    params = {
        "embed": jax.ShapeDtypeStruct((V, H), jnp.bfloat16),
        "layers": {
            "input_norm": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
            "q_proj": qsds(H, qd),
            "k_proj": qsds(H, kvd),
            "v_proj": qsds(H, kvd),
            "o_proj": qsds(qd, H),
            "post_norm": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
            "gate_proj": qsds(H, I),
            "up_proj": qsds(H, I),
            "down_proj": qsds(I, H),
        },
        "final_norm": jax.ShapeDtypeStruct((H,), jnp.bfloat16),
        "lm_head": jax.ShapeDtypeStruct((H, V), jnp.bfloat16),
    }
    p_shardings = param_shardings(mesh, params)

    # Decode batch: 32 sequences, ctx 2048, block 16.
    S, bs, P_pages = 32, 16, 2048 // 16
    num_blocks = S * P_pages + 8
    # kv_repeat=2 here (8 kv heads on 16 shards): cache rows carry each kv
    # head twice so every q-head shard attends locally (models/llama.py).
    _, _, _, row = model.kv_cache_shape(num_blocks, bs)
    kv_sharding = kv_cache_layer_sharding(mesh)
    kv_cache = tuple(
        jax.ShapeDtypeStruct((num_blocks, bs, row), jnp.bfloat16)
        for _ in range(L)
    )
    rep = NamedSharding(mesh, P())

    meta = AttentionMetadata(
        slot_mapping=jax.ShapeDtypeStruct((S,), jnp.int32),
        block_tables=jax.ShapeDtypeStruct((S, P_pages), jnp.int32),
        seq_lens=jax.ShapeDtypeStruct((S,), jnp.int32),
        query_start_loc=jax.ShapeDtypeStruct((S + 1,), jnp.int32),
        num_seqs=jax.ShapeDtypeStruct((), jnp.int32),
        block_size=bs,
    )

    def step(params, kv_cache, tokens, positions, meta):
        hidden, kv_cache = model.forward(
            params, tokens, positions, kv_cache, meta
        )
        logits = model.compute_logits(params, hidden)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_cache

    meta_shardings = AttentionMetadata(
        slot_mapping=rep, block_tables=rep, seq_lens=rep,
        query_start_loc=rep, num_seqs=rep, block_size=bs,
    )
    t0 = time.monotonic()
    lowered = jax.jit(
        step,
        in_shardings=(
            p_shardings,
            tuple(kv_sharding for _ in range(L)),
            rep,
            rep,
            meta_shardings,
        ),
    ).lower(
        params,
        kv_cache,
        jax.ShapeDtypeStruct((S,), jnp.int32),
        jax.ShapeDtypeStruct((S,), jnp.int32),
        meta,
    )
    lower_s = time.monotonic() - t0
    hlo_bytes = len(lowered.as_text())

    # ---- Roofline projection (v5e: 819 GB/s HBM, 2×45 GB/s ICI links,
    # ~197 bf16 TFLOP/s; DCN between the two 8-chip hosts). ----
    wbytes = sum(
        int(np.prod(t.qweight.shape)) for t in params["layers"].values()
        if isinstance(t, QuantizedTensor)
    ) + int(np.prod(params["embed"].shape)) * 2 + int(
        np.prod(params["lm_head"].shape)
    ) * 2
    w_per_chip = wbytes / TP
    ctx = 2048
    kv_step = S * ctx * row * 2 / TP          # bf16 KV read per chip
    hbm_time = (w_per_chip + kv_step) / 819e9
    # Two row-parallel psums per layer on [S, H] bf16 (XLA inserts the
    # all-reduce at the layer-output dtype) + final logits gather; a ring
    # all-reduce moves 2·(TP−1)/TP·bytes per chip over ICI.
    ici_bytes = L * 2 * S * H * 2 * 2 * (TP - 1) / TP
    ici_time = ici_bytes / 45e9
    step_time = max(hbm_time, ici_time) + 0.3 * min(hbm_time, ici_time)
    tok_s_chip = S / step_time / TP
    # Scaling efficiency bound vs a hypothetical 1-chip run at the same
    # per-chip HBM time (70B cannot fit 1 chip; this is the collective
    # overhead bound the ≥85% criterion measures).
    eff = hbm_time / step_time

    print(
        json.dumps(
            {
                "metric": "multihost_70b_int8_tp16_plan",
                "lowered_ok": True,
                "lowering_s": round(lower_s, 1),
                "hlo_chars": hlo_bytes,
                "mesh": {"tp": TP, "hosts": 2, "chips_per_host": 8},
                "weights_gb_per_chip": round(w_per_chip / 1e9, 2),
                "kv_read_gb_per_step_per_chip": round(kv_step / 1e9, 3),
                "ici_allreduce_mb_per_step_per_chip": round(
                    ici_bytes / 1e6, 1
                ),
                "projected_step_ms": round(step_time * 1e3, 2),
                "projected_tok_s_per_chip": round(tok_s_chip, 1),
                "projected_scaling_efficiency": round(eff, 3),
                "decode_batch": S,
                "ctx": ctx,
            }
        )
    )


if __name__ == "__main__":
    main()
