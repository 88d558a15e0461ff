"""BASELINE config #5 artifact: Llama-3.1-70B INT8 on a 16-chip (2-host
v5e-16) mesh — structural validation + roofline projection for BOTH layouts:

- **TP-16**: tensor parallel over all 16 chips (the reference's only
  strategy, scaled); GQA-8 forces kv_repeat=2 (each kv head replicated on 2
  shards) and every layer's two all-reduces ride a 16-chip ring.
- **TP-8 × PP-2**: two pipeline stages of 40 layers, each tensor-parallel
  over 8 chips (parallel/pipeline.py + engine/pp_worker.py); the engine
  keeps one cohort per stage in flight so both stages stay busy. Per-chip
  weight traffic is identical (W/16), per-chip KV traffic is identical
  (tp=8 needs no kv replication — the repeat-2 cache at tp=16 reads the
  same bytes), but per-chip ICI all-reduce volume drops ~53% (half the
  layers × a 7/8 ring factor), which is exactly the term that caps TP-16
  at ~84% scaling efficiency.

Real v5e-16 hardware is not available in this environment (one tunneled
chip), so this produces the two things that CAN be produced honestly:

1. **Structural validation**: the FULL 70B decode step (80 layers, INT8
   weights, GQA-8, vocab-sharded lm_head, page-major KV sharded over kv
   heads, shard_map attention) is jit-LOWERED against real 16-device meshes
   (virtual CPU devices) with the exact NamedShardings the serving stack
   uses — the TP-16 single program, and the PP pair of 40-layer stage
   programs on their own 8-device meshes. Lowering type-checks every
   sharding and collective without materializing 70GB of weights.

2. **Roofline projection**: per-chip HBM traffic (INT8 weights + KV) and
   per-layer ICI all-reduce volume → projected decode step time, tok/s/chip,
   and the 1→16-chip scaling-efficiency bound, printed as one JSON line.

Multi-host execution path: `LlmService.start` with num_hosts>1 joins
`jax.distributed` and the meshes span both hosts' chips
(docs/architecture.md, replicated-scheduler design; tests/test_multihost.py
proves schedule determinism). The PP stage boundary coincides with the host
boundary, so the per-slot [S, H] activation hop (~0.5 MB) crosses DCN once.
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

# v5e roofline constants: HBM bandwidth, per-direction ICI link bandwidth.
HBM_BW = 819e9
ICI_BW = 45e9


def layer_sds(cfg, L):
    """Stacked [L, ...] INT8 layer ShapeDtypeStructs (full model or one
    pipeline stage's slice)."""
    from atoma_infer_tpu.ops.quant import QuantizedTensor

    H, I = cfg.hidden_size, cfg.intermediate_size
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
    return {
        "input_norm": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
        "q_proj": qsds(H, qd),
        "k_proj": qsds(H, kvd),
        "v_proj": qsds(H, kvd),
        "o_proj": qsds(qd, H),
        "post_norm": jax.ShapeDtypeStruct((L, H), jnp.bfloat16),
        "gate_proj": qsds(H, I),
        "up_proj": qsds(H, I),
        "down_proj": qsds(I, H),
    }


def build_model_and_params(mesh, tp):
    from atoma_infer_tpu.models.llama import Llama, LlamaConfig

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
    H, V = cfg.hidden_size, cfg.vocab_size
    params = {
        "embed": jax.ShapeDtypeStruct((V, H), jnp.bfloat16),
        "layers": layer_sds(cfg, cfg.num_layers),
        "final_norm": jax.ShapeDtypeStruct((H,), jnp.bfloat16),
        "lm_head": jax.ShapeDtypeStruct((H, V), jnp.bfloat16),
    }
    return model, params


def make_meta(S, P_pages, bs):
    from atoma_infer_tpu.ops.attention import AttentionMetadata

    return AttentionMetadata(
        slot_mapping=jax.ShapeDtypeStruct((S,), jnp.int32),
        block_tables=jax.ShapeDtypeStruct((S, P_pages), jnp.int32),
        seq_lens=jax.ShapeDtypeStruct((S,), jnp.int32),
        query_start_loc=jax.ShapeDtypeStruct((S + 1,), jnp.int32),
        num_seqs=jax.ShapeDtypeStruct((), jnp.int32),
        block_size=bs,
    )


def meta_shardings(rep, bs):
    from atoma_infer_tpu.ops.attention import AttentionMetadata

    return AttentionMetadata(
        slot_mapping=rep, block_tables=rep, seq_lens=rep,
        query_start_loc=rep, num_seqs=rep, block_size=bs,
    )


def weight_bytes(params):
    from atoma_infer_tpu.ops.quant import QuantizedTensor

    return sum(
        int(np.prod(t.qweight.shape)) for t in params["layers"].values()
        if isinstance(t, QuantizedTensor)
    ) + int(np.prod(params["embed"].shape)) * 2 + int(
        np.prod(params["lm_head"].shape)
    ) * 2


def project(*, wbytes, n_chips, tp, pp, L, H, S, ctx, kv_row_bytes_per_chip):
    """Roofline: per-chip HBM time vs per-chip ICI all-reduce time for one
    pipeline slot (one cohort's full stage pass; pp=1 ⇒ the whole step).

    With the engine keeping ``pp`` cohorts in flight, each stage computes
    every slot, so per-chip weight traffic per emitted batch-of-S tokens is
    the same for every layout: its W/n_chips shard, once."""
    w_per_chip = wbytes / n_chips
    kv_step = S * ctx * kv_row_bytes_per_chip * (1 / pp)  # stage's layers
    hbm_time = (w_per_chip + kv_step) / HBM_BW
    # Two row-parallel psums per layer on [S, H] bf16; a ring all-reduce
    # moves 2·(tp−1)/tp·bytes per chip over ICI. Each chip runs only its
    # stage's L/pp layers. The PP stage-boundary hop adds one [S, H] bf16
    # transfer per slot.
    ici_bytes = (L // pp) * 2 * S * H * 2 * 2 * (tp - 1) / tp
    if pp > 1:
        ici_bytes += S * H * 2
    ici_time = ici_bytes / ICI_BW
    slot_time = max(hbm_time, ici_time) + 0.3 * min(hbm_time, ici_time)
    # Lockstep scheduler-sync tax, MEASURED across two real jax.distributed
    # processes (benchmarks/multihost_sync_bench.py): a steady-decode
    # (empty-delta) broadcast costs ~2.2-2.5 ms/step host-side after the
    # single-collective rewrite (parallel/distributed.broadcast_step_payload).
    # Loopback transport, so this bounds serialization+collective dispatch,
    # not DCN propagation (+~0.1 ms/hop on real pods). The async engine
    # (depth 2) overlaps host work with device compute, so the tax binds
    # only when it exceeds the slot's device time headroom; at 70B slot
    # times (>>10 ms) it is fully hidden — shown both ways.
    SYNC_S = 2.5e-3
    slot_time_sync = max(slot_time, SYNC_S)
    # One cohort of S sequences emits a token every slot (pp cohorts rotate).
    tok_s_chip = S / slot_time_sync / n_chips
    eff = hbm_time / slot_time_sync
    return {
        "weights_gb_per_chip": round(w_per_chip / 1e9, 2),
        "kv_read_gb_per_slot_per_chip": round(kv_step / 1e9, 3),
        "ici_allreduce_mb_per_slot_per_chip": round(ici_bytes / 1e6, 1),
        "measured_lockstep_sync_ms": round(SYNC_S * 1e3, 2),
        "sync_hidden_by_async_overlap": bool(slot_time >= SYNC_S),
        "projected_slot_ms": round(slot_time_sync * 1e3, 2),
        "projected_tok_s_per_chip": round(tok_s_chip, 1),
        "projected_scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    from atoma_infer_tpu.parallel import (
        kv_cache_layer_sharding,
        make_mesh,
        param_shardings,
    )
    from atoma_infer_tpu.parallel.pipeline import (
        make_stage_meshes,
        stage_param_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    N = 16
    devices = jax.devices()
    assert len(devices) >= N, f"need {N} virtual devices, got {len(devices)}"

    # Decode batch per cohort: 32 sequences, ctx 2048, block 16.
    S, bs, P_pages = 32, 16, 2048 // 16
    num_blocks = S * P_pages + 8
    ctx = 2048

    # ---------------- TP-16 (single program) ----------------
    mesh = make_mesh(tp=N, devices=devices[:N])
    model, params = build_model_and_params(mesh, N)
    L, H = model.config.num_layers, model.config.hidden_size
    # kv_repeat=2 here (8 kv heads on 16 shards): cache rows carry each kv
    # head twice so every q-head shard attends locally (models/llama.py).
    _, _, _, row = model.kv_cache_shape(num_blocks, bs)
    kv_cache = tuple(
        jax.ShapeDtypeStruct((num_blocks, bs, row), jnp.bfloat16)
        for _ in range(L)
    )
    rep = NamedSharding(mesh, P())
    meta = make_meta(S, P_pages, bs)

    def step(params, kv_cache, tokens, positions, meta):
        hidden, kv_cache = model.forward(
            params, tokens, positions, kv_cache, meta
        )
        logits = model.compute_logits(params, hidden)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_cache

    t0 = time.monotonic()
    lowered = jax.jit(
        step,
        in_shardings=(
            param_shardings(mesh, params),
            tuple(kv_cache_layer_sharding(mesh) for _ in range(L)),
            rep,
            rep,
            meta_shardings(rep, bs),
        ),
    ).lower(
        params,
        kv_cache,
        jax.ShapeDtypeStruct((S,), jnp.int32),
        jax.ShapeDtypeStruct((S,), jnp.int32),
        meta,
    )
    tp16_lower_s = time.monotonic() - t0
    tp16_hlo = len(lowered.as_text())

    wbytes = weight_bytes(params)
    # Per-chip KV row bytes per (token, all layers): bf16, divided over the
    # tp shards; kv_repeat at tp=16 doubles stored rows but splits them over
    # twice the shards — identical per-chip bytes as tp=8 unreplicated.
    kv_row_bytes_per_chip = L * row * 2 / N
    tp16 = project(
        wbytes=wbytes, n_chips=N, tp=N, pp=1, L=L, H=H, S=S, ctx=ctx,
        kv_row_bytes_per_chip=kv_row_bytes_per_chip,
    )

    # ---------------- TP-8 × PP-2 (stage programs) ----------------
    stage_meshes = make_stage_meshes(2, 8, devices[:N])
    model_pp, params_pp = build_model_and_params(stage_meshes[0], 8)
    _, _, _, row8 = model_pp.kv_cache_shape(num_blocks, bs)  # kv_repeat=1
    cfgm = model_pp.config
    # Stage SDS trees (split_params slices real arrays; SDS trees are
    # rebuilt at the stage layer count instead).
    stages = [
        {
            "embed": params_pp["embed"],
            "layers": layer_sds(cfgm, 40),
        },
        {
            "layers": layer_sds(cfgm, 40),
            "final_norm": params_pp["final_norm"],
            "lm_head": params_pp["lm_head"],
        },
    ]
    stage_lower_s = []
    stage_hlo = []
    for s, (smesh, sparams) in enumerate(zip(stage_meshes, stages)):
        n_l = sparams["layers"]["input_norm"].shape[0]
        s_kv = tuple(
            jax.ShapeDtypeStruct((num_blocks, bs, row8), jnp.bfloat16)
            for _ in range(n_l)
        )
        s_rep = NamedSharding(smesh, P())
        last = s == len(stage_meshes) - 1

        def stage_step(sparams, s_kv, x, positions, meta, _last=last, _m=smesh):
            h = (
                model_pp.embed_tokens(sparams, x)
                if "embed" in sparams and x.dtype == jnp.int32
                else x
            )
            h, s_kv = model_pp.forward_hidden(
                sparams, h, positions, s_kv, meta, mesh=_m
            )
            if _last:
                logits = model_pp.compute_logits(sparams, h)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), s_kv
            return h, s_kv

        x_in = (
            jax.ShapeDtypeStruct((S,), jnp.int32)
            if s == 0
            else jax.ShapeDtypeStruct((S, H), jnp.bfloat16)
        )
        t0 = time.monotonic()
        lowered_s = jax.jit(
            stage_step,
            in_shardings=(
                stage_param_shardings(smesh, sparams),
                tuple(kv_cache_layer_sharding(smesh) for _ in range(n_l)),
                s_rep,
                s_rep,
                meta_shardings(s_rep, bs),
            ),
        ).lower(
            sparams,
            s_kv,
            x_in,
            jax.ShapeDtypeStruct((S,), jnp.int32),
            meta,
        )
        stage_lower_s.append(round(time.monotonic() - t0, 1))
        stage_hlo.append(len(lowered_s.as_text()))

    pp2 = project(
        wbytes=wbytes, n_chips=N, tp=8, pp=2, L=L, H=H, S=S, ctx=ctx,
        kv_row_bytes_per_chip=L * row8 * 2 / 8,
    )

    print(
        json.dumps(
            {
                "metric": "multihost_70b_int8_v5e16_plan",
                "lowered_ok": True,
                "mesh": {"chips": N, "hosts": 2, "chips_per_host": 8},
                "decode_batch_per_cohort": S,
                "ctx": ctx,
                "tp16": {
                    **tp16,
                    "lowering_s": round(tp16_lower_s, 1),
                    "hlo_chars": tp16_hlo,
                },
                "tp8_pp2": {
                    **pp2,
                    "stage_lowering_s": stage_lower_s,
                    "stage_hlo_chars": stage_hlo,
                    "resident_cohorts": 2,
                    "note": (
                        "2 cohorts ×32 seqs resident; per-chip KV capacity "
                        "identical to tp16 (kv_repeat=2 at tp16 stores the "
                        "same bytes tp8 stores unreplicated)"
                    ),
                },
                "chosen_layout": "tp8_pp2",
            }
        )
    )


if __name__ == "__main__":
    main()
