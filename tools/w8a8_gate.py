"""W8A8 quality gate: logprob drift of int8 activations vs weight-only INT8.

BASELINE.md's logprob criterion covers the INT8-KV path
(tools/kv_quant_gate.py); this gate covers the MATMUL quantization ladder
on the same worst-case setup (random weights → flat logits):

  (a) bf16 weights                      — reference
  (b) INT8 weights, bf16 activations    — the shipping config #3 path
  (c) INT8 weights + W8A8 activations   — ATOMA_W8A8=1

All three decode the SAME teacher-forced token stream (run (a)'s greedy
choices) over the SAME bf16 KV rows, so (b)−(a) isolates weight
quantization and (c)−(b) isolates the ADDED activation-quantization error
that gates W8A8.

Usage:
    python tools/w8a8_gate.py          # 1B shapes on TPU
    python tools/w8a8_gate.py --cpu    # tiny smoke (interpret kernels)
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
    from atoma_infer_tpu.ops import quant_kernels
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.quant import QuantizedTensor

    if args.cpu:
        cfg = LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=32,
            max_position_embeddings=1024, tie_word_embeddings=False,
        )
        args.seqs, args.ctx, args.steps = 4, 64, 8
        bs = 16
    else:
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32,
            num_key_value_heads=8, head_dim=64,
            max_position_embeddings=4096, tie_word_embeddings=False,
        )
        bs = 32

    G = 128

    model = Llama(cfg, dtype=jnp.bfloat16 if not args.cpu else jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    def quantize_stacked(w):  # [L, K, N] -> QuantizedTensor (stacked)
        L, K, N = w.shape
        gs = G if K % G == 0 else K
        wf = np.asarray(w, np.float32).reshape(L, K // gs, gs, N)
        absmax = np.max(np.abs(wf), axis=2, keepdims=True)
        scales = np.maximum(absmax / 127.0, 1e-8)
        q = np.clip(np.round(wf / scales), -127, 127).astype(np.int8)
        return QuantizedTensor(
            qweight=jnp.asarray(q.reshape(L, K, N)),
            scales=jnp.asarray(scales[:, :, 0, :], jnp.bfloat16),
            bits=8,
            group_size=gs,
        )

    qparams = dict(params)
    qlayers = dict(params["layers"])
    for key in ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj"):
        qlayers[key] = quantize_stacked(params["layers"][key])
    qparams["layers"] = qlayers

    S, ctx, steps = args.seqs, args.ctx, args.steps
    pages_per_seq = (ctx + steps) // bs + 2
    num_blocks = S * pages_per_seq + 8
    L, P_, bs_, row = model.kv_cache_shape(num_blocks, bs)

    rng = np.random.default_rng(0)
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    base_rows = (
        rng.standard_normal((num_blocks, bs_, row)).astype(np.float32) * 0.3
    )

    def fresh_cache():
        return tuple(
            jnp.asarray(base_rows * (1 + 0.01 * i), model.dtype)
            for i in range(L)
        )

    def meta_for(i):
        kv_len = ctx + i
        page = np.asarray(tables)[np.arange(S), kv_len // bs]
        return (
            jnp.full((S,), kv_len, jnp.int32),
            jnp.asarray(page * bs + kv_len % bs, jnp.int32),
            jnp.full((S,), kv_len + 1, jnp.int32),
        )

    def make_step():
        @partial(jax.jit, donate_argnums=(1,))
        def step(p, kv_cache, tokens, positions, slots, seq_lens):
            meta = AttentionMetadata(
                slot_mapping=slots,
                block_tables=tables,
                seq_lens=seq_lens,
                query_start_loc=qsl,
                num_seqs=num_seqs,
                block_size=bs,
                decode_only=True,
            )
            hidden, kv_cache = model.forward(
                p, tokens, positions, kv_cache, meta
            )
            logits = model.compute_logits(p, hidden).astype(jnp.float32)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return kv_cache, toks, logprobs

        return step

    def run(p, w8a8: bool, teacher=None):
        quant_kernels._W8A8 = w8a8
        step = make_step()  # fresh jit per mode: the flag binds at trace
        kv = fresh_cache()
        tokens = jnp.zeros((S,), jnp.int32)
        outs, lps = [], []
        for i in range(steps):
            pos, slots, sl = meta_for(i)
            kv, toks, logprobs = step(p, kv, tokens, pos, slots, sl)
            outs.append(np.asarray(toks))
            lps.append(np.asarray(logprobs))
            tokens = (
                toks if teacher is None
                else jnp.asarray(teacher[i], jnp.int32)
            )
        return np.stack(outs), np.stack(lps)  # [steps, S], [steps, S, V]

    ref_toks, ref_lps = run(params, False)
    int8_toks, int8_lps = run(qparams, False, teacher=ref_toks)
    w8a8_toks, w8a8_lps = run(qparams, True, teacher=ref_toks)
    quant_kernels._W8A8 = False

    idx = np.arange(S)

    def drift(lps_a, lps_b, chosen):
        d = []
        for i in range(steps):
            d.append(np.abs(
                lps_a[i][idx, chosen[i]] - lps_b[i][idx, chosen[i]]
            ))
        return np.concatenate(d)

    d_w = drift(ref_lps, int8_lps, ref_toks)
    d_a = drift(int8_lps, w8a8_lps, ref_toks)
    agree_w = float(np.mean(int8_toks == ref_toks))
    agree_a = float(np.mean(w8a8_toks == int8_toks))
    print(json.dumps({
        "metric": "w8a8_logprob_gate",
        "weight_quant_mean_abs_dlp": round(float(np.mean(d_w)), 4),
        "weight_quant_max_abs_dlp": round(float(np.max(d_w)), 4),
        "act_quant_mean_abs_dlp": round(float(np.mean(d_a)), 4),
        "act_quant_max_abs_dlp": round(float(np.max(d_a)), 4),
        "greedy_agreement_int8_vs_bf16": round(agree_w, 4),
        "greedy_agreement_w8a8_vs_int8": round(agree_a, 4),
        "note": "random weights = flat logits, worst case",
    }))


if __name__ == "__main__":
    main()
