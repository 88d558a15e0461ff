"""Quantization quality ladder on the PEAKED-LOGIT in-repo trained model.

VERDICT r4 missing #1: every quant gate previously ran on random weights
(flat logits — the worst case, and uninformative about real behavior). This
tool runs the entire ladder on the trained checkpoint produced by
tools/train_tiny_model.py (real text, peaked logits, self-consistent greedy):

  reference: bf16 weights + bf16 KV, REAL prompt prefill through the paged
             cache, then N greedy decode steps.
  variants (each TEACHER-FORCED on the reference's token stream so Δlogprob
  isolates quantization numerics):
    int8      — weight-only INT8 (the shipping 8B config's matmul path)
    int8+w8a8 — + dynamic per-token INT8 activations (ATOMA_W8A8)
    int4      — weight-only INT4
    kv8       — bf16 weights + INT8 KV pages (fused quantize/write/attend)
    kvfp8     — bf16 weights + FP8 (e4m3, scale-free) KV pages decoded
                inside the Pallas kernel
    int8+kv8  — the full shipping config #3
  per variant: mean/max |Δ logprob of the reference-chosen token| and
  greedy token agreement vs the reference.

Usage:
    python tools/quality_ladder.py [--model-dir tests/fixtures/tiny_trained]
                                   [--cpu] [--steps 32] [--seqs 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

DEFAULT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "tiny_trained"
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", default=DEFAULT_DIR)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--seqs", type=int, default=16)
    parser.add_argument("--prompt-len", type=int, default=96)
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from tokenizers import Tokenizer

    from atoma_infer_tpu.models.llama import Llama
    from atoma_infer_tpu.models.weights import (
        load_hf_config,
        load_llama_params,
    )
    from atoma_infer_tpu.ops import quant_kernels
    from atoma_infer_tpu.ops.attention import AttentionMetadata
    from atoma_infer_tpu.ops.kv_cache import SCALE_LANES
    from tiny_corpus import build_corpus

    model_dir = os.path.abspath(args.model_dir)
    cfg = load_hf_config(model_dir)
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    model = Llama(cfg, dtype=dtype)
    tok = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))

    params_by_quant = {
        None: load_llama_params(model_dir, cfg, dtype=dtype),
        "int8": load_llama_params(
            model_dir, cfg, dtype=dtype, quantization="int8"
        ),
        "int4": load_llama_params(
            model_dir, cfg, dtype=dtype, quantization="int4"
        ),
    }

    # Prompts: S fixed-length windows of REAL corpus text at spread offsets.
    S, P, steps = args.seqs, args.prompt_len, args.steps
    stream = tok.encode(build_corpus()).ids
    stride = (len(stream) - P - 1) // S
    prompts = np.stack(
        [stream[i * stride : i * stride + P] for i in range(S)]
    ).astype(np.int32)

    bs = 32
    pages_per_seq = -(-(P + steps + 1) // bs)
    num_blocks = S * pages_per_seq + 8
    L, _, bs_, row = model.kv_cache_shape(num_blocks, bs)

    rng = np.random.default_rng(0)
    # Permuted (non-contiguous) physical pages: block-table indirection is
    # part of what the ladder must not perturb (ref: the random-block-order
    # decode test, /root/reference/models/src/llama.rs:506+).
    perm = rng.permutation(num_blocks - 1)[: S * pages_per_seq] + 1
    tables = jnp.asarray(perm.reshape(S, pages_per_seq), dtype=jnp.int32)
    num_seqs = jnp.asarray(S, jnp.int32)

    tables_np = np.asarray(tables)

    def fresh_cache(quant_kv):
        if quant_kv == "int8":
            kv = tuple(
                jnp.zeros((num_blocks, bs_, row), jnp.int8) for _ in range(L)
            )
            sc = tuple(
                jnp.zeros((num_blocks, bs_, SCALE_LANES), jnp.bfloat16)
                for _ in range(L)
            )
            return kv, sc
        kv_dtype = jnp.float8_e4m3fn if quant_kv == "fp8" else dtype
        return (
            tuple(
                jnp.zeros((num_blocks, bs_, row), kv_dtype)
                for _ in range(L)
            ),
            None,
        )

    # ---- prefill metadata (whole prompt batch in one ragged step) --------
    slot_rows = tables_np[:, np.arange(P) // bs] * bs + np.arange(P) % bs
    prefill_meta = AttentionMetadata(
        slot_mapping=jnp.asarray(slot_rows.reshape(-1), jnp.int32),
        block_tables=tables,
        seq_lens=jnp.full((S,), P, jnp.int32),
        query_start_loc=jnp.arange(S + 1, dtype=jnp.int32) * P,
        num_seqs=num_seqs,
        block_size=bs,
    )
    prefill_positions = jnp.tile(jnp.arange(P, dtype=jnp.int32), S)
    last_rows = jnp.arange(1, S + 1, dtype=jnp.int32) * P - 1

    def decode_meta(i):
        kv_len = P + i
        page = tables_np[np.arange(S), kv_len // bs]
        return (
            jnp.full((S,), kv_len, jnp.int32),
            jnp.asarray(page * bs + kv_len % bs, jnp.int32),
            jnp.full((S,), kv_len + 1, jnp.int32),
        )

    def make_fns(quant_kv):
        scaled = quant_kv == "int8"

        @jax.jit
        def prefill(p, kv_cache, kv_scales, tokens):
            out = model.forward(
                p, tokens, prefill_positions, kv_cache, prefill_meta,
                kv_scales=kv_scales if scaled else None,
            )
            hidden, kv_cache = out[0], out[1]
            kv_scales = out[2] if scaled else None
            logits = model.compute_logits(p, hidden[last_rows])
            lps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return (
                jnp.argmax(logits, -1).astype(jnp.int32), lps,
                kv_cache, kv_scales,
            )

        @partial(jax.jit, donate_argnums=(1, 2))
        def decode(p, kv_cache, kv_scales, tokens, pos, slots, seq_lens):
            meta = AttentionMetadata(
                slot_mapping=slots,
                block_tables=tables,
                seq_lens=seq_lens,
                query_start_loc=jnp.arange(S + 1, dtype=jnp.int32),
                num_seqs=num_seqs,
                block_size=bs,
                decode_only=True,
            )
            out = model.forward(
                p, tokens, pos, kv_cache, meta,
                kv_scales=kv_scales if scaled else None,
            )
            hidden, kv_cache = out[0], out[1]
            kv_scales = out[2] if scaled else None
            logits = model.compute_logits(p, hidden)
            lps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return (
                jnp.argmax(logits, -1).astype(jnp.int32), lps,
                kv_cache, kv_scales,
            )

        return prefill, decode

    def run_variant(quant, w8a8: bool, quant_kv, teacher=None):
        """Prefill + N decode steps; returns (greedy_toks, logprobs) stacked
        [steps+1, S(, V)] — row 0 is the prefill's next-token prediction."""
        quant_kernels._W8A8 = w8a8
        try:
            prefill, decode = make_fns(quant_kv)  # fresh trace per mode
            p = params_by_quant[quant]
            kv, sc = fresh_cache(quant_kv)
            toks, lps, kv, sc = prefill(p, kv, sc, jnp.asarray(prompts.reshape(-1)))
            all_toks, all_lps = [np.asarray(toks)], [np.asarray(lps)]
            feed = toks
            for i in range(steps):
                if teacher is not None:
                    feed = jnp.asarray(teacher[i])
                pos, slots, sl = decode_meta(i)
                toks, lps, kv, sc = decode(p, kv, sc, feed, pos, slots, sl)
                all_toks.append(np.asarray(toks))
                all_lps.append(np.asarray(lps))
                feed = toks
            return np.stack(all_toks), np.stack(all_lps)
        finally:
            quant_kernels._W8A8 = False

    ref_toks, ref_lps = run_variant(None, False, False)

    # Peakedness evidence: the reference model's own confidence in its
    # greedy choices (flat-logit random weights sit near log(1/V) ≈ −6.9).
    st = np.arange(steps + 1)[:, None]
    sq = np.arange(S)[None, :]
    chosen_ref = ref_lps[st, sq, ref_toks]
    peak = {
        "mean_chosen_logprob": round(float(chosen_ref.mean()), 4),
        "median_chosen_prob": round(
            float(np.median(np.exp(chosen_ref))), 4
        ),
    }

    variants = {
        "int8": ("int8", False, False),
        "int8_w8a8": ("int8", True, False),
        "int4": ("int4", False, False),
        "kv8": (None, False, "int8"),
        "kvfp8": (None, False, "fp8"),
        "int8_kv8": ("int8", False, "int8"),
    }
    report = {}
    for name, (q, w8a8, qkv) in variants.items():
        toks, lps = run_variant(q, w8a8, qkv, teacher=ref_toks)
        dlp = np.abs(lps[st, sq, ref_toks] - chosen_ref)
        report[name] = {
            "mean_abs_dlogprob": round(float(dlp.mean()), 5),
            "max_abs_dlogprob": round(float(dlp.max()), 5),
            "greedy_agreement": round(float((toks == ref_toks).mean()), 4),
        }

    print(json.dumps({
        "metric": "quality_ladder_peaked_logits",
        "model_dir": os.path.relpath(model_dir),
        "backend": __import__("jax").default_backend(),
        "seqs": S,
        "prompt_len": P,
        "decode_steps": steps,
        "reference_peakedness": peak,
        "variants": report,
    }, indent=2))


if __name__ == "__main__":
    main()
