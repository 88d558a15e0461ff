"""Real-TPU correctness check: compiled Pallas kernels vs the XLA oracle.

Run on the tunneled chip (ONE TPU process at a time):
    PYTHONUNBUFFERED=1 python tools/tpu_kernel_check.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.ops.kv_cache import (
    kv_cache_view,
    scales_flat,
    write_kv_cache,
    write_kv_cache_quant,
)
from atoma_infer_tpu.ops.paged_attention import (
    ragged_paged_attention_fused,
    ragged_paged_attention_fused_quant,
    ragged_paged_attention_pallas,
)
from atoma_infer_tpu.ops.reference import ragged_paged_attention_xla


def check(name, got, want, atol=5e-2, rtol=5e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want))
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{name}: max_err={err:.4f} {'OK' if ok else 'FAIL'}")
    return ok


def main():
    rng = np.random.default_rng(0)
    Hq, Hk, D, bs = 32, 8, 64, 32
    num_blocks = 256
    dtype = jnp.bfloat16

    ok = True
    for label, specs, S in [
        ("decode16", [(1, kv) for kv in (1, 31, 32, 33, 500, 511, 512)], 16),
        ("prefill", [(64, 64), (128, 200)], 8),
        ("mixed", [(48, 48), (1, 100), (1, 257)], 8),
    ]:
        T = sum(q for q, _ in specs)
        T = -(-T // 8) * 8
        P = max(-(-kv // bs) for _, kv in specs) + 1
        perm = rng.permutation(num_blocks)
        tables = np.zeros((S, P), np.int32)
        used = 0
        for i, (_, kv) in enumerate(specs):
            n = -(-kv // bs)
            tables[i, :n] = perm[used : used + n]
            used += n
        lens = np.zeros((S,), np.int32)
        qsl = np.zeros((S + 1,), np.int32)
        for i, (q_len, kv) in enumerate(specs):
            lens[i] = kv
            qsl[i + 1] = qsl[i] + q_len
        qsl[len(specs) + 1 :] = qsl[len(specs)]

        q = jnp.asarray(rng.standard_normal((T, Hq, D)), dtype)
        cache = jnp.asarray(
            rng.standard_normal((num_blocks, bs, 2 * Hk * D)), dtype
        )
        meta = AttentionMetadata(
            slot_mapping=jnp.full((T,), -1, jnp.int32),
            block_tables=jnp.asarray(tables),
            seq_lens=jnp.asarray(lens),
            query_start_loc=jnp.asarray(qsl),
            num_seqs=jnp.asarray(len(specs), jnp.int32),
            block_size=bs,
        )
        scale = D**-0.5
        got = jax.jit(
            lambda q, c, m: ragged_paged_attention_pallas(q, c, m, scale=scale)
        )(q, cache, meta)
        k_view, v_view = kv_cache_view(cache, Hk, D)
        want = ragged_paged_attention_xla(
            q, k_view, v_view, meta.block_tables, meta.seq_lens,
            meta.query_start_loc, scale=scale, block_size=bs,
        )
        total = int(qsl[-1])
        ok &= check(f"pallas/{label}", got[:total], want[:total], atol=8e-2)

        if label.startswith("decode"):
            # Fused write path: cache WITHOUT the new rows; kernel writes.
            slots = np.full((T,), -1, np.int32)
            for s_i, (_, kv) in enumerate(specs):
                pos = kv - 1
                slots[qsl[s_i]] = tables[s_i, pos // bs] * bs + pos % bs
            meta_f = dataclasses.replace(
                meta, slot_mapping=jnp.asarray(slots), decode_only=True
            )
            k_new = jnp.asarray(rng.standard_normal((T, Hk, D)), dtype)
            v_new = jnp.asarray(rng.standard_normal((T, Hk, D)), dtype)
            want_cache = write_kv_cache(cache, k_new, v_new, meta_f.slot_mapping)
            kw, vw = kv_cache_view(want_cache, Hk, D)
            want_f = ragged_paged_attention_xla(
                q, kw, vw, meta_f.block_tables, meta_f.seq_lens,
                meta_f.query_start_loc, scale=scale, block_size=bs,
            )
            got_f, new_cache = jax.jit(
                lambda q, c, k, v, m: ragged_paged_attention_fused(
                    q, c, k, v, m, scale=scale
                )
            )(q, cache, k_new, v_new, meta_f)
            ok &= check(f"fused/{label}", got_f[:total], want_f[:total], atol=8e-2)
            cache_eq = bool(
                jnp.all(
                    new_cache.astype(jnp.float32)
                    == want_cache.astype(jnp.float32)
                )
            )
            print(f"fused/{label} cache equal: {cache_eq}")
            ok &= cache_eq

    # INT8-KV paths: in-kernel dequant + fully fused quantize+write+attend.
    Hk, D, row = 8, 64, 2 * 8 * 64
    for label, specs in [
        ("i8-decode", [(1, kv) for kv in (1, 31, 32, 33, 500, 511, 512)]),
        ("i8-mixed", [(48, 48), (1, 100), (1, 257)]),
    ]:
        S = 16 if label == "i8-decode" else 8
        T = -(-sum(q for q, _ in specs) // 8) * 8
        P = max(-(-kv // bs) for _, kv in specs) + 1
        perm = rng.permutation(num_blocks)
        tables = np.zeros((S, P), np.int32)
        used = 0
        for i, (_, kv) in enumerate(specs):
            n = -(-kv // bs)
            tables[i, :n] = perm[used : used + n]
            used += n
        lens = np.zeros((S,), np.int32)
        qsl = np.zeros((S + 1,), np.int32)
        for i, (q_len, kv) in enumerate(specs):
            lens[i] = kv
            qsl[i + 1] = qsl[i] + q_len
        qsl[len(specs) + 1 :] = qsl[len(specs)]

        import ml_dtypes

        from atoma_infer_tpu.ops.kv_cache import SCALE_LANES

        q = jnp.asarray(rng.standard_normal((T, Hq, D)), dtype)
        cache_f = rng.standard_normal((num_blocks, bs, row)).astype(np.float32)
        lanes_k = ((np.arange(row) // D) % 2) == 0
        flat = cache_f.reshape(num_blocks * bs, row)
        k_s = (
            np.maximum(np.abs(flat[:, lanes_k]).max(axis=1) / 127.0, 1e-8)
            .astype(ml_dtypes.bfloat16).astype(np.float32)
        )
        v_s = (
            np.maximum(np.abs(flat[:, ~lanes_k]).max(axis=1) / 127.0, 1e-8)
            .astype(ml_dtypes.bfloat16).astype(np.float32)
        )
        sc_row = np.where(lanes_k[None, :], k_s[:, None], v_s[:, None])
        cache = jnp.asarray(
            np.clip(np.round(flat / sc_row), -127, 127)
            .astype(np.int8)
            .reshape(num_blocks, bs, row)
        )
        sc_np = np.zeros((num_blocks * bs, SCALE_LANES), ml_dtypes.bfloat16)
        sc_np[:, 0] = k_s
        sc_np[:, 1] = v_s
        scales = jnp.asarray(sc_np.reshape(num_blocks, bs, SCALE_LANES))
        meta = AttentionMetadata(
            slot_mapping=jnp.full((T,), -1, jnp.int32),
            block_tables=jnp.asarray(tables),
            seq_lens=jnp.asarray(lens),
            query_start_loc=jnp.asarray(qsl),
            num_seqs=jnp.asarray(len(specs), jnp.int32),
            block_size=bs,
        )
        scale = D**-0.5
        got = jax.jit(
            lambda q, c, sc, m: ragged_paged_attention_pallas(
                q, c, m, scale=scale, kv_scales=sc
            )
        )(q, cache, scales, meta)
        k_view, v_view = kv_cache_view(cache, Hk, D)
        k_sc, v_sc = scales_flat(scales)
        want = ragged_paged_attention_xla(
            q, k_view, v_view, meta.block_tables, meta.seq_lens,
            meta.query_start_loc, scale=scale, block_size=bs,
            k_scale=k_sc, v_scale=v_sc,
        )
        total = int(qsl[len(specs)])
        ok &= check(f"pallas/{label}", got[:total], want[:total], atol=1e-1)

        if label == "i8-decode":
            slots = np.full((T,), -1, np.int32)
            for s_i, (_, kv) in enumerate(specs):
                pos = kv - 1
                slots[qsl[s_i]] = tables[s_i, pos // bs] * bs + pos % bs
            meta_f = dataclasses.replace(
                meta, slot_mapping=jnp.asarray(slots), decode_only=True
            )
            k_new = jnp.asarray(rng.standard_normal((T, Hk, D)), jnp.float32)
            v_new = jnp.asarray(rng.standard_normal((T, Hk, D)), jnp.float32)
            want_cache, want_scales = write_kv_cache_quant(
                cache, scales, k_new, v_new, meta_f.slot_mapping
            )
            kw, vw = kv_cache_view(want_cache, Hk, D)
            wk, wv = scales_flat(want_scales)
            want_f = ragged_paged_attention_xla(
                q, kw, vw, meta_f.block_tables, meta_f.seq_lens,
                meta_f.query_start_loc, scale=scale, block_size=bs,
                k_scale=wk, v_scale=wv,
            )
            got_f, new_cache, new_scales = jax.jit(
                lambda q, c, sc, k, v, m: ragged_paged_attention_fused_quant(
                    q, c, sc, k, v, m, scale=scale
                )
            )(q, cache, scales, k_new, v_new, meta_f)
            ok &= check(
                f"fusedq/{label}", got_f[:total], want_f[:total], atol=1e-1
            )
            # Written rows may differ ±1 int8 LSB from the XLA oracle: the
            # two are different XLA programs and TPU's approximate
            # reciprocal lets round(x/s) flip at .5 boundaries between
            # programs. Rows not written this step must match exactly.
            nc = np.asarray(new_cache, np.int32)
            wc = np.asarray(want_cache, np.int32)
            delta = np.abs(nc - wc)
            written = np.zeros(nc.shape[:2], bool)
            for sl in np.asarray(meta_f.slot_mapping):
                if sl >= 0:
                    written[sl // bs, sl % bs] = True
            cache_ok = bool(
                delta[written].max(initial=0) <= 1
                and delta[~written].max(initial=0) == 0
            )
            sc_ok = bool(
                jnp.allclose(new_scales, want_scales, rtol=1e-6)
            )
            print(
                f"fusedq/{label} cache: written_max_lsb="
                f"{delta[written].max(initial=0)} "
                f"untouched_equal={delta[~written].max(initial=0) == 0} "
                f"scales: {sc_ok}"
            )
            ok &= cache_ok and sc_ok

    # FP8 (e4m3) KV paths: bytes ride the int8 page machinery (bitcast at
    # the kernel boundary) and are decoded on the VPU (_e4m3_decode).
    for label, specs in [
        ("fp8-decode", [(1, kv) for kv in (1, 31, 32, 33, 500, 511, 512)]),
        ("fp8-mixed", [(48, 48), (1, 100), (1, 257)]),
    ]:
        S = 16 if label == "fp8-decode" else 8
        T = -(-sum(q for q, _ in specs) // 8) * 8
        P = max(-(-kv // bs) for _, kv in specs) + 1
        perm = rng.permutation(num_blocks)
        tables = np.zeros((S, P), np.int32)
        used = 0
        for i, (_, kv) in enumerate(specs):
            n = -(-kv // bs)
            tables[i, :n] = perm[used : used + n]
            used += n
        lens = np.zeros((S,), np.int32)
        qsl = np.zeros((S + 1,), np.int32)
        for i, (q_len, kv) in enumerate(specs):
            lens[i] = kv
            qsl[i + 1] = qsl[i] + q_len
        qsl[len(specs) + 1 :] = qsl[len(specs)]

        q = jnp.asarray(rng.standard_normal((T, Hq, D)), dtype)
        cache = jnp.asarray(
            rng.standard_normal((num_blocks, bs, row)), jnp.float8_e4m3fn
        )
        meta = AttentionMetadata(
            slot_mapping=jnp.full((T,), -1, jnp.int32),
            block_tables=jnp.asarray(tables),
            seq_lens=jnp.asarray(lens),
            query_start_loc=jnp.asarray(qsl),
            num_seqs=jnp.asarray(len(specs), jnp.int32),
            block_size=bs,
        )
        scale = D**-0.5
        got = jax.jit(
            lambda q, c, m: ragged_paged_attention_pallas(
                q, c, m, scale=scale
            )
        )(q, cache, meta)
        k_view, v_view = kv_cache_view(cache, Hk, D)
        want = ragged_paged_attention_xla(
            q, k_view, v_view, meta.block_tables, meta.seq_lens,
            meta.query_start_loc, scale=scale, block_size=bs,
        )
        total = int(qsl[len(specs)])
        ok &= check(f"pallas/{label}", got[:total], want[:total], atol=1e-1)

        if label == "fp8-decode":
            slots = np.full((T,), -1, np.int32)
            for s_i, (_, kv) in enumerate(specs):
                pos = kv - 1
                slots[qsl[s_i]] = tables[s_i, pos // bs] * bs + pos % bs
            meta_f = dataclasses.replace(
                meta, slot_mapping=jnp.asarray(slots), decode_only=True
            )
            k_new = jnp.asarray(rng.standard_normal((T, Hk, D)), jnp.float32)
            v_new = jnp.asarray(rng.standard_normal((T, Hk, D)), jnp.float32)
            want_cache = write_kv_cache(
                cache, k_new, v_new, meta_f.slot_mapping
            )
            kw, vw = kv_cache_view(want_cache, Hk, D)
            want_f = ragged_paged_attention_xla(
                q, kw, vw, meta_f.block_tables, meta_f.seq_lens,
                meta_f.query_start_loc, scale=scale, block_size=bs,
            )
            got_f, new_cache = jax.jit(
                lambda q, c, k, v, m: ragged_paged_attention_fused(
                    q, c, k, v, m, scale=scale
                )
            )(q, cache, k_new, v_new, meta_f)
            ok &= check(
                f"fused/{label}", got_f[:total], want_f[:total], atol=1e-1
            )
            cache_eq = bool(
                np.array_equal(
                    np.asarray(new_cache).view(np.uint8),
                    np.asarray(want_cache).view(np.uint8),
                )
            )
            print(f"fused/{label} cache bytes equal: {cache_eq}")
            ok &= cache_eq

    print("ALL OK" if ok else "FAILURES")


if __name__ == "__main__":
    main()
