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
from atoma_infer_tpu.ops.kv_cache import kv_cache_view, write_kv_cache
from atoma_infer_tpu.ops.paged_attention import (
    ragged_paged_attention_fused,
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

    print("ALL OK" if ok else "FAILURES")


if __name__ == "__main__":
    main()
