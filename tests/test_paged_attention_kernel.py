"""Pallas ragged paged-attention kernel vs the pure-XLA oracle.

Analog of the reference's kernel-vs-oracle golden tests
(csrc/tests/flash_attn_tests.rs:19-95), run in Pallas interpret mode on CPU
(SURVEY.md §4 takeaway (c)). Random physical block order everywhere — the
block-table-indirection correctness property the reference proves with its
random-block-order decode test (models/src/llama.rs:506+).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.ops.paged_attention import (
    build_work_list,
    ragged_paged_attention_pallas,
)
from atoma_infer_tpu.ops.reference import ragged_paged_attention_xla


def make_case(
    rng,
    *,
    seq_specs,  # list of (q_len, kv_len)
    num_q_heads=8,
    num_kv_heads=4,
    head_dim=64,
    block_size=16,
    num_blocks=64,
    pad_tokens_to=8,
    pad_seqs_to=None,
    dtype=jnp.float32,
):
    S = pad_seqs_to or len(seq_specs)
    total_q = sum(q for q, _ in seq_specs)
    T = -(-total_q // pad_tokens_to) * pad_tokens_to
    max_pages = max(-(-kv // block_size) for _, kv in seq_specs)
    P = max(max_pages, 2)

    # Random disjoint physical pages per sequence.
    perm = rng.permutation(num_blocks)
    block_tables = np.zeros((S, P), dtype=np.int32)
    used = 0
    for i, (_, kv_len) in enumerate(seq_specs):
        n = -(-kv_len // block_size)
        block_tables[i, :n] = perm[used : used + n]
        used += n
        assert used <= num_blocks

    seq_lens = np.zeros((S,), dtype=np.int32)
    qsl = np.zeros((S + 1,), dtype=np.int32)
    for i, (q_len, kv_len) in enumerate(seq_specs):
        seq_lens[i] = kv_len
        qsl[i + 1] = qsl[i] + q_len
    qsl[len(seq_specs) + 1 :] = qsl[len(seq_specs)]

    q = rng.standard_normal((T, num_q_heads, head_dim)).astype(np.float32)
    kv_cache = rng.standard_normal(
        (num_blocks, block_size, 2 * num_kv_heads * head_dim)
    ).astype(np.float32)

    meta = AttentionMetadata(
        slot_mapping=jnp.full((T,), -1, jnp.int32),
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.asarray(qsl),
        num_seqs=jnp.asarray(len(seq_specs), jnp.int32),
        block_size=block_size,
    )
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(kv_cache, dtype),
        meta,
    )


def run_both(q, kv_cache, meta, **kw):
    scale = q.shape[-1] ** -0.5
    got = ragged_paged_attention_pallas(
        q, kv_cache, meta, scale=scale, interpret=True, **kw
    )
    from atoma_infer_tpu.ops.kv_cache import kv_cache_view

    D = q.shape[2]
    Hk = kv_cache.shape[2] // (2 * D)
    k_view, v_view = kv_cache_view(kv_cache, Hk, D)
    want = ragged_paged_attention_xla(
        q,
        k_view,
        v_view,
        meta.block_tables,
        meta.seq_lens,
        meta.query_start_loc,
        scale=scale,
        block_size=meta.block_size,
        sliding_window=kw.get("sliding_window"),
        soft_cap=kw.get("soft_cap"),
        alibi_slopes=kw.get("alibi_slopes"),
    )
    return np.asarray(got), np.asarray(want)


def assert_close(got, want, qsl, atol=2e-2):
    # Compare only real token rows (padding rows are garbage by contract).
    total = int(qsl[-1])
    np.testing.assert_allclose(got[:total], want[:total], atol=atol, rtol=1e-2)


class TestPagedAttentionKernel:
    def test_single_prefill(self):
        rng = np.random.default_rng(0)
        q, kv, meta = make_case(rng, seq_specs=[(64, 64)])
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_decode_batch(self):
        rng = np.random.default_rng(1)
        specs = [(1, kv) for kv in (1, 5, 16, 17, 64, 128, 33)]
        q, kv, meta = make_case(
            rng, seq_specs=specs, num_blocks=32, pad_seqs_to=8
        )
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_mixed_prefill_decode(self):
        rng = np.random.default_rng(2)
        # Prefill-first batch layout (ref: flash_attention.rs:156-174).
        specs = [(40, 40), (21, 21), (1, 7), (1, 50), (1, 1)]
        q, kv, meta = make_case(
            rng, seq_specs=specs, num_blocks=32, pad_seqs_to=8
        )
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_chunked_prefill_continuation(self):
        rng = np.random.default_rng(3)
        # q_len < kv_len: later chunk of a chunked prefill attends to the
        # previously computed prefix (ref: scheduler.rs chunked prefill).
        specs = [(16, 48), (8, 100)]
        q, kv, meta = make_case(rng, seq_specs=specs, num_blocks=16)
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_gqa_and_mha(self):
        rng = np.random.default_rng(4)
        for hq, hk in ((8, 8), (8, 2), (4, 1)):
            q, kv, meta = make_case(
                rng,
                seq_specs=[(24, 24), (1, 31)],
                num_q_heads=hq,
                num_kv_heads=hk,
                num_blocks=16,
            )
            got, want = run_both(q, kv, meta)
            assert_close(got, want, meta.query_start_loc)

    def test_sliding_window(self):
        rng = np.random.default_rng(5)
        q, kv, meta = make_case(rng, seq_specs=[(64, 64), (1, 90)], num_blocks=16)
        got, want = run_both(q, kv, meta, sliding_window=24)
        assert_close(got, want, meta.query_start_loc)

    def test_soft_cap(self):
        rng = np.random.default_rng(6)
        q, kv, meta = make_case(rng, seq_specs=[(32, 32)], num_blocks=8)
        got, want = run_both(q, kv, meta, soft_cap=30.0)
        assert_close(got, want, meta.query_start_loc)

    def test_long_kv_multiple_chunks(self):
        rng = np.random.default_rng(7)
        # kv spans > pages_per_chunk pages → exercises the chunk loop + DMA
        # double buffering.
        q, kv, meta = make_case(
            rng,
            seq_specs=[(8, 1000)],
            num_blocks=64,
            block_size=16,
        )
        got, want = run_both(q, kv, meta, pages_per_chunk=4)
        assert_close(got, want, meta.query_start_loc)

    def test_causal_chunk_limit_multi_qblock(self):
        # Several q blocks × several KV chunks: early q blocks stop their
        # chunk loop at the causal limit (skipped chunks are fully masked),
        # so output must still match the oracle exactly.
        rng = np.random.default_rng(12)
        q, kv, meta = make_case(
            rng,
            seq_specs=[(128, 128), (64, 200)],
            num_blocks=32,
            block_size=16,
        )
        # block_q=64 → 2 q blocks for seq0; pages_per_chunk=2 → 32-row
        # chunks, 4 (seq0) / 7 (seq1) chunks.
        got, want = run_both(q, kv, meta, block_q=64, pages_per_chunk=2)
        assert_close(got, want, meta.query_start_loc)

    def test_contiguous_pages_coalesced_dma(self):
        """Physically CONTIGUOUS block tables take the 4-page coalesced DMA
        branch (random tables take singles); numerics must be identical."""
        rng = np.random.default_rng(13)
        q, kv, meta = make_case(
            rng,
            seq_specs=[(1, 200), (1, 127), (8, 96)],
            num_blocks=64,
            block_size=16,
            pad_tokens_to=8,
        )
        # Overwrite with sequential page ids per sequence.
        bt = np.zeros_like(np.asarray(meta.block_tables))
        start = 1
        for i, kv_len in enumerate((200, 127, 96)):
            n = -(-kv_len // 16)
            bt[i, :n] = np.arange(start, start + n)
            start += n
        import dataclasses

        meta = dataclasses.replace(meta, block_tables=jnp.asarray(bt))
        got, want = run_both(q, kv, meta, pages_per_chunk=8)
        assert_close(got, want, meta.query_start_loc)

    def test_padding_seqs_ignored(self):
        rng = np.random.default_rng(8)
        q, kv, meta = make_case(
            rng, seq_specs=[(1, 9)], pad_seqs_to=4, num_blocks=8
        )
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_alibi_prefill_and_decode(self):
        from atoma_infer_tpu.ops.attention import alibi_slopes

        rng = np.random.default_rng(10)
        slopes = alibi_slopes(8)
        specs = [(32, 32), (1, 20), (1, 47)]
        q, kv, meta = make_case(rng, seq_specs=specs, num_blocks=16)
        got, want = run_both(q, kv, meta, alibi_slopes=slopes)
        assert_close(got, want, meta.query_start_loc)
        # The bias must actually change the result.
        got0, _ = run_both(q, kv, meta)
        total = int(meta.query_start_loc[-1])
        assert not np.allclose(got[:total], got0[:total], atol=1e-3)

    def test_alibi_gqa_long_kv(self):
        from atoma_infer_tpu.ops.attention import alibi_slopes

        rng = np.random.default_rng(11)
        q, kv, meta = make_case(
            rng,
            seq_specs=[(8, 600)],
            num_q_heads=8,
            num_kv_heads=2,
            num_blocks=64,
        )
        got, want = run_both(
            q, kv, meta, alibi_slopes=alibi_slopes(8), pages_per_chunk=4
        )
        assert_close(got, want, meta.query_start_loc)

    def test_alibi_slope_values(self):
        from atoma_infer_tpu.ops.attention import alibi_slopes

        # Power of two: geometric 2^-(8/n · i) schedule (Press et al.).
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(8)),
            [2.0 ** -(i + 1) for i in range(8)],
            rtol=1e-6,
        )
        # Non power of two: interleaved half-step slopes appended.
        s12 = np.asarray(alibi_slopes(12))
        assert s12.shape == (12,)
        np.testing.assert_allclose(
            s12[:8], [2.0 ** -(i + 1) for i in range(8)], rtol=1e-6
        )
        np.testing.assert_allclose(
            s12[8:], [2.0 ** -0.5, 2.0 ** -1.5, 2.0 ** -2.5, 2.0 ** -3.5],
            rtol=1e-6,
        )

    def test_bf16(self):
        rng = np.random.default_rng(9)
        q, kv, meta = make_case(
            rng, seq_specs=[(32, 32), (1, 20)], dtype=jnp.bfloat16, num_blocks=16
        )
        got, want = run_both(q, kv, meta)
        total = int(meta.query_start_loc[-1])
        np.testing.assert_allclose(
            got[:total].astype(np.float32),
            want[:total].astype(np.float32),
            atol=8e-2,
            rtol=5e-2,
        )


class TestWorkList:
    def test_build(self):
        qsl = jnp.asarray([0, 3, 4, 260, 260], jnp.int32)
        seq, qb, offs = build_work_list(
            qsl, jnp.asarray(3, jnp.int32), block_q=128, num_entries=8
        )
        seq, qb = np.asarray(seq), np.asarray(qb)
        # seq0: 3 tokens → 1 block; seq1: 1 → 1; seq2: 256 → 2; seq3 inactive.
        assert list(seq[:4]) == [0, 1, 2, 2]
        assert list(qb[:4]) == [0, 0, 0, 1]
        assert all(s == -1 for s in seq[4:])
        assert list(np.asarray(offs)) == [0, 1, 2, 4, 4]


class TestFusedDecodeWrite:
    """Fused KV-write + attention (decode): the kernel must both produce
    attention over the just-written rows AND persist them to the cache
    (ref: reshape_and_cache + flash_attn_kv_cache in one,
    flash_attention.rs:360-361)."""

    def _run(self, rng, specs, *, num_blocks=64, block_size=16,
             num_q_heads=8, num_kv_heads=4, head_dim=64, pad_seqs_to=None,
             sliding_window=None, dtype=jnp.float32):
        from atoma_infer_tpu.ops.kv_cache import kv_cache_view, write_kv_cache
        from atoma_infer_tpu.ops.paged_attention import (
            ragged_paged_attention_fused,
        )

        q, kv_cache, meta = make_case(
            rng,
            seq_specs=specs,
            num_blocks=num_blocks,
            block_size=block_size,
            num_q_heads=num_q_heads,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            pad_seqs_to=pad_seqs_to,
            dtype=dtype,
        )
        T = q.shape[0]
        S = meta.seq_lens.shape[0]
        # Decode slot mapping: token i of seq s lands at position kv_len-1.
        slots = np.full((T,), -1, np.int32)
        tables = np.asarray(meta.block_tables)
        lens = np.asarray(meta.seq_lens)
        qsl = np.asarray(meta.query_start_loc)
        for s in range(len(specs)):
            pos = lens[s] - 1
            slots[qsl[s]] = tables[s, pos // block_size] * block_size + (
                pos % block_size
            )
        import dataclasses
        meta = dataclasses.replace(
            meta, slot_mapping=jnp.asarray(slots), decode_only=True
        )

        k_new = jnp.asarray(
            rng.standard_normal((T, num_kv_heads, head_dim)), dtype
        )
        v_new = jnp.asarray(
            rng.standard_normal((T, num_kv_heads, head_dim)), dtype
        )
        scale = head_dim**-0.5

        # Expected: write rows with the XLA scatter, then oracle attention.
        want_cache = write_kv_cache(kv_cache, k_new, v_new, meta.slot_mapping)
        k_view, v_view = kv_cache_view(want_cache, num_kv_heads, head_dim)
        want = np.asarray(
            ragged_paged_attention_xla(
                q, k_view, v_view, meta.block_tables, meta.seq_lens,
                meta.query_start_loc, scale=scale, block_size=block_size,
                sliding_window=sliding_window,
            )
        )

        got, new_cache = ragged_paged_attention_fused(
            q, kv_cache, k_new, v_new, meta, scale=scale,
            sliding_window=sliding_window, interpret=True,
        )
        return np.asarray(got), want, np.asarray(new_cache), np.asarray(
            want_cache
        ), qsl

    def test_decode_batch_fused(self):
        rng = np.random.default_rng(20)
        specs = [(1, kv) for kv in (1, 5, 16, 17, 64, 128, 33)]
        got, want, new_cache, want_cache, qsl = self._run(
            rng, specs, num_blocks=32, pad_seqs_to=8
        )
        assert_close(got, want, qsl)
        np.testing.assert_array_equal(new_cache, want_cache)

    def test_fused_multi_chunk(self):
        rng = np.random.default_rng(21)
        got, want, new_cache, want_cache, qsl = self._run(
            rng, [(1, 1000), (1, 700)], num_blocks=128
        )
        assert_close(got, want, qsl)
        np.testing.assert_array_equal(new_cache, want_cache)

    def test_fused_block_boundary(self):
        rng = np.random.default_rng(22)
        # New token at the first row of a fresh page and at the last row.
        got, want, new_cache, want_cache, qsl = self._run(
            rng, [(1, 17), (1, 32), (1, 16), (1, 49)], num_blocks=32
        )
        assert_close(got, want, qsl)
        np.testing.assert_array_equal(new_cache, want_cache)

    def test_fused_bf16_block32(self):
        rng = np.random.default_rng(23)
        got, want, new_cache, want_cache, qsl = self._run(
            rng, [(1, 40), (1, 70)], num_blocks=16, block_size=32,
            dtype=jnp.bfloat16,
        )
        total = int(qsl[-1])
        np.testing.assert_allclose(
            got[:total].astype(np.float32),
            want[:total].astype(np.float32),
            atol=8e-2, rtol=5e-2,
        )
        np.testing.assert_array_equal(new_cache, want_cache)

    def test_fused_sliding_window(self):
        rng = np.random.default_rng(24)
        got, want, new_cache, want_cache, qsl = self._run(
            rng, [(1, 90), (1, 30)], num_blocks=16, sliding_window=24
        )
        assert_close(got, want, qsl)
        np.testing.assert_array_equal(new_cache, want_cache)


class TestInt8KVKernel:
    """INT8-KV paths: in-kernel VPU dequant (scale pages riding the chunk
    DMAs) vs the XLA dequant oracle, and the fully fused
    quantize+write+attend decode kernel (BASELINE config #3 north star;
    the reference has no KV quantization)."""

    def _make_quant(self, rng, specs, *, block_size=32, num_blocks=32,
                    num_q_heads=8, num_kv_heads=4, head_dim=64,
                    pad_seqs_to=None):
        q, kv_cache, meta = make_case(
            rng,
            seq_specs=specs,
            num_blocks=num_blocks,
            block_size=block_size,
            num_q_heads=num_q_heads,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            pad_seqs_to=pad_seqs_to,
        )
        import ml_dtypes

        from atoma_infer_tpu.ops.kv_cache import SCALE_LANES

        D = head_dim
        cache_f = np.asarray(kv_cache, np.float32)
        nb, bs, row = cache_f.shape
        # Per-(slot, K/V) absmax over the head-interleaved [K_h | V_h]
        # lanes, rounded through bf16 (the scale-page storage precision).
        lanes_k = ((np.arange(row) // D) % 2) == 0
        flat = cache_f.reshape(nb * bs, row)
        k_abs = np.abs(flat[:, lanes_k]).max(axis=1)
        v_abs = np.abs(flat[:, ~lanes_k]).max(axis=1)
        k_s = np.maximum(k_abs / 127.0, 1e-8).astype(
            ml_dtypes.bfloat16
        ).astype(np.float32)
        v_s = np.maximum(v_abs / 127.0, 1e-8).astype(
            ml_dtypes.bfloat16
        ).astype(np.float32)
        sc_row = np.where(lanes_k[None, :], k_s[:, None], v_s[:, None])
        q_cache = np.clip(np.round(flat / sc_row), -127, 127).astype(np.int8)
        sc_pages = np.zeros((nb * bs, SCALE_LANES), ml_dtypes.bfloat16)
        sc_pages[:, 0] = k_s
        sc_pages[:, 1] = v_s
        return (
            q,
            jnp.asarray(q_cache.reshape(nb, bs, row)),
            jnp.asarray(sc_pages.reshape(nb, bs, SCALE_LANES)),
            meta,
        )

    def _oracle(self, q, q_cache, kv_scales, meta, *, head_dim,
                sliding_window=None):
        from atoma_infer_tpu.ops.kv_cache import kv_cache_view, scales_flat

        Hk = q_cache.shape[2] // (2 * head_dim)
        k_view, v_view = kv_cache_view(q_cache, Hk, head_dim)
        k_scale, v_scale = scales_flat(kv_scales)
        return np.asarray(
            ragged_paged_attention_xla(
                q, k_view, v_view, meta.block_tables, meta.seq_lens,
                meta.query_start_loc, scale=q.shape[-1] ** -0.5,
                block_size=meta.block_size, sliding_window=sliding_window,
                k_scale=k_scale, v_scale=v_scale,
            )
        )

    def test_int8_decode_batch(self):
        rng = np.random.default_rng(30)
        specs = [(1, kv) for kv in (1, 5, 31, 33, 64, 128)]
        q, q_cache, kv_scales, meta = self._make_quant(
            rng, specs, pad_seqs_to=8
        )
        got = np.asarray(
            ragged_paged_attention_pallas(
                q, q_cache, meta, scale=q.shape[-1] ** -0.5,
                kv_scales=kv_scales, interpret=True,
            )
        )
        want = self._oracle(q, q_cache, kv_scales, meta, head_dim=64)
        assert_close(got, want, np.asarray(meta.query_start_loc))

    def test_int8_prefill_and_mixed(self):
        rng = np.random.default_rng(31)
        specs = [(40, 40), (1, 70), (8, 24)]
        q, q_cache, kv_scales, meta = self._make_quant(
            rng, specs, num_blocks=16
        )
        got = np.asarray(
            ragged_paged_attention_pallas(
                q, q_cache, meta, scale=q.shape[-1] ** -0.5,
                kv_scales=kv_scales, interpret=True,
            )
        )
        want = self._oracle(q, q_cache, kv_scales, meta, head_dim=64)
        assert_close(got, want, np.asarray(meta.query_start_loc))

    def test_int8_long_kv_multi_chunk(self):
        rng = np.random.default_rng(32)
        q, q_cache, kv_scales, meta = self._make_quant(
            rng, [(1, 1000), (1, 600)], num_blocks=64,
        )
        got = np.asarray(
            ragged_paged_attention_pallas(
                q, q_cache, meta, scale=q.shape[-1] ** -0.5,
                kv_scales=kv_scales, pages_per_chunk=4, interpret=True,
            )
        )
        want = self._oracle(q, q_cache, kv_scales, meta, head_dim=64)
        assert_close(got, want, np.asarray(meta.query_start_loc))

    def test_int8_fused_decode(self):
        from atoma_infer_tpu.ops.kv_cache import write_kv_cache_quant
        from atoma_infer_tpu.ops.paged_attention import (
            ragged_paged_attention_fused_quant,
        )
        import dataclasses

        rng = np.random.default_rng(33)
        specs = [(1, kv) for kv in (1, 32, 33, 64, 95, 128)]
        block_size, head_dim = 32, 64
        q, q_cache, kv_scales, meta = self._make_quant(
            rng, specs, pad_seqs_to=8, num_blocks=32,
        )
        T = q.shape[0]
        slots = np.full((T,), -1, np.int32)
        tables = np.asarray(meta.block_tables)
        lens = np.asarray(meta.seq_lens)
        qsl = np.asarray(meta.query_start_loc)
        for s in range(len(specs)):
            pos = lens[s] - 1
            slots[qsl[s]] = tables[s, pos // block_size] * block_size + (
                pos % block_size
            )
        meta = dataclasses.replace(
            meta, slot_mapping=jnp.asarray(slots), decode_only=True
        )
        k_new = jnp.asarray(rng.standard_normal((T, 4, head_dim)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((T, 4, head_dim)), jnp.float32)
        scale = head_dim**-0.5

        want_cache, want_scales = write_kv_cache_quant(
            q_cache, kv_scales, k_new, v_new, meta.slot_mapping
        )
        want = self._oracle(q, want_cache, want_scales, meta, head_dim=64)

        got, new_cache, new_scales = ragged_paged_attention_fused_quant(
            q, q_cache, kv_scales, k_new, v_new, meta, scale=scale,
            interpret=True,
        )
        assert_close(np.asarray(got), want, qsl)
        np.testing.assert_array_equal(
            np.asarray(new_cache), np.asarray(want_cache)
        )
        np.testing.assert_allclose(
            np.asarray(new_scales), np.asarray(want_scales), rtol=1e-6
        )


class TestHeadFusedDecode:
    """Block-diagonal head fusion (2 MXU dots per chunk instead of 2·Hk;
    ops/paged_attention.py attend_chunk_fused). Engages for decode-shaped
    entries with G·BQ a sublane multiple — hq=8/hk=2 (G=4, BQ=2) below.
    Every variant must match the per-head path's oracle exactly."""

    HEADS = dict(num_q_heads=8, num_kv_heads=2)

    @pytest.fixture(autouse=True)
    def _force_fuse(self, monkeypatch):
        # The regime gate (multi-chunk + deep tables) never triggers at
        # test scale; force the fused path so these cases exercise it.
        monkeypatch.setenv("ATOMA_HEAD_FUSE", "force")

    def test_decode_batch_fused_heads(self):
        rng = np.random.default_rng(40)
        specs = [(1, kv) for kv in (1, 5, 16, 17, 64, 128, 33)]
        q, kv, meta = make_case(
            rng, seq_specs=specs, num_blocks=32, pad_seqs_to=8, **self.HEADS
        )
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_decode_multi_chunk_fused_heads(self):
        rng = np.random.default_rng(41)
        q, kv, meta = make_case(
            rng, seq_specs=[(1, 900), (1, 500)], num_blocks=128, **self.HEADS
        )
        got, want = run_both(q, kv, meta, pages_per_chunk=4)
        assert_close(got, want, meta.query_start_loc)

    def test_decode_fused_heads_window_softcap_alibi(self):
        from atoma_infer_tpu.ops.attention import alibi_slopes as mk_slopes

        rng = np.random.default_rng(42)
        specs = [(1, 90), (1, 30), (1, 64)]
        for kw in (
            dict(sliding_window=24),
            dict(soft_cap=30.0),
            dict(alibi_slopes=mk_slopes(8)),
        ):
            q, kv, meta = make_case(
                rng, seq_specs=specs, num_blocks=32, **self.HEADS
            )
            got, want = run_both(q, kv, meta, **kw)
            assert_close(got, want, meta.query_start_loc)

    def test_head_fuse_gate_matches_env_off(self, monkeypatch):
        """ATOMA_HEAD_FUSE=0 (per-head path) and =force produce identical
        results on the same decode batch."""
        rng = np.random.default_rng(43)
        specs = [(1, kv) for kv in (7, 40, 128)]

        def run(flag):
            monkeypatch.setenv("ATOMA_HEAD_FUSE", flag)
            r = np.random.default_rng(43)
            q, kv, meta = make_case(
                r, seq_specs=specs, num_blocks=32, **self.HEADS
            )
            out = ragged_paged_attention_pallas(
                q, kv, meta, scale=q.shape[-1] ** -0.5, interpret=True
            )
            return np.asarray(out), np.asarray(meta.query_start_loc)

        off, qsl = run("0")
        on, _ = run("force")
        assert_close(on, off, qsl, atol=1e-5)

    def test_int8_decode_fused_heads(self):
        rng = np.random.default_rng(44)
        helper = TestInt8KVKernel()
        specs = [(1, kv) for kv in (1, 31, 64, 128)]
        q, q_cache, kv_scales, meta = helper._make_quant(
            rng, specs, pad_seqs_to=8, **self.HEADS
        )
        got = np.asarray(
            ragged_paged_attention_pallas(
                q, q_cache, meta, scale=q.shape[-1] ** -0.5,
                kv_scales=kv_scales, interpret=True,
            )
        )
        want = helper._oracle(q, q_cache, kv_scales, meta, head_dim=64)
        assert_close(got, want, np.asarray(meta.query_start_loc))

    def test_fused_write_fused_heads(self):
        rng = np.random.default_rng(45)
        helper = TestFusedDecodeWrite()
        got, want, new_cache, want_cache, qsl = helper._run(
            rng, [(1, 17), (1, 32), (1, 70), (1, 1)], num_blocks=32,
            **self.HEADS,
        )
        assert_close(got, want, qsl)
        np.testing.assert_array_equal(new_cache, want_cache)


class TestFp8KVKernel:
    """FP8 (e4m3fn) KV-cache through the Pallas kernel: pages ride the int8
    byte machinery (bitcast at the kernel boundary) and are decoded to float
    in-kernel by VPU float arithmetic (paged_attention._e4m3_decode).
    Scale-free — BASELINE.json north star "INT8/FP8 KV-cache blocks ...
    dequant inside the paged-attention kernel"."""

    def _make_fp8(self, rng, specs, **kw):
        q, kv, meta = make_case(
            rng, seq_specs=specs, block_size=32, **kw
        )
        return q, kv.astype(jnp.float8_e4m3fn), meta

    def test_e4m3_decode_exact_all_bytes(self):
        """The in-kernel byte decoder matches the e4m3fn format for every
        non-NaN byte value."""
        import ml_dtypes

        from atoma_infer_tpu.ops.paged_attention import _e4m3_decode

        b = np.arange(256, dtype=np.uint8)
        truth = b.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
        got = np.asarray(
            _e4m3_decode(jnp.asarray(b.view(np.int8)), jnp.float32)
        )
        keep = ~np.isnan(truth)
        np.testing.assert_array_equal(got[keep], truth[keep])

    def test_fp8_decode_batch(self):
        rng = np.random.default_rng(50)
        specs = [(1, kv) for kv in (1, 5, 31, 33, 64, 128)]
        q, kv, meta = self._make_fp8(rng, specs, pad_seqs_to=8)
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_fp8_prefill_and_mixed(self):
        rng = np.random.default_rng(51)
        q, kv, meta = self._make_fp8(
            rng, [(40, 40), (1, 70), (8, 24)], num_blocks=16
        )
        got, want = run_both(q, kv, meta)
        assert_close(got, want, meta.query_start_loc)

    def test_fp8_long_kv_multi_chunk(self):
        rng = np.random.default_rng(52)
        q, kv, meta = self._make_fp8(
            rng, [(1, 1000), (1, 600)], num_blocks=64
        )
        got, want = run_both(q, kv, meta, pages_per_chunk=4)
        assert_close(got, want, meta.query_start_loc)

    def test_fp8_fused_decode_write(self):
        """Fused write+attend on an fp8 cache: the staged e4m3 bytes are
        patched into loaded chunks and written back; cache matches the
        XLA scatter path byte-for-byte."""
        import dataclasses

        from atoma_infer_tpu.ops.kv_cache import kv_cache_view, write_kv_cache
        from atoma_infer_tpu.ops.paged_attention import (
            ragged_paged_attention_fused,
        )

        rng = np.random.default_rng(53)
        block_size, head_dim = 32, 64
        specs = [(1, kv) for kv in (1, 32, 33, 64, 95, 128)]
        q, kv, meta = self._make_fp8(
            rng, specs, pad_seqs_to=8, num_blocks=32
        )
        T = q.shape[0]
        slots = np.full((T,), -1, np.int32)
        tables = np.asarray(meta.block_tables)
        lens = np.asarray(meta.seq_lens)
        qsl = np.asarray(meta.query_start_loc)
        for s in range(len(specs)):
            pos = lens[s] - 1
            slots[qsl[s]] = tables[s, pos // block_size] * block_size + (
                pos % block_size
            )
        meta = dataclasses.replace(
            meta, slot_mapping=jnp.asarray(slots), decode_only=True
        )
        k_new = jnp.asarray(rng.standard_normal((T, 4, head_dim)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((T, 4, head_dim)), jnp.float32)
        scale = head_dim**-0.5

        want_cache = write_kv_cache(kv, k_new, v_new, meta.slot_mapping)
        k_view, v_view = kv_cache_view(want_cache, 4, head_dim)
        want = np.asarray(
            ragged_paged_attention_xla(
                q, k_view, v_view, meta.block_tables, meta.seq_lens,
                meta.query_start_loc, scale=scale,
                block_size=meta.block_size,
            )
        )
        got, new_cache = ragged_paged_attention_fused(
            q, kv, k_new, v_new, meta, scale=scale, interpret=True
        )
        assert_close(np.asarray(got), want, qsl)
        np.testing.assert_array_equal(
            np.asarray(new_cache).view(np.uint8),
            np.asarray(want_cache).view(np.uint8),
        )
