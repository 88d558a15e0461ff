"""Context-parallel (split-KV) decode attention tests.

The TPU-native analog of the reference's split-KV decode: partial flash
accumulators over page shards + LSE combine
(ref: csrc/src/lib.rs:2122-2199, csrc/kernels/flash_fwd_kernel.h
``combine_attn_seqk_parallel``). Validated against the single-device oracle
on the virtual 8-device CPU mesh, including the per-shard KV write.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.ops.attention import AttentionMetadata
from atoma_infer_tpu.ops.kv_cache import kv_cache_view, write_kv_cache
from atoma_infer_tpu.ops.reference import (
    ragged_paged_attention_xla,
    ragged_paged_attention_xla_partial,
)
from atoma_infer_tpu.parallel.context_parallel import (
    cp_decode_attention_layer,
)
from atoma_infer_tpu.parallel.mesh import TP_AXIS, make_mesh

BS = 16
HK, HQ, D = 2, 4, 32


def _decode_batch(rng, num_seqs, num_pages, max_pages):
    """Random decode step: each seq gets a random context length and a
    random (shuffled) set of global pages."""
    seq_lens = rng.randint(2, max_pages * BS - 1, size=num_seqs).astype(np.int32)
    perm = rng.permutation(num_pages)
    tables = np.zeros((num_seqs, max_pages), np.int32)
    used = 0
    slots = []
    for i, sl in enumerate(seq_lens):
        n_pages = -(-int(sl) // BS)
        pages = perm[used : used + n_pages]
        used += n_pages
        tables[i, :n_pages] = pages
        # this step's token is the last position (decode)
        pos = int(sl) - 1
        slots.append(int(pages[pos // BS]) * BS + pos % BS)
    q = rng.standard_normal((num_seqs, HQ, D)).astype(np.float32)
    k_new = rng.standard_normal((num_seqs, HK, D)).astype(np.float32)
    v_new = rng.standard_normal((num_seqs, HK, D)).astype(np.float32)
    cache = rng.standard_normal((num_pages, BS, 2 * HK * D)).astype(np.float32)
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray(slots, jnp.int32),
        block_tables=jnp.asarray(tables),
        seq_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.arange(num_seqs + 1, dtype=jnp.int32),
        num_seqs=jnp.asarray(num_seqs, jnp.int32),
        block_size=BS,
        decode_only=True,
    )
    return (
        jnp.asarray(q),
        jnp.asarray(k_new),
        jnp.asarray(v_new),
        jnp.asarray(cache),
        meta,
    )


def _oracle(q, k_new, v_new, cache, meta, **kw):
    cache = write_kv_cache(cache, k_new, v_new, meta.slot_mapping)
    k_view, v_view = kv_cache_view(cache, HK, D)
    out = ragged_paged_attention_xla(
        q,
        k_view,
        v_view,
        meta.block_tables,
        meta.seq_lens,
        meta.query_start_loc,
        scale=D**-0.5,
        block_size=meta.block_size,
        **kw,
    )
    return out, cache


class TestPartialCombine:
    def test_partials_over_page_split_match_full(self):
        """Splitting the pages into disjoint owner sets and LSE-combining
        the partials reproduces the full softmax exactly."""
        rng = np.random.RandomState(0)
        q, k_new, v_new, cache, meta = _decode_batch(rng, 6, 64, 6)
        full, cache_w = _oracle(q, k_new, v_new, cache, meta)
        k_view, v_view = kv_cache_view(cache_w, HK, D)

        owner = rng.randint(0, 3, size=64)  # arbitrary 3-way page split
        acc = None
        for s in range(3):
            mine = jnp.asarray(owner[np.asarray(meta.block_tables)] == s)
            num, m, l = ragged_paged_attention_xla_partial(
                q,
                k_view,
                v_view,
                meta.block_tables,
                meta.seq_lens,
                meta.query_start_loc,
                scale=D**-0.5,
                block_size=BS,
                page_valid=mine,
            )
            acc = (num, m, l) if acc is None else acc
            if s:
                n0, m0, l0 = acc
                m_g = jnp.maximum(m0, m)
                acc = (
                    n0 * jnp.exp(m0 - m_g)[..., None]
                    + num * jnp.exp(m - m_g)[..., None],
                    m_g,
                    l0 * jnp.exp(m0 - m_g) + l * jnp.exp(m - m_g),
                )
        num, m, l = acc
        combined = num / l[..., None]
        np.testing.assert_allclose(
            np.asarray(combined), np.asarray(full), atol=2e-5, rtol=2e-5
        )

    def test_empty_shard_is_finite_noop(self):
        """A shard owning none of a sequence's pages must contribute exact
        zeros (no NaN/Inf) under the combine weighting."""
        rng = np.random.RandomState(1)
        q, k_new, v_new, cache, meta = _decode_batch(rng, 3, 32, 4)
        cache = write_kv_cache(cache, k_new, v_new, meta.slot_mapping)
        k_view, v_view = kv_cache_view(cache, HK, D)
        none_mine = jnp.zeros_like(meta.block_tables, bool)
        num, m, l = ragged_paged_attention_xla_partial(
            q, k_view, v_view,
            meta.block_tables, meta.seq_lens, meta.query_start_loc,
            scale=D**-0.5, block_size=BS, page_valid=none_mine,
        )
        assert np.isfinite(np.asarray(num)).all()
        np.testing.assert_array_equal(np.asarray(l), 0.0)
        np.testing.assert_array_equal(np.asarray(num), 0.0)
        assert (np.asarray(m) <= -1e29).all()


class TestCpDecodeLayer:
    @pytest.mark.parametrize("n_shards", [4, 8])
    def test_matches_single_device(self, n_shards):
        mesh = make_mesh(tp=n_shards, devices=jax.devices()[:n_shards])
        rng = np.random.RandomState(2)
        q, k_new, v_new, cache, meta = _decode_batch(rng, 8, 64, 6)
        want, want_cache = _oracle(q, k_new, v_new, cache, meta)

        out, new_cache = jax.jit(
            lambda *a: cp_decode_attention_layer(
                *a, mesh=mesh, scale=D**-0.5, axis=TP_AXIS
            )
        )(q, cache, k_new, v_new, meta)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=2e-5, rtol=2e-5
        )
        # The sharded write must land every slot exactly once.
        np.testing.assert_allclose(
            np.asarray(new_cache), np.asarray(want_cache), atol=0, rtol=0
        )

    def test_softcap_and_window(self):
        mesh = make_mesh(tp=4, devices=jax.devices()[:4])
        rng = np.random.RandomState(3)
        q, k_new, v_new, cache, meta = _decode_batch(rng, 5, 32, 4)
        kw = dict(soft_cap=30.0, sliding_window=24)
        want, _ = _oracle(q, k_new, v_new, cache, meta, **kw)
        out, _ = cp_decode_attention_layer(
            q, cache, k_new, v_new, meta,
            mesh=mesh, scale=D**-0.5, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=2e-5, rtol=2e-5
        )
