"""Numerics tests for the paged-attention oracle and KV cache ops.

Mirrors the reference's kernel test strategy: compare against a naive
full-attention oracle, including a random-block-order test proving block-table
indirection correctness (ref: models/src/llama.rs random-block decode test,
csrc/tests/flash_attn_tests.rs golden comparisons).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atoma_infer_tpu.ops.kv_cache import (
    copy_blocks,
    write_kv_cache,
)
from atoma_infer_tpu.ops.reference import (
    naive_full_attention,
    ragged_paged_attention_xla,
)

BLOCK_SIZE = 16


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def _build_paged_cache(keys_list, values_list, num_blocks, rng, shuffle=True):
    """Scatter per-seq K/V into a fused paged cache with (optionally random)
    block assignment. Returns (k_cache, v_cache, block_tables, seq_lens) where
    k/v are views of the fused [slots, 2, H, D] array."""
    num_kv_heads, head_dim = keys_list[0].shape[1:]
    kv_cache = jnp.zeros((num_blocks, BLOCK_SIZE, 2 * num_kv_heads * head_dim))
    free = list(range(num_blocks))
    if shuffle:
        rng.shuffle(free)
    tables = []
    max_pages = max(-(-k.shape[0] // BLOCK_SIZE) for k in keys_list)
    for k, v in zip(keys_list, values_list):
        seq_len = k.shape[0]
        n_pages = -(-seq_len // BLOCK_SIZE)
        pages = [free.pop() for _ in range(n_pages)]
        slots = jnp.asarray(
            [pages[i // BLOCK_SIZE] * BLOCK_SIZE + i % BLOCK_SIZE
             for i in range(seq_len)],
            dtype=jnp.int32,
        )
        kv_cache = write_kv_cache(kv_cache, k, v, slots)
        tables.append(pages + [0] * (max_pages - n_pages))
    block_tables = jnp.asarray(tables, dtype=jnp.int32)
    seq_lens = jnp.asarray([k.shape[0] for k in keys_list], dtype=jnp.int32)
    from atoma_infer_tpu.ops.kv_cache import kv_cache_view

    k_view, v_view = kv_cache_view(kv_cache, num_kv_heads, head_dim)
    return k_view, v_view, block_tables, seq_lens


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(4, 4), (8, 2)])
def test_prefill_matches_naive(num_q_heads, num_kv_heads):
    head_dim = 32
    seq_len = 45
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = _rand(kq, (seq_len, num_q_heads, head_dim))
    k = _rand(kk, (seq_len, num_kv_heads, head_dim))
    v = _rand(kv, (seq_len, num_kv_heads, head_dim))
    scale = head_dim**-0.5

    rng = np.random.RandomState(0)
    k_cache, v_cache, tables, seq_lens = _build_paged_cache(
        [k], [v], num_blocks=8, rng=rng
    )
    out = ragged_paged_attention_xla(
        q, k_cache, v_cache, tables, seq_lens,
        jnp.asarray([0, seq_len], dtype=jnp.int32),
        scale=scale, block_size=BLOCK_SIZE,
    )
    expected = naive_full_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)


def test_decode_matches_naive_random_block_order():
    """Block-table indirection correctness: physical blocks in random order
    must not change the output (ref random-block-order decode test)."""
    num_q_heads, num_kv_heads, head_dim = 8, 4, 64
    ctx_lens = [33, 7, 61]
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 2 * len(ctx_lens) + 1)
    ks = [_rand(keys[i], (l, num_kv_heads, head_dim)) for i, l in enumerate(ctx_lens)]
    vs = [_rand(keys[len(ctx_lens) + i], (l, num_kv_heads, head_dim))
          for i, l in enumerate(ctx_lens)]
    q = _rand(keys[-1], (len(ctx_lens), num_q_heads, head_dim))
    scale = head_dim**-0.5

    outs = []
    for shuffle in (False, True):
        rng = np.random.RandomState(7)
        k_cache, v_cache, tables, seq_lens = _build_paged_cache(
            ks, vs, num_blocks=16, rng=rng, shuffle=shuffle
        )
        # Decode: one query per sequence; it attends to the full context.
        out = ragged_paged_attention_xla(
            q, k_cache, v_cache, tables, seq_lens,
            jnp.asarray([0, 1, 2, 3], dtype=jnp.int32),
            scale=scale, block_size=BLOCK_SIZE,
        )
        outs.append(out)
        # Each decode row equals the last row of naive attention over
        # [context; q] — here q is the last context token's query, so compare
        # against naive with the query at the final position.
        for s, (k, v) in enumerate(zip(ks, vs)):
            full_q = jnp.zeros((ctx_lens[s], num_q_heads, head_dim)).at[-1].set(q[s])
            expected = naive_full_attention(full_q, k, v, scale=scale)[-1]
            np.testing.assert_allclose(out[s], expected, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_mixed_prefill_decode_batch():
    """One ragged batch: a 20-token prefill chunk + two decode tokens."""
    num_heads, head_dim = 4, 32
    scale = head_dim**-0.5
    key = jax.random.PRNGKey(2)
    keys = jax.random.split(key, 7)
    # Seq A: fresh 20-token prefill. Seqs B, C: decodes with contexts 37, 5.
    ka = _rand(keys[0], (20, num_heads, head_dim))
    va = _rand(keys[1], (20, num_heads, head_dim))
    kb = _rand(keys[2], (37, num_heads, head_dim))
    vb = _rand(keys[3], (37, num_heads, head_dim))
    kc = _rand(keys[4], (5, num_heads, head_dim))
    vc = _rand(keys[5], (5, num_heads, head_dim))
    rng = np.random.RandomState(3)
    k_cache, v_cache, tables, seq_lens = _build_paged_cache(
        [ka, kb, kc], [va, vb, vc], num_blocks=16, rng=rng
    )
    qa = _rand(keys[6], (20, num_heads, head_dim))
    qb = _rand(jax.random.PRNGKey(8), (1, num_heads, head_dim))
    qc = _rand(jax.random.PRNGKey(9), (1, num_heads, head_dim))
    q = jnp.concatenate([qa, qb, qc], axis=0)

    out = ragged_paged_attention_xla(
        q, k_cache, v_cache, tables, seq_lens,
        jnp.asarray([0, 20, 21, 22], dtype=jnp.int32),
        scale=scale, block_size=BLOCK_SIZE,
    )
    exp_a = naive_full_attention(qa, ka, va, scale=scale)
    np.testing.assert_allclose(out[:20], exp_a, atol=2e-5, rtol=2e-5)
    for row, (k, v, qd, L) in zip(
        (out[20], out[21]), [(kb, vb, qb, 37), (kc, vc, qc, 5)]
    ):
        full_q = jnp.zeros((L, num_heads, head_dim)).at[-1].set(qd[0])
        expected = naive_full_attention(full_q, k, v, scale=scale)[-1]
        np.testing.assert_allclose(row, expected, atol=2e-5, rtol=2e-5)


def test_sliding_window_mask():
    num_heads, head_dim, seq_len, window = 2, 16, 40, 8
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = _rand(kq, (seq_len, num_heads, head_dim))
    k = _rand(kk, (seq_len, num_heads, head_dim))
    v = _rand(kv, (seq_len, num_heads, head_dim))
    scale = head_dim**-0.5
    rng = np.random.RandomState(5)
    k_cache, v_cache, tables, seq_lens = _build_paged_cache(
        [k], [v], num_blocks=8, rng=rng
    )
    out = ragged_paged_attention_xla(
        q, k_cache, v_cache, tables, seq_lens,
        jnp.asarray([0, seq_len], dtype=jnp.int32),
        scale=scale, block_size=BLOCK_SIZE, sliding_window=window,
    )
    expected = naive_full_attention(q, k, v, scale=scale, sliding_window=window)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)


def test_write_kv_cache_drops_padding():
    bs = 8
    kv_cache = jnp.zeros((4, bs, 2 * 2 * 8))  # 4 pages, Hk=2, D=8
    k_new = jnp.ones((4, 2, 8))
    v_new = 2 * jnp.ones((4, 2, 8))
    slots = jnp.asarray([3, 17, -1, -1], dtype=jnp.int32)
    kv_cache = write_kv_cache(kv_cache, k_new, v_new, slots)
    row = np.asarray(kv_cache).reshape(4, bs, 2, 2, 8)  # [p, r, Hk, KV, D]
    assert float(row[0, 3, :, 0].sum()) == 16.0   # slot 3 → page 0 row 3, K
    assert float(row[2, 1, :, 0].sum()) == 16.0   # slot 17 → page 2 row 1, K
    assert float(row[..., 0, :].sum()) == 32.0    # all K
    assert float(row[..., 1, :].sum()) == 64.0    # all V


def test_copy_blocks():
    L, nblocks, row = 2, 4, 32
    kv = jnp.arange(L * nblocks * BLOCK_SIZE * row, dtype=jnp.float32).reshape(
        L, nblocks, BLOCK_SIZE, row
    )
    pairs = jnp.asarray([[0, 3], [-1, -1]], dtype=jnp.int32)
    kv2 = copy_blocks(kv, pairs)
    np.testing.assert_array_equal(kv2[:, 3], kv[:, 0])
    np.testing.assert_array_equal(kv2[:, 1:3], kv[:, 1:3])  # untouched


def test_pallas_kv_write_matches_scatter():
    """Pallas page-RMW cache write vs the XLA scatter (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from atoma_infer_tpu.ops.kv_write import write_kv_cache_pallas

    rng = np.random.RandomState(0)
    kv = jnp.zeros((8, 8, 2 * 2 * 32), jnp.float32)  # 8 pages × bs 8, Hk2 D32
    k_new = jnp.asarray(rng.randn(8, 2, 32), jnp.float32)
    v_new = jnp.asarray(rng.randn(8, 2, 32), jnp.float32)
    slots = jnp.asarray([5, 63, -1, 17, 0, -1, 33, 12], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = write_kv_cache_pallas(kv, k_new, v_new, slots)
    want = write_kv_cache(jnp.zeros_like(kv), k_new, v_new, slots)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
