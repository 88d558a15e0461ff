"""CacheEngine data-level tests: CoW copies, swap round trips, divergence.

These assert cache *contents*, not just emitted bookkeeping pairs —
regression coverage for the round-1 bug where ``CacheEngine.copy`` padded
its pair buffer but never wrote the real pairs into it, turning every
copy-on-write into a silent no-op (ref intent: csrc/kernels/cache_manager.cu
:15-37 — dst pages must byte-match src pages after the copy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from atoma_infer_tpu.engine.cache_engine import CacheEngine
from atoma_infer_tpu.ops.kv_cache import kv_cache_view, write_kv_cache
from atoma_infer_tpu.ops.reference import ragged_paged_attention_xla


def _make_engine(dtype=jnp.float32, num_host_blocks=8):
    return CacheEngine(
        num_layers=2,
        num_kv_heads=2,
        head_dim=16,
        block_size=4,
        num_device_blocks=8,
        num_host_blocks=num_host_blocks,
        dtype=dtype,
    )


def _fill_block(eng, layer, block, seed):
    rng = np.random.default_rng(seed)
    shape = eng.kv_cache[layer].shape[1:]
    data = rng.standard_normal((1,) + shape).astype(np.float32)
    cache = list(eng.kv_cache)
    cache[layer] = cache[layer].at[block].set(
        jnp.asarray(data[0], dtype=eng.dtype)
    )
    eng.kv_cache = tuple(cache)
    return data[0]


class TestCopy:
    def test_copy_duplicates_contents(self):
        eng = _make_engine()
        want0 = _fill_block(eng, 0, 1, seed=0)
        want1 = _fill_block(eng, 1, 1, seed=1)
        eng.copy([(1, 5)])
        np.testing.assert_array_equal(np.asarray(eng.kv_cache[0][5]), want0)
        np.testing.assert_array_equal(np.asarray(eng.kv_cache[1][5]), want1)

    def test_copy_multiple_pairs_and_padding(self):
        eng = _make_engine()
        blocks = {}
        for b in (0, 1, 2):
            blocks[b] = _fill_block(eng, 0, b, seed=10 + b)
        # 3 pairs → padded to the 16-pair bucket; pad entries must be inert.
        eng.copy([(0, 4), (1, 5), (2, 6)])
        for src, dst in [(0, 4), (1, 5), (2, 6)]:
            np.testing.assert_array_equal(
                np.asarray(eng.kv_cache[0][dst]), blocks[src]
            )
        # Block 7 untouched (pad pairs dropped, not scattered to index 0/-1).
        assert np.all(np.asarray(eng.kv_cache[0][7]) == 0)
        assert np.all(np.asarray(eng.kv_cache[0][3]) == 0)

    def test_copy_then_diverge_no_alias(self):
        """After CoW the two blocks are independent: writing new tokens to
        the fork's block must not change the parent's block (and vice
        versa) — the data-level guarantee behind best_of divergence."""
        eng = _make_engine()
        src_data = _fill_block(eng, 0, 2, seed=3)
        eng.copy([(2, 6)])
        # Append a "new token" into slot (block 6, offset 3) only.
        rng = np.random.default_rng(99)
        k_new = jnp.asarray(
            rng.standard_normal((1, 2, 16)), dtype=eng.dtype
        )
        v_new = jnp.asarray(
            rng.standard_normal((1, 2, 16)), dtype=eng.dtype
        )
        slot = jnp.asarray([6 * 4 + 3], dtype=jnp.int32)
        cache = list(eng.kv_cache)
        cache[0] = write_kv_cache(cache[0], k_new, v_new, slot)
        eng.kv_cache = tuple(cache)
        # Parent block unchanged; fork block differs only at offset 3.
        np.testing.assert_array_equal(np.asarray(eng.kv_cache[0][2]), src_data)
        np.testing.assert_array_equal(
            np.asarray(eng.kv_cache[0][6][:3]), src_data[:3]
        )
        assert not np.array_equal(
            np.asarray(eng.kv_cache[0][6][3]), src_data[3]
        )

    def test_copy_int8_scales_follow(self):
        eng = _make_engine(dtype=jnp.int8)
        cache = list(eng.kv_scales)
        cache[0] = cache[0].at[1].set(0.5)
        eng.kv_scales = tuple(cache)
        c2 = list(eng.kv_cache)
        c2[0] = c2[0].at[1].set(7)
        eng.kv_cache = tuple(c2)
        eng.copy([(1, 3)])
        assert np.all(np.asarray(eng.kv_scales[0][3]) == 0.5)
        assert np.all(np.asarray(eng.kv_cache[0][3]) == 7)


class TestSwap:
    def test_swap_round_trip(self):
        eng = _make_engine()
        want = _fill_block(eng, 0, 2, seed=5)
        want_l1 = _fill_block(eng, 1, 2, seed=6)
        eng.execute(
            blocks_to_swap_in=[],
            blocks_to_swap_out=[(2, 0)],
            blocks_to_copy=[],
        )
        # Clobber the device block, then swap back into a different block.
        c = list(eng.kv_cache)
        c[0] = c[0].at[2].set(0.0)
        eng.kv_cache = tuple(c)
        eng.execute(
            blocks_to_swap_in=[(0, 7)],
            blocks_to_swap_out=[],
            blocks_to_copy=[],
        )
        got = np.asarray(eng.kv_cache[0][7], dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
        got1 = np.asarray(eng.kv_cache[1][7], dtype=np.float32)
        np.testing.assert_allclose(got1, want_l1, rtol=1e-2, atol=1e-2)


class TestForkAttentionOracle:
    def test_forked_sequences_attend_to_correct_kv(self):
        """End-to-end data check for the CoW path: build a 6-token sequence,
        CoW-duplicate its half-full last block, append a different 7th
        token to parent and fork, and verify each side's paged attention
        matches a dense oracle over its OWN token history."""
        eng = _make_engine()
        hk, d, bs = 2, 16, 4
        rng = np.random.default_rng(42)
        k_hist = rng.standard_normal((7, hk, d)).astype(np.float32)
        v_hist = rng.standard_normal((7, hk, d)).astype(np.float32)
        k_fork = rng.standard_normal((hk, d)).astype(np.float32)
        v_fork = rng.standard_normal((hk, d)).astype(np.float32)

        # Parent occupies blocks [0, 1]; write tokens 0..5.
        cache = list(eng.kv_cache)
        slots = jnp.arange(6, dtype=jnp.int32)  # blocks 0,1 offsets 0..1
        cache[0] = write_kv_cache(
            cache[0], jnp.asarray(k_hist[:6]), jnp.asarray(v_hist[:6]), slots
        )
        eng.kv_cache = tuple(cache)

        # Fork: block 1 is shared & half full → CoW to block 2.
        eng.copy([(1, 2)])

        # Parent appends token 6 at slot (1, 2); fork appends its own
        # different token at slot (2, 2).
        cache = list(eng.kv_cache)
        cache[0] = write_kv_cache(
            cache[0],
            jnp.asarray(np.stack([k_hist[6], k_fork])),
            jnp.asarray(np.stack([v_hist[6], v_fork])),
            jnp.asarray([1 * bs + 2, 2 * bs + 2], dtype=jnp.int32),
        )
        eng.kv_cache = tuple(cache)

        q = rng.standard_normal((1, 2 * hk, d)).astype(np.float32)

        def oracle(k_seq, v_seq):
            # Dense GQA attention for a single decode query.
            scale = 1.0 / np.sqrt(d)
            out = np.zeros((2 * hk, d), np.float32)
            for h in range(2 * hk):
                kh = k_seq[:, h // 2]
                vh = v_seq[:, h // 2]
                logits = (q[0, h] @ kh.T) * scale
                w = np.exp(logits - logits.max())
                w /= w.sum()
                out[h] = w @ vh
            return out

        k_view, v_view = kv_cache_view(eng.kv_cache[0], hk, d)
        qsl = jnp.asarray([0, 1], dtype=jnp.int32)

        def paged(table):
            return np.asarray(
                ragged_paged_attention_xla(
                    jnp.asarray(q),
                    k_view,
                    v_view,
                    block_tables=jnp.asarray([table], dtype=jnp.int32),
                    seq_lens=jnp.asarray([7], dtype=jnp.int32),
                    query_start_loc=qsl,
                    scale=1.0 / np.sqrt(d),
                    block_size=bs,
                )
            )[0]

        got_parent = paged([0, 1])
        got_fork = paged([0, 2])

        want_parent = oracle(k_hist, v_hist)
        k_f = np.concatenate([k_hist[:6], k_fork[None]])
        v_f = np.concatenate([v_hist[:6], v_fork[None]])
        want_fork = oracle(k_f, v_f)

        np.testing.assert_allclose(got_parent, want_parent, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(got_fork, want_fork, rtol=2e-2, atol=2e-2)
        # The two outputs must genuinely differ (fork saw its own token).
        assert not np.allclose(got_parent, got_fork, atol=1e-3)


class TestDeviceToDeviceSwap:
    """swap_blocks with both caches on device (ref:
    csrc/src/cache_manager.rs:18-128 cross-GPU swap; here cross-engine)."""

    def test_blocks_copied_between_engines(self):
        src = _make_engine()
        dst = _make_engine()
        a = _fill_block(src, 0, 2, seed=7)
        b = _fill_block(src, 1, 5, seed=8)
        src.swap_blocks_to(dst, [(2, 3), (5, 1)])
        np.testing.assert_allclose(
            np.asarray(dst.kv_cache[0][3], dtype=np.float32), a, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dst.kv_cache[1][1], dtype=np.float32), b, atol=1e-6
        )
        # Source unchanged.
        np.testing.assert_allclose(
            np.asarray(src.kv_cache[0][2], dtype=np.float32), a, atol=1e-6
        )

    def test_int8_scales_move_too(self):
        src = _make_engine(dtype=jnp.int8)
        dst = _make_engine(dtype=jnp.int8)
        cache = list(src.kv_cache)
        cache[0] = cache[0].at[4].set(7)
        src.kv_cache = tuple(cache)
        scales = list(src.kv_scales)
        scales[0] = scales[0].at[4].set(0.25)
        src.kv_scales = tuple(scales)
        src.swap_blocks_to(dst, [(4, 6)])
        assert int(np.asarray(dst.kv_cache[0][6]).flat[0]) == 7
        assert float(np.asarray(dst.kv_scales[0][6]).flat[0]) == 0.25
