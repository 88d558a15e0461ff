"""Native (C++) block-manager core vs the Python reference implementation.

Randomized differential test: drive both managers through the same sequence
of operations (allocate, decode appends with CoW, fork, swap out/in, free)
and require identical observable behavior — statuses, block tables, CoW
pairs, swap mappings, and free-pool counts.
"""

import numpy as np
import pytest

from atoma_infer_tpu.core.block_manager import (
    AllocationStatus,
    BlockSpaceManager,
)
from atoma_infer_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

native = pytest.importorskip("atoma_infer_tpu.native")
if not native.available():  # pragma: no cover - toolchain-specific
    pytest.skip("native core unavailable", allow_module_level=True)

from atoma_infer_tpu.native.block_manager import (  # noqa: E402
    NativeBlockSpaceManager,
    fill_slot_mapping_native,
)

BLOCK = 8


def make_group(request_id, seq_id, prompt_len, n=1):
    seqs = [
        Sequence(seq_id + i, "x", list(range(prompt_len)), BLOCK)
        for i in range(n)
    ]
    return SequenceGroup(request_id=request_id, sequences=seqs)


def managers(device=16, host=8, sliding_window=None):
    py = BlockSpaceManager(BLOCK, device, host, sliding_window=sliding_window)
    nat = NativeBlockSpaceManager(
        BLOCK, device, host, sliding_window=sliding_window
    )
    return py, nat


class TestNativeEquivalence:
    def test_allocate_and_free(self):
        py, nat = managers()
        g = make_group("r0", 0, prompt_len=20)
        assert py.can_allocate(g) == nat.can_allocate(g)
        py.allocate(g)
        nat.allocate(g)
        seq = g.get_first_seq()
        assert py.get_block_table_ids(0) == nat.get_block_table_ids(0)
        assert (
            py.get_num_free_device_blocks() == nat.get_num_free_device_blocks()
        )
        py.free(seq)
        nat.free(seq)
        assert (
            py.get_num_free_device_blocks() == nat.get_num_free_device_blocks()
        )

    def test_append_with_cow(self):
        py, nat = managers()
        g = make_group("r0", 0, prompt_len=6, n=1)  # partial last block
        py.allocate(g)
        nat.allocate(g)
        seq = g.get_first_seq()
        seq.status = SequenceStatus.RUNNING
        # Fork so the last block is shared → CoW on append.
        child = seq.fork(1)
        py.fork(seq, child)
        nat.fork(seq, child)
        seq.sequence_data.append_token_id(1, 0.0)
        pairs_py = py.append_slots(seq)
        pairs_nat = nat.append_slots(seq)
        assert pairs_py == pairs_nat
        assert len(pairs_py) == 1  # shared last block copied
        assert py.get_block_table_ids(0) == nat.get_block_table_ids(0)
        assert py.get_block_table_ids(1) == nat.get_block_table_ids(1)

    def test_swap_roundtrip(self):
        py, nat = managers(device=8, host=8)
        g = make_group("r0", 0, prompt_len=24)
        py.allocate(g)
        nat.allocate(g)
        seq = g.get_first_seq()
        seq.status = SequenceStatus.RUNNING
        assert py.can_swap_out(g) == nat.can_swap_out(g)
        out_py = py.swap_out(g)
        out_nat = nat.swap_out(g)
        assert out_py == out_nat
        seq.status = SequenceStatus.SWAPPED
        assert py.can_swap_in(g) == nat.can_swap_in(g)
        in_py = py.swap_in(g)
        in_nat = nat.swap_in(g)
        assert in_py == in_nat
        assert py.get_block_table_ids(0) == nat.get_block_table_ids(0)

    def test_watermark_and_never(self):
        py, nat = managers(device=4, host=0)
        g_big = make_group("big", 0, prompt_len=BLOCK * 10)
        assert py.can_allocate(g_big) == nat.can_allocate(g_big)
        assert nat.can_allocate(g_big) == AllocationStatus.NEVER

    def test_randomized_lifecycle(self):
        rng = np.random.RandomState(0)
        py, nat = managers(device=32, host=16)
        live = {}
        next_id = 0
        for step in range(300):
            op = rng.randint(0, 4)
            if op == 0 or not live:  # admit
                plen = int(rng.randint(1, 40))
                g = make_group(f"r{next_id}", next_id, plen)
                st_py, st_nat = py.can_allocate(g), nat.can_allocate(g)
                assert st_py == st_nat, step
                if st_py == AllocationStatus.OK:
                    py.allocate(g)
                    nat.allocate(g)
                    seq = g.get_first_seq()
                    seq.status = SequenceStatus.RUNNING
                    live[next_id] = g
                next_id += 1
            elif op == 1:  # decode append
                sid = int(rng.choice(list(live)))
                g = live[sid]
                seq = g.get_first_seq()
                if seq.status != SequenceStatus.RUNNING:
                    continue
                assert py.can_append_slots(g) == nat.can_append_slots(g)
                if py.can_append_slots(g):
                    seq.sequence_data.append_token_id(0, 0.0)
                    assert py.append_slots(seq) == nat.append_slots(seq), step
            elif op == 2:  # finish/free
                sid = int(rng.choice(list(live)))
                g = live.pop(sid)
                for s in g.get_seqs():
                    py.free(s)
                    nat.free(s)
            else:  # swap out + in
                sid = int(rng.choice(list(live)))
                g = live[sid]
                seq = g.get_first_seq()
                if seq.status != SequenceStatus.RUNNING:
                    continue
                assert py.can_swap_out(g) == nat.can_swap_out(g), step
                if py.can_swap_out(g):
                    assert py.swap_out(g) == nat.swap_out(g), step
                    seq.status = SequenceStatus.SWAPPED
                    st = py.can_swap_in(g)
                    assert st == nat.can_swap_in(g), step
                    if st == AllocationStatus.OK:
                        assert py.swap_in(g) == nat.swap_in(g), step
                        seq.status = SequenceStatus.RUNNING
            assert (
                py.get_num_free_device_blocks()
                == nat.get_num_free_device_blocks()
            ), step
            assert (
                py.get_num_free_host_blocks()
                == nat.get_num_free_host_blocks()
            ), step
            for sid, g in live.items():
                s = g.get_first_seq()
                if py.has_block_table(s):
                    assert py.get_block_table_ids(s.seq_id) == (
                        nat.get_block_table_ids(s.seq_id)
                    ), step

    def test_sliding_window_reuse(self):
        py, nat = managers(sliding_window=BLOCK * 2)
        g = make_group("r0", 0, prompt_len=BLOCK * 4)
        py.allocate(g)
        nat.allocate(g)
        assert py.get_block_table_ids(0) == nat.get_block_table_ids(0)
        assert len(nat.get_block_table_ids(0)) == 2  # capped at window blocks


class TestNativeSlotMapping:
    def test_matches_python(self):
        table = np.asarray([7, 2, 9, 4], dtype=np.int32)
        got = fill_slot_mapping_native(table, BLOCK, 5, 30)
        want = [
            int(table[(p // BLOCK) % len(table)]) * BLOCK + p % BLOCK
            for p in range(5, 30)
        ]
        assert list(got) == want


class TestNativePrefixCaching:
    """Content-hash prefix caching parity: the C++ core's cached allocator +
    LRU evictor must match the Python CachedBlockAllocator block-for-block
    (tables, free counts incl. evictable, computed prefixes, and the cached
    token count that lets prompts skip prefill)."""

    def _managers(self, device=16, host=4):
        py = BlockSpaceManager(
            BLOCK, device, host, enable_prefix_caching=True
        )
        nat = NativeBlockSpaceManager(
            BLOCK, device, host, enable_prefix_caching=True
        )
        assert nat.enable_prefix_caching
        return py, nat

    def _twin_groups(self, request_id, seq_id, tokens, n=1):
        """Identical groups with DISTINCT Sequence objects per manager
        (allocate() mutates seq computed-token state)."""
        def mk():
            seqs = [
                Sequence(seq_id + i, "x", list(tokens), BLOCK)
                for i in range(n)
            ]
            return SequenceGroup(request_id=request_id, sequences=seqs)

        return mk(), mk()

    def _finish_prefill(self, py, nat, g_py, g_nat):
        """Simulate prefill completion: computed tokens = prompt, blocks
        marked computed (what the scheduler does after a prefill step)."""
        for mgr, g in ((py, g_py), (nat, g_nat)):
            for s in g.get_seqs():
                data = s.sequence_data
                delta = s.get_prompt_len() - data.get_num_computed_tokens()
                if delta > 0:
                    data.update_num_computed_tokens(delta)
                mgr.compute_full_blocks_in_sequence(s)

    def test_second_request_hits_cached_prefix(self):
        py, nat = self._managers()
        tokens = list(range(BLOCK * 3))  # 3 full hashable blocks
        a_py, a_nat = self._twin_groups("a", 0, tokens)
        py.allocate(a_py)
        nat.allocate(a_nat)
        assert py.get_block_table_ids(0) == nat.get_block_table_ids(0)
        self._finish_prefill(py, nat, a_py, a_nat)
        assert py.get_all_computed_blocks(
            a_py.get_first_seq()
        ) == nat.get_all_computed_blocks(a_nat.get_first_seq())

        # Same prompt again while the first is live: shares blocks, and the
        # cached prefix advances computed tokens identically (capped at
        # prompt_len - 1 so one token recomputes).
        b_py, b_nat = self._twin_groups("b", 10, tokens)
        py.allocate(b_py)
        nat.allocate(b_nat)
        assert py.get_block_table_ids(10) == nat.get_block_table_ids(10)
        assert py.get_block_table_ids(10) == py.get_block_table_ids(0)
        c_py = b_py.get_first_seq().sequence_data.get_num_computed_tokens()
        c_nat = b_nat.get_first_seq().sequence_data.get_num_computed_tokens()
        assert c_py == c_nat == len(tokens) - 1
        assert (
            py.get_num_free_device_blocks()
            == nat.get_num_free_device_blocks()
        )

    def test_revive_after_free_and_eviction_order(self):
        py, nat = self._managers(device=8, host=0)
        tokens = list(range(BLOCK * 2))
        a_py, a_nat = self._twin_groups("a", 0, tokens)
        py.allocate(a_py)
        nat.allocate(a_nat)
        self._finish_prefill(py, nat, a_py, a_nat)
        py.access_all_blocks_in_sequence(a_py.get_first_seq(), 1.0)
        nat.access_all_blocks_in_sequence(a_nat.get_first_seq(), 1.0)
        py.free(a_py.get_first_seq())
        nat.free(a_nat.get_first_seq())
        # Blocks are evictable, still counted free, revivable by hash.
        assert (
            py.get_num_free_device_blocks()
            == nat.get_num_free_device_blocks()
            == 8
        )
        b_py, b_nat = self._twin_groups("b", 10, tokens)
        py.allocate(b_py)
        nat.allocate(b_nat)
        assert py.get_block_table_ids(10) == nat.get_block_table_ids(10)
        cb = b_py.get_first_seq().sequence_data.get_num_computed_tokens()
        cn = b_nat.get_first_seq().sequence_data.get_num_computed_tokens()
        assert cb == cn == len(tokens) - 1

    def test_eviction_under_pressure_matches(self):
        py, nat = self._managers(device=6, host=0)
        # Fill the pool with two cached prompts, free both, then allocate a
        # DIFFERENT prompt that forces evictions — victim choice (LRU with
        # ties) must match so tables stay identical.
        t1 = list(range(BLOCK * 2))
        t2 = list(range(100, 100 + BLOCK * 2))
        for rid, sid, toks, ts in (("a", 0, t1, 1.0), ("b", 10, t2, 2.0)):
            g_py, g_nat = self._twin_groups(rid, sid, toks)
            py.allocate(g_py)
            nat.allocate(g_nat)
            self._finish_prefill(py, nat, g_py, g_nat)
            py.access_all_blocks_in_sequence(g_py.get_first_seq(), ts)
            nat.access_all_blocks_in_sequence(g_nat.get_first_seq(), ts)
            py.free(g_py.get_first_seq())
            nat.free(g_nat.get_first_seq())

        t3 = list(range(200, 200 + BLOCK * 5))
        c_py, c_nat = self._twin_groups("c", 20, t3)
        py.allocate(c_py)
        nat.allocate(c_nat)
        assert py.get_block_table_ids(20) == nat.get_block_table_ids(20)
        assert (
            py.get_num_free_device_blocks()
            == nat.get_num_free_device_blocks()
        )
        # The older prompt (t1) was evicted; t2's unevicted blocks can
        # still be revived — allocate t2 again and compare hit state.
        d_py, d_nat = self._twin_groups("d", 30, t2)
        py.free(c_py.get_first_seq())
        nat.free(c_nat.get_first_seq())
        py.allocate(d_py)
        nat.allocate(d_nat)
        assert py.get_block_table_ids(30) == nat.get_block_table_ids(30)
        cd = d_py.get_first_seq().sequence_data.get_num_computed_tokens()
        cn = d_nat.get_first_seq().sequence_data.get_num_computed_tokens()
        assert cd == cn

    def test_partial_block_not_hashed(self):
        py, nat = self._managers()
        tokens = list(range(BLOCK + 3))  # 1 full block + partial
        a_py, a_nat = self._twin_groups("a", 0, tokens)
        py.allocate(a_py)
        nat.allocate(a_nat)
        self._finish_prefill(py, nat, a_py, a_nat)
        b_py, b_nat = self._twin_groups("b", 10, tokens)
        py.allocate(b_py)
        nat.allocate(b_nat)
        # Only the full first block is shared.
        assert py.get_block_table_ids(10) == nat.get_block_table_ids(10)
        assert (
            py.get_block_table_ids(10)[0] == py.get_block_table_ids(0)[0]
        )
        assert (
            py.get_block_table_ids(10)[1] != py.get_block_table_ids(0)[1]
        )
        cb = b_py.get_first_seq().sequence_data.get_num_computed_tokens()
        cn = b_nat.get_first_seq().sequence_data.get_num_computed_tokens()
        assert cb == cn == BLOCK

    def test_randomized_prefix_lifecycle(self):
        rng = np.random.RandomState(7)
        py, nat = self._managers(device=24, host=0)
        prompts = [list(range(p, p + BLOCK * rng.randint(1, 4)))
                   for p in (0, 50, 100, 0, 50, 150, 0)]
        live = []
        sid = 0
        for step in range(60):
            op = rng.rand()
            if op < 0.5 and len(live) < 5:
                toks = prompts[rng.randint(len(prompts))]
                g_py, g_nat = self._twin_groups(f"r{step}", sid, toks)
                sid += 10
                st_py, st_nat = py.can_allocate(g_py), nat.can_allocate(g_nat)
                assert st_py == st_nat
                if st_py != AllocationStatus.OK:
                    continue
                py.allocate(g_py)
                nat.allocate(g_nat)
                self._finish_prefill(py, nat, g_py, g_nat)
                ts = float(step)
                py.access_all_blocks_in_sequence(g_py.get_first_seq(), ts)
                nat.access_all_blocks_in_sequence(g_nat.get_first_seq(), ts)
                live.append((g_py, g_nat))
            elif live:
                idx = rng.randint(len(live))
                g_py, g_nat = live.pop(idx)
                py.free(g_py.get_first_seq())
                nat.free(g_nat.get_first_seq())
            for g_py, g_nat in live:
                s_py, s_nat = g_py.get_first_seq(), g_nat.get_first_seq()
                assert py.get_block_table_ids(
                    s_py.seq_id
                ) == nat.get_block_table_ids(s_nat.seq_id)
            assert (
                py.get_num_free_device_blocks()
                == nat.get_num_free_device_blocks()
            )
