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
