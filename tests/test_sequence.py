"""Sequence data / stage transition tests (ref: sequence.rs:2304-2423)."""

from atoma_infer_tpu.sequence import (
    SequenceData,
    SequenceStage,
    SequenceStatus,
)

from utils import create_dummy_prompt


def test_stage_transitions():
    data = SequenceData(list(range(10)))
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_uncomputed_tokens() == 10
    data.update_num_computed_tokens(4)
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_uncomputed_tokens() == 6
    data.update_num_computed_tokens(6)
    assert data.stage == SequenceStage.DECODE
    data.append_token_id(99, -0.5)
    assert data.get_num_uncomputed_tokens() == 1
    data.update_num_computed_tokens(1)
    assert data.cumulative_logprob == -0.5
    assert data.get_last_token_id() == 99


def test_reset_for_recompute():
    data = SequenceData(list(range(8)))
    data.update_num_computed_tokens(8)
    data.append_token_id(1, 0.0)
    data.update_num_computed_tokens(1)
    data.reset_state_for_recompute()
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_computed_tokens() == 0
    # All 9 tokens (prompt + generated) re-prefill.
    assert data.get_num_uncomputed_tokens() == 9


def test_num_new_tokens():
    seq, _ = create_dummy_prompt("r", 12)
    assert seq.get_num_new_tokens() == 12  # prefill wants the whole prompt
    seq.sequence_data.update_num_computed_tokens(12)
    seq.append_token_id(5, 0.0)
    assert seq.get_num_new_tokens() == 1  # decode wants one


def test_logical_block_accounting():
    seq, _ = create_dummy_prompt("r", 16, block_size=16)
    assert seq.num_logical_blocks == 1
    assert seq.num_empty_slots_in_last_block() == 0
    seq.append_token_id(1, 0.0)
    assert seq.num_logical_blocks == 2
    assert seq.num_empty_slots_in_last_block() == 15


def test_status_finished_reasons():
    assert SequenceStatus.FINISHED_STOPPED.finished_reason == "stopped"
    assert SequenceStatus.FINISHED_LENGTH_CAPPED.finished_reason == "length_capped"
    assert SequenceStatus.FINISHED_ABORTED.finished_reason == "aborted"
    assert SequenceStatus.FINISHED_IGNORED.finished_reason == "ignored"
    assert SequenceStatus.RUNNING.finished_reason is None
    assert not SequenceStatus.RUNNING.is_finished
    assert SequenceStatus.FINISHED_STOPPED.is_finished


def test_fork_deep_copies_state():
    seq, _ = create_dummy_prompt("r", 8)
    seq.sequence_data.update_num_computed_tokens(8)
    seq.append_token_id(3, -1.0)
    child = seq.fork(999)
    child.append_token_id(4, -2.0)
    assert seq.get_output_len() == 1
    assert child.get_output_len() == 2
    assert child.seq_id == 999
    assert child.get_cumulative_logprob() == -3.0


def test_group_max_num_running_seqs():
    _, group = create_dummy_prompt("r", 8, best_of=4)
    assert group.get_max_num_running_seqs() == 4
    _, group2 = create_dummy_prompt("r2", 8)
    assert group2.get_max_num_running_seqs() == 1
