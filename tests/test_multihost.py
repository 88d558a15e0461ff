"""Multi-host groundwork tests (BASELINE config #5; docs/architecture.md
§multi-host).

The multi-host design replicates the SCHEDULER on every host: host 0
broadcasts each step's admitted requests and every host runs the identical
deterministic scheduler so all hosts compute the same block tables / slot
mappings for the shared SPMD step. These tests prove the two load-bearing
properties on CPU without real multi-host hardware:

1. the scheduler is a deterministic function of the request stream — two
   independent instances fed the same arrivals produce bit-identical
   schedule traces through prefill, decode, preemption and swap;
2. the step-payload broadcast encoding round-trips.
"""

from __future__ import annotations


from atoma_infer_tpu.config import CacheConfig, SchedulerConfig
from atoma_infer_tpu.core.block_manager import BlockSpaceManager
from atoma_infer_tpu.core.scheduler import Scheduler
from atoma_infer_tpu.parallel.distributed import (
    broadcast_step_payload,
    decode_payload,
    encode_payload,
)
from atoma_infer_tpu.sampling_params import (
    NextTokenChooserParameters,
    StoppingCriteriaParameters,
)
from atoma_infer_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

BLOCK_SIZE = 16


def _make_scheduler():
    # Tight pools to force preemption + swap activity.
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=256,
        max_num_sequences=8,
        max_model_len=512,
        enable_chunked_prefill=True,
    )
    cache_cfg = CacheConfig.new_from_blocks(BLOCK_SIZE, 24, 24)
    mgr = BlockSpaceManager(
        block_size=BLOCK_SIZE,
        num_device_blocks=24,
        num_host_blocks=24,
        watermark=0.0,
    )
    return Scheduler(sched_cfg, cache_cfg, block_manager=mgr)


def _make_group(request_id, seq_id, prompt_len, arrival):
    """Deterministic group construction: explicit seq ids + arrival times
    (the per-host replica must build IDENTICAL state from the broadcast)."""
    seq = Sequence(
        seq_id=seq_id,
        prompt="p",
        prompt_token_ids=list(range(prompt_len)),
        block_size=BLOCK_SIZE,
    )
    return SequenceGroup(
        request_id=request_id,
        sequences=[seq],
        next_token_chooser_params=NextTokenChooserParameters(),
        stopping_criteria=StoppingCriteriaParameters(max_new_tokens=64),
        arrival_time=arrival,
    )


def _trace_entry(metas, outputs):
    """Canonical, comparable rendering of one scheduler step."""
    return {
        "scheduled": [
            (
                m.request_id,
                s.token_chunk_size,
                tuple(
                    (sid, tuple(tbl))
                    for sid, tbl in sorted(m.block_tables.items())
                ),
            )
            for m, s in zip(metas, outputs.scheduled_seq_groups)
        ],
        "swap_in": tuple(outputs.blocks_to_swap_in),
        "swap_out": tuple(outputs.blocks_to_swap_out),
        "copy": tuple(outputs.blocks_to_copy),
        "preempted": outputs.preempted,
    }


def _drive(sched, steps, arrivals):
    """Run ``steps`` scheduler iterations; ``arrivals[i]`` is the list of
    (request_id, seq_id, prompt_len) admitted before step i. Simulated
    model output: every running seq appends token 7 when its prefill is
    complete."""
    trace = []
    for i in range(steps):
        for req_id, seq_id, plen in arrivals.get(i, ()):
            sched.add_sequence_group(
                _make_group(req_id, seq_id, plen, arrival=float(i))
            )
        metas, outputs = sched.schedule()
        trace.append(_trace_entry(metas, outputs))
        for m in outputs.scheduled_seq_groups:
            g = m.seq_group
            g.update_num_computed_tokens(m.token_chunk_size)
            for seq in g.get_seqs(SequenceStatus.RUNNING):
                if seq.sequence_data.get_num_computed_tokens() == len(
                    seq.get_token_ids()
                ):
                    seq.append_token_id(7, 0.0)
            # Finish after 20 generated tokens to recycle blocks.
            for seq in g.get_seqs(SequenceStatus.RUNNING):
                if seq.get_output_len() >= 20:
                    seq.status = SequenceStatus.FINISHED_STOPPED
                    sched.free_seq(seq)
        sched.remove_finished_sequences()
    return trace


ARRIVALS = {
    0: [("r0", 0, 40), ("r1", 1, 100)],
    2: [("r2", 2, 200)],
    3: [("r3", 3, 64)],
    6: [("r4", 4, 150), ("r5", 5, 30)],
    10: [("r6", 6, 120)],
    15: [("r7", 7, 220)],
}


class TestReplicatedSchedulerDeterminism:
    def test_identical_traces_across_hosts(self):
        """Two 'hosts' running the replicated scheduler over the same
        broadcast request stream produce identical schedules (block
        tables, chunk sizes, swaps, CoW, preemptions) at every step."""
        t_a = _drive(_make_scheduler(), 60, ARRIVALS)
        t_b = _drive(_make_scheduler(), 60, ARRIVALS)
        assert t_a == t_b
        # The stream exercised the interesting paths.
        any_sched = any(e["scheduled"] for e in t_a)
        assert any_sched
        assert any(
            e["preempted"] or e["swap_out"] or e["swap_in"] for e in t_a
        )

    def test_trace_diverges_with_different_stream(self):
        """Sanity: the trace comparison is discriminating."""
        other = dict(ARRIVALS)
        other[2] = [("r2", 2, 48)]
        t_a = _drive(_make_scheduler(), 30, ARRIVALS)
        t_b = _drive(_make_scheduler(), 30, other)
        assert t_a != t_b


class TestStepPayloadBroadcast:
    def test_roundtrip(self):
        payload = {
            "requests": [
                {
                    "request_id": "r0",
                    "tokens": list(range(64)),
                    "params": {"temperature": 0.7, "top_k": 40},
                }
            ],
            "aborts": ["r9"],
        }
        assert decode_payload(encode_payload(payload)) == payload

    def test_bucket_sizes(self):
        small = encode_payload({"a": 1})
        big = encode_payload({"t": list(range(4000))})
        assert len(small) == 1 << 10
        assert len(big) > len(small)

    def test_single_process_passthrough(self):
        obj = {"requests": [], "aborts": []}
        assert broadcast_step_payload(obj) == obj
