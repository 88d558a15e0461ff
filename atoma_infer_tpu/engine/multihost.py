"""Multi-host lockstep engine driver (docs/architecture.md §multi-host).

The scheduler is REPLICATED, not sharded: host 0 is the only frontend; at
every engine step it broadcasts the admission delta (serialized request
groups + aborts) to all hosts, and every host runs the identical
deterministic scheduler over the identical request stream, then dispatches
the same SPMD step over the global mesh. No other cross-host scheduler
traffic exists. (The reference is single-host — its NCCL communicator spans
local GPUs only, models/src/multi_gpu.rs:8-188 — so this layer is
TPU-native territory.)

Host 0: ``attach_primary(service)`` hooks the engine so each ``step()``
first broadcasts that step's admissions; run the service normally, then
``shutdown(service)`` releases the followers.

Hosts 1..N-1: ``follower_loop(service)`` blocks on the broadcast, mirrors
admissions/aborts into the local (identical) scheduler, and steps the
engine in lockstep. Sampling is seeded device-side PRNG folded by sequence
position, so every host samples identical tokens from the identical
replicated program.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List

from ..sampling_params import (
    NextTokenChooserParameters,
    StoppingCriteriaParameters,
)
from ..sequence import Sequence, SequenceGroup

logger = logging.getLogger(__name__)


def serialize_group(group: SequenceGroup) -> Dict[str, Any]:
    first = group.get_first_seq()
    return {
        "rid": group.request_id,
        "prompt": first.prompt,
        "ids": list(first.sequence_data.prompt_token_ids),
        "seq_ids": sorted(group.sequences),
        "eos": first.eos_token_id,
        "params": dataclasses.asdict(group.next_token_chooser_params),
        "stopping": dataclasses.asdict(group.stopping_criteria),
        "logprobs": group.logprobs,
        "best_of": getattr(group, "best_of", 1),
        "top_n": getattr(group, "top_n_tokens", 0),
        "num_return": getattr(group, "num_return", 1),
        # Host 0 assigns the pipeline cohort at admission (least-loaded);
        # followers must mirror it, not recompute it.
        "cohort": getattr(group, "cohort", 0),
    }


def deserialize_group(d: Dict[str, Any], block_size: int) -> SequenceGroup:
    sequences = [
        Sequence(
            seq_id=sid,
            prompt=d["prompt"],
            prompt_token_ids=list(d["ids"]),
            block_size=block_size,
            eos_token_id=d["eos"],
        )
        for sid in d["seq_ids"]
    ]
    group = SequenceGroup(
        request_id=d["rid"],
        sequences=sequences,
        next_token_chooser_params=NextTokenChooserParameters(**d["params"]),
        stopping_criteria=StoppingCriteriaParameters(**d["stopping"]),
        logprobs=d["logprobs"],
        best_of=d["best_of"],
        top_n_tokens=d["top_n"],
    )
    group.num_return = d["num_return"]
    group.cohort = d.get("cohort", 0)
    return group


class PrimarySync:
    """Installed on host 0's engine: ``pre_step`` (called by LlmEngine at
    the top of every ``step()``) is the SINGLE admission/abort point —
    it drains the pending-request queue, broadcasts the delta, and applies
    it locally, atomically from the scheduler's point of view. Buffering
    the broadcast at ``add_request`` time instead (the earlier design) let
    a request arriving mid-step-burst reach the followers' schedulers one
    or more steps before the primary's, breaking the identical-request-
    stream invariant the replicated schedulers rely on."""

    def __init__(self, engine):
        self.engine = engine

    def pre_step(self) -> None:
        from ..parallel.distributed import broadcast_step_payload

        engine = self.engine
        # Requests parked by the run loop's idle path, then anything queued
        # since (add_request only enqueues; with pre_step installed the run
        # loop never admits directly — llm_engine.run()).
        admits = list(engine._admit_backlog)
        engine._admit_backlog.clear()
        while True:
            try:
                group = engine._new_requests.get_nowait()
            except Exception:
                break
            if group is None:  # shutdown sentinel — leave for the run loop
                engine._new_requests.put_nowait(None)
                break
            admits.append(group)
        aborts: List[str] = []
        q = engine._pending_aborts
        while True:
            try:
                aborts.append(q.get_nowait())
            except Exception:
                break
        payload = {
            "admit": [serialize_group(g) for g in admits],
            "aborts": aborts,
            "stop": False,
        }
        broadcast_step_payload(payload)
        for group in admits:
            engine._scheduler_for(group).add_sequence_group(group)
        # step()'s _drain_aborts consumes exactly this snapshot; aborts
        # arriving after this point wait for the next step's broadcast.
        engine._abort_snapshot.extend(aborts)


def attach_primary(service) -> PrimarySync:
    sync = PrimarySync(service.engine)
    service.engine.pre_step = sync.pre_step
    return sync


def shutdown(service) -> None:
    """Host 0: release the followers after the engine drains."""
    from ..parallel.distributed import broadcast_step_payload

    broadcast_step_payload({"admit": [], "aborts": [], "stop": True})


def follower_loop(service):
    """Hosts 1..N-1: mirror host 0's request stream and step in lockstep.
    Returns the finished outputs (identical to host 0's, by construction)
    when host 0 broadcasts the stop flag."""
    from ..parallel.distributed import broadcast_step_payload

    engine = service.engine
    finished = []
    while True:
        payload = broadcast_step_payload(None)
        for d in payload["admit"]:
            group = deserialize_group(d, service.block_size)
            engine._groups[group.request_id] = group
            engine._scheduler_for(group).add_sequence_group(group)
        for rid in payload["aborts"]:
            engine._pending_aborts.put(rid)
        if payload["stop"]:
            return finished
        finished.extend(engine.step())
