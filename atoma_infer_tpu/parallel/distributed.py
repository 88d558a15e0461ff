"""Multi-host serving groundwork (BASELINE config #5: 70B INT8, v5e-16).

The reference is single-host (its only parallelism is one NCCL communicator
over local GPUs, models/src/multi_gpu.rs:8-188); multi-host is TPU-native
territory. The design (docs/architecture.md §multi-host) is the standard JAX
multi-controller SPMD pattern:

- every host runs the SAME engine binary and joins one jax.distributed
  runtime (`init_distributed`);
- the mesh spans all global devices; weights/KV shard over it exactly as in
  single-host TP (parallel/sharding.py) — XLA routes collectives over ICI
  within a slice and DCN across slices;
- the SCHEDULER IS REPLICATED, NOT SHARDED: host 0 is the only HTTP
  frontend; each engine step it broadcasts the step's admitted request
  deltas (tokenized prompts + sampling params) to all hosts
  (`broadcast_step_payload`), and every host runs the identical,
  deterministic scheduler on the identical request stream. Determinism is
  load-bearing — each host computes the same block tables / slot mappings
  and feeds its local shard of the same jitted step; no cross-host
  scheduler chatter is needed beyond the one broadcast
  (tests/test_multihost.py proves schedule-trace equality).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the cross-host JAX runtime (idempotent).

    With no arguments JAX discovers the topology from the TPU metadata
    server / environment (the normal path on Cloud TPU pods); explicit
    values support bring-your-own clusters.
    """
    global _initialized
    if _initialized:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "joined distributed runtime: process %d/%d, %d local + %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the host that runs the HTTP frontend and originates the
    per-step request broadcast."""
    return process_index() == 0


# ---------------------------------------------------------------- broadcast
# Step payloads are tiny (a few requests' token ids + params per step), so
# JSON over a padded uint8 device broadcast is simpler and fast enough; the
# fixed bucket sizes keep the broadcast program cache small.

_BUCKETS = (1 << 10, 1 << 14, 1 << 18, 1 << 22)


def encode_payload(obj: Any) -> np.ndarray:
    """Python object → length-prefixed uint8 array padded to a size bucket.

    zlib level 1: admission payloads are dominated by prompt token-id
    lists, which compress 3-5× — often the difference between the one-
    broadcast small bucket and a two-phase big one — at ~100 µs/100 KB."""
    import zlib

    raw = zlib.compress(
        json.dumps(obj, separators=(",", ":")).encode("utf-8"), 1
    )
    size = len(raw)
    for b in _BUCKETS:
        if size + 8 <= b:
            buf = np.zeros((b,), np.uint8)
            buf[:8] = np.frombuffer(
                np.int64(size).tobytes(), np.uint8
            )
            buf[8 : 8 + size] = np.frombuffer(raw, np.uint8)
            return buf
    raise ValueError(f"step payload too large: {size} bytes")


def decode_payload(buf: np.ndarray) -> Any:
    import zlib

    size = int(np.frombuffer(bytes(buf[:8]), np.int64)[0])
    return json.loads(
        zlib.decompress(bytes(buf[8 : 8 + size])).decode("utf-8")
    )


def broadcast_step_payload(obj: Any = None) -> Any:
    """Host 0's ``obj`` → every host (host 0 passes the value, others None).

    Single-process: pure passthrough (no device traffic).

    The steady-decode delta (no admissions, no aborts) fits the smallest
    bucket, so the common case is ONE broadcast: the first-bucket buffer
    IS the payload (its inline size prefix is non-negative). Payloads that
    overflow send a first-bucket header whose size field is the NEGATED
    target bucket, and the full bucket follows in a second broadcast —
    the earlier always-two-phase design (size class, then buffer) doubled
    the per-step lockstep tax (measured 2.19 ms → see
    benchmarks/multihost_sync_bench.py)."""
    import jax

    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    B0 = _BUCKETS[0]
    buf = None
    if is_primary():
        buf = encode_payload(obj)
        if len(buf) <= B0:
            first = buf
        else:
            first = np.zeros((B0,), np.uint8)
            first[:8] = np.frombuffer(
                np.int64(-len(buf)).tobytes(), np.uint8
            )
    else:
        first = np.zeros((B0,), np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(first))
    size = int(np.frombuffer(bytes(out[:8]), np.int64)[0])
    if size >= 0:
        return decode_payload(out)
    big = buf if is_primary() else np.zeros((-size,), np.uint8)
    out = multihost_utils.broadcast_one_to_all(big)
    return decode_payload(np.asarray(out))
