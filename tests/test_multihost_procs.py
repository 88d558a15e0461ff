"""Multi-host path with REAL processes: two jax.distributed CPU processes
join one runtime, host 0 broadcasts step payloads, and both hosts' replicated
schedulers produce bit-identical schedule traces (the load-bearing property
of the multi-host design — docs/architecture.md §multi-host; the in-process
determinism variant lives in tests/test_multihost.py).
"""

from __future__ import annotations

import socket
import subprocess
import sys
import textwrap

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(script: str, timeout: float = 150.0):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost subprocess timed out")
        outs.append((p.returncode, out))
    return outs


_PRELUDE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
from atoma_infer_tpu.parallel.distributed import (
    init_distributed, broadcast_step_payload, is_primary)
init_distributed(f"127.0.0.1:{port}", 2, pid)
"""


class TestTwoProcessRuntime:
    def test_broadcast_roundtrip(self):
        script = _PRELUDE + textwrap.dedent(
            """
            payload = {"reqs": [[1, 2, 3]], "step": 7} if is_primary() else None
            out = broadcast_step_payload(payload)
            print("RESULT", pid, out == {"reqs": [[1, 2, 3]], "step": 7},
                  flush=True)
            """
        )
        outs = _run_pair(script)
        for rc, out in outs:
            assert rc == 0, out
            assert "True" in [
                ln.split()[-1]
                for ln in out.splitlines()
                if ln.startswith("RESULT")
            ], out

    def test_cross_process_schedule_determinism(self):
        """Host 0 originates 3 steps of admissions; both processes run the
        replicated scheduler on the broadcast stream and must print the same
        schedule-trace digest."""
        script = _PRELUDE + textwrap.dedent(
            """
            import hashlib, json
            from atoma_infer_tpu.config import CacheConfig, SchedulerConfig
            from atoma_infer_tpu.core.block_manager import BlockSpaceManager
            from atoma_infer_tpu.core.scheduler import Scheduler
            from atoma_infer_tpu.sequence import Sequence, SequenceGroup

            BS = 16
            sched = Scheduler(
                SchedulerConfig(
                    max_num_batched_tokens=256, max_num_sequences=8,
                    max_model_len=512, enable_chunked_prefill=True,
                ),
                CacheConfig.new_from_blocks(BS, 24, 24),
                block_manager=BlockSpaceManager(
                    block_size=BS, num_device_blocks=24, num_host_blocks=24,
                    watermark=0.0,
                ),
            )
            trace = hashlib.sha256()
            for step in range(3):
                payload = None
                if is_primary():
                    payload = [
                        {"rid": f"r{step}-{i}", "sid": step * 10 + i,
                         "prompt": list(range(20 + 30 * i))}
                        for i in range(2)
                    ]
                payload = broadcast_step_payload(payload)
                for req in payload:
                    seq = Sequence(req["sid"], "p", req["prompt"], BS)
                    sched.add_sequence_group(
                        SequenceGroup(request_id=req["rid"], sequences=[seq],
                                      arrival_time=float(step))
                    )
                metas, outs = sched.schedule()
                record = [
                    (m.request_id, m.token_chunk_size, m.is_prompt,
                     sorted(map(tuple, (m.block_tables or {}).items())))
                    for m in metas
                ]
                trace.update(json.dumps(record, default=list).encode())
            print("DIGEST", pid, trace.hexdigest(), flush=True)
            """
        )
        outs = _run_pair(script)
        digests = []
        for rc, out in outs:
            assert rc == 0, out
            lines = [ln for ln in out.splitlines() if ln.startswith("DIGEST")]
            assert lines, out
            digests.append(lines[-1].split()[-1])
        assert digests[0] == digests[1]
