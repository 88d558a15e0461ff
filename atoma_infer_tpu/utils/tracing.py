"""Structured spans — the TPU stack's analog of the reference's ``tracing``
instrumentation (ref: ``#[instrument]`` on service/engine/scheduler methods,
e.g. llm_service.rs:160, llm_engine.rs:240, scheduler.rs:1455; subscriber
installed in server main).

Design: a thread-local span stack gives every span a dot-joined path
(``engine.step > worker.execute``), timing, and arbitrary key=value fields.
Records flow to std logging (logger ``atoma.trace``) and to a bounded
in-process ring buffer that tests and the /metrics debug surface can read.
Disabled (the default) the decorator adds one attribute lookup + branch per
call — no string formatting, no clock reads.

Enable with ``ATOMA_TRACE=1`` (or :func:`enable`); ``ATOMA_TRACE_JSON=1``
switches the log lines to JSON.
"""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import functools
import json
import logging
import os
import threading
import time
from typing import Any, Callable, Dict, Iterator, List, Optional

logger = logging.getLogger("atoma.trace")

_enabled = os.environ.get("ATOMA_TRACE", "") not in ("", "0")
_json = os.environ.get("ATOMA_TRACE_JSON", "") not in ("", "0")
_local = threading.local()
_ring: "collections.deque[SpanRecord]" = collections.deque(maxlen=4096)
_ring_lock = threading.Lock()


@dataclasses.dataclass
class SpanRecord:
    """One completed span."""

    name: str
    path: str              # dot-joined ancestry, e.g. "engine.step>worker"
    start_s: float         # time.monotonic() at entry
    duration_ms: float
    fields: Dict[str, Any]
    thread: str
    error: Optional[str] = None


def enable(json_lines: bool = False) -> None:
    global _enabled, _json
    _enabled = True
    _json = json_lines


def disable() -> None:
    global _enabled
    _enabled = False


def is_enabled() -> bool:
    return _enabled


def recent_spans(name: Optional[str] = None) -> List[SpanRecord]:
    """Snapshot of the ring buffer (optionally filtered by span name)."""
    with _ring_lock:
        spans = list(_ring)
    if name is not None:
        spans = [s for s in spans if s.name == name]
    return spans


def clear() -> None:
    with _ring_lock:
        _ring.clear()


def _stack() -> List[str]:
    st = getattr(_local, "stack", None)
    if st is None:
        st = _local.stack = []
    return st


def _emit(rec: SpanRecord) -> None:
    with _ring_lock:
        _ring.append(rec)
    if _json:
        logger.debug(
            "%s",
            json.dumps(
                {
                    "span": rec.path,
                    "ms": round(rec.duration_ms, 3),
                    **rec.fields,
                    **({"error": rec.error} if rec.error else {}),
                }
            ),
        )
    else:
        fields = " ".join(f"{k}={v}" for k, v in rec.fields.items())
        logger.debug(
            "%s %.3fms%s%s",
            rec.path,
            rec.duration_ms,
            f" {fields}" if fields else "",
            f" ERROR={rec.error}" if rec.error else "",
        )


@contextlib.contextmanager
def span(name: str, **fields: Any) -> Iterator[Dict[str, Any]]:
    """Context-manager span. Yields the (mutable) fields dict so the body
    can attach results: ``with span("step") as f: f["tokens"] = n``."""
    if not _enabled:
        yield fields
        return
    st = _stack()
    st.append(name)
    path = ">".join(st)
    t0 = time.monotonic()
    err: Optional[str] = None
    try:
        yield fields
    except BaseException as e:  # noqa: BLE001 — record, then re-raise
        err = f"{type(e).__name__}: {e}"
        raise
    finally:
        st.pop()
        _emit(
            SpanRecord(
                name=name,
                path=path,
                start_s=t0,
                duration_ms=(time.monotonic() - t0) * 1e3,
                fields=fields,
                thread=threading.current_thread().name,
                error=err,
            )
        )


def instrument(
    name: Optional[str] = None, **static_fields: Any
) -> Callable:
    """Method/function decorator — the ``#[instrument]`` analog
    (ref: llm_service.rs:160, llm_engine.rs:240). Supports sync and async
    callables; span name defaults to ``qualname``."""

    def deco(fn: Callable) -> Callable:
        span_name = name or fn.__qualname__

        import inspect

        if inspect.iscoroutinefunction(fn):

            @functools.wraps(fn)
            async def awrapper(*args, **kwargs):
                if not _enabled:
                    return await fn(*args, **kwargs)
                with span(span_name, **static_fields):
                    return await fn(*args, **kwargs)

            return awrapper

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not _enabled:
                return fn(*args, **kwargs)
            with span(span_name, **static_fields):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def summary() -> Dict[str, Dict[str, float]]:
    """Aggregate recent spans: count, total/mean/max duration per name —
    the quick profiling view (no device-side tracing exists through the
    TPU tunnel, so host-side spans are the serving-layer profile)."""
    agg: Dict[str, List[float]] = {}
    for rec in recent_spans():
        agg.setdefault(rec.name, []).append(rec.duration_ms)
    return {
        k: {
            "count": len(v),
            "total_ms": round(sum(v), 3),
            "mean_ms": round(sum(v) / len(v), 3),
            "max_ms": round(max(v), 3),
        }
        for k, v in agg.items()
    }
