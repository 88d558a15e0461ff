"""Structured-span tracing (the ``#[instrument]`` analog, utils/tracing.py).

Mirrors the reference's tracing instrumentation of service/engine/scheduler
methods (ref: llm_service.rs:160, llm_engine.rs:240, scheduler.rs:1455):
spans must record nesting, timing, fields, and errors, and the instrumented
serving stack must emit engine.step > worker.execute_model hierarchies when
enabled — with zero records when disabled.
"""

import asyncio

import pytest

from atoma_infer_tpu.utils import tracing


@pytest.fixture(autouse=True)
def _reset_tracing():
    tracing.clear()
    yield
    tracing.disable()
    tracing.clear()


def test_span_records_name_timing_fields():
    tracing.enable()
    with tracing.span("outer", batch=3) as f:
        f["tokens"] = 7
    (rec,) = tracing.recent_spans("outer")
    assert rec.path == "outer"
    assert rec.duration_ms >= 0
    assert rec.fields == {"batch": 3, "tokens": 7}
    assert rec.error is None


def test_span_nesting_paths():
    tracing.enable()
    with tracing.span("a"):
        with tracing.span("b"):
            pass
    paths = [r.path for r in tracing.recent_spans()]
    assert paths == ["a>b", "a"]  # inner completes first


def test_span_records_error_and_reraises():
    tracing.enable()
    with pytest.raises(ValueError):
        with tracing.span("boom"):
            raise ValueError("nope")
    (rec,) = tracing.recent_spans("boom")
    assert "ValueError" in rec.error


def test_disabled_is_free_of_records():
    with tracing.span("quiet"):
        pass

    @tracing.instrument("fn")
    def fn():
        return 42

    assert fn() == 42
    assert tracing.recent_spans() == []


def test_instrument_sync_and_async():
    tracing.enable()

    @tracing.instrument()
    def add(a, b):
        return a + b

    @tracing.instrument("async_op")
    async def aop():
        return "ok"

    assert add(1, 2) == 3
    assert asyncio.run(aop()) == "ok"
    names = {r.name for r in tracing.recent_spans()}
    assert "async_op" in names
    assert any("add" in n for n in names)


def test_engine_emits_nested_spans():
    """Full-engine drive: engine.step spans must contain scheduler.schedule
    and worker.execute_model children."""
    from test_engine_integration import make_service, run

    tracing.enable()

    async def scenario():
        from atoma_infer_tpu.types import GenerateParameters, GenerateRequest

        service = make_service()
        task = asyncio.create_task(service.engine.run())
        fut = await service.handle_request(
            GenerateRequest(
                request_id="t0",
                inputs="hello tracing",
                parameters=GenerateParameters(max_new_tokens=4),
            )
        )
        await fut
        service.stop()
        task.cancel()

    run(scenario())
    paths = {r.path for r in tracing.recent_spans()}
    assert any(p.startswith("engine.step>scheduler.schedule") for p in paths)
    assert any(
        p.startswith("engine.step>worker.execute_model") for p in paths
    )
    summ = tracing.summary()
    assert summ["engine.step"]["count"] >= 1


def test_summary_aggregates():
    tracing.enable()
    for _ in range(3):
        with tracing.span("s"):
            pass
    s = tracing.summary()["s"]
    assert s["count"] == 3
    assert s["total_ms"] >= s["max_ms"]
