"""Observation API: per-query metrics collected on the driver without a
second scan — the engine-side analogue of the reference's pot_reads/
pot_writes counters (server.go:117-167), but attached to an arbitrary
DataFrame instead of the storage layer.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from pot_spark.tables import load


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    obs = Observation("scan_stats")
    li = load(spark, sf_dir, "lineitem")
    df = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("l_quantity").alias("total_qty"),
        F.max("l_shipdate").alias("max_ship"),
    ).filter(F.col("l_quantity") > 30)
    kept = df.count()
    got = obs.get
    # the observation sees every scanned row (pre-filter), in the same
    # job that produced the filtered count -- no second scan
    expected_rows = li.count()
    expected_qty = li.agg(F.sum("l_quantity")).collect()[0][0]
    assert got["rows_seen"] == expected_rows
    assert abs(got["total_qty"] - expected_qty) < 1e-6
    assert kept < expected_rows


def test_store_metrics_export_dict_increments(tmp_path):
    """StoreMetrics.as_dict(): the otel.go counter export without the
    dependency — every public op bumps its counter."""
    from pot_spark.kv import PotStore

    store = PotStore(None, str(tmp_path / "m"))
    base = store.metrics.as_dict()
    assert base["pot_writes"] == 0 and base["pot_reads"] == 0

    store.create("m/p", {"id": "a"})
    store.create_batch("m/p", {"b": {"v": 1}})
    store.get("m/p")
    store.get("m/p")
    store.list_paths()
    store.remove("m/p", "a")

    got = store.metrics.as_dict()
    assert got["pot_writes"] == 3  # create + create_batch + remove's mutate
    assert got["pot_reads"] == 2
    assert got["pot_lists"] == 1
    assert got["pot_removes"] == 1
    assert got["pot_local_lock_acquisitions"] >= 3
    assert got["pot_local_lock_duration_avg_ms"] >= 0.0


def test_store_metrics_span_phases(tmp_path):
    """Per-op span parity with the reference's trace() phases
    (otel.go:70-98, server.go:273-313): every successful mutation
    records local_lock / read / write / commit / create, and the
    sub-phases can never exceed the whole-call span."""
    from pot_spark.kv import PotStore

    store = PotStore(None, str(tmp_path / "spans"))
    store.create("s/p", {"id": "a"})
    store.create("s/p", {"id": "b"})

    m = store.metrics
    for phase in ("local_lock", "read", "write", "commit", "create"):
        assert m.span_calls[phase] == 2, phase
        assert m.span_seconds[phase] >= 0.0
    total = m.span_seconds["create"]
    parts = sum(
        m.span_seconds[p] for p in ("local_lock", "read", "write", "commit")
    )
    assert parts <= total + 1e-6  # phases nest inside the create span
    # the flat export carries them too (GET /:metrics surface)
    exported = m.as_dict()
    assert exported["pot_span_create_calls"] == 2
    assert exported["pot_span_commit_seconds_total"] == m.span_seconds["commit"]


def test_span_listener_gets_per_call_events(tmp_path):
    """add_span_listener: per-call latency attribution (the otel.go
    trace-span hook) — every phase of every mutation reaches the
    listener individually, consistent with the aggregated sums."""
    from pot_spark.kv import PotStore

    store = PotStore(None, str(tmp_path / "sl"))
    events = []
    store.metrics.add_span_listener(lambda name, s: events.append((name, s)))
    store.create("s/p", {"id": "a"})
    store.create("s/p", {"id": "b"})
    names = [n for n, _ in events]
    for phase in ("local_lock", "read", "write", "commit", "create"):
        assert names.count(phase) == 2, phase
    assert all(s >= 0.0 for _, s in events)
    # per-call events sum to the aggregate export
    total = sum(s for n, s in events if n == "create")
    assert abs(total - store.metrics.span_seconds["create"]) < 1e-9


def test_raising_span_listener_never_fails_a_mutation(tmp_path):
    """A sink that raises must not make an already-committed write look
    failed: the listener exception is swallowed, the mutation returns
    normally, and the generation advances exactly once."""
    from pot_spark.kv import PotStore

    store = PotStore(None, str(tmp_path / "boom"))

    def bad_sink(name, seconds):
        raise OSError("statsd down")

    store.metrics.add_span_listener(bad_sink)
    resp = store.create("s/p", {"id": "a"})
    assert resp.generation == 1
    assert store.get("s/p") == {"a": {"id": "a"}}


def test_store_metrics_bump_is_thread_safe(tmp_path):
    """The ThreadingHTTPServer shim drives counters from concurrent
    request threads; bump() must not lose increments."""
    import threading

    from pot_spark.kv.store import StoreMetrics

    m = StoreMetrics()

    def hammer():
        for _ in range(2000):
            m.bump(reads=1)
            m.observe_span("read", 0.001)

    ts = [threading.Thread(target=hammer) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert m.reads == 16000
    assert m.span_calls["read"] == 16000


def test_otel_exporter_degrades_without_dependency(tmp_path):
    """attach_otel_exporter must be a documented no-op (None) when
    opentelemetry-api is absent (it is absent in this container) — a
    deployment without OTel never breaks."""
    import importlib.util

    from pot_spark.kv import PotStore
    from pot_spark.kv.otel import attach_otel_exporter

    assert importlib.util.find_spec("opentelemetry") is None
    store = PotStore(None, str(tmp_path / "noop"))
    assert attach_otel_exporter(store.metrics) is None
    # the store keeps working with zero listeners registered
    store.create("s/p", {"id": "a"})
    assert store.metrics.span_calls["create"] == 1


def test_otel_exporter_emits_all_reference_phases(tmp_path):
    """With a tracer supplied (duck-typed — the same surface the real
    opentelemetry tracer exposes), every one of the reference's phase
    names reaches start_span with a retroactive start <= end, closing
    R12 to drop-in parity with otel.go."""
    from pot_spark.kv import PotStore
    from pot_spark.kv.otel import PHASES, attach_otel_exporter

    spans = []

    class FakeSpan:
        def __init__(self, name, start):
            self.name, self.start = name, start

        def end(self, end_time=None):
            spans.append((self.name, self.start, end_time))

    class FakeTracer:
        def start_span(self, name, start_time=None):
            return FakeSpan(name, start_time)

    store = PotStore(None, str(tmp_path / "otel"))
    listener = attach_otel_exporter(store.metrics, tracer=FakeTracer())
    assert listener is not None
    store.create("s/p", {"id": "a"})
    store.create("s/p", {"id": "b"})
    seen = {n for n, _, _ in spans}
    assert seen == set(PHASES)  # the reference's five phases, exactly
    assert all(start <= end for _, start, end in spans)
    # retroactive spans reflect the measured durations: per-phase sums
    # agree with the aggregated counters
    create_ns = sum(e - s for n, s, e in spans if n == "create")
    assert abs(create_ns / 1e9 - store.metrics.span_seconds["create"]) < 0.05
