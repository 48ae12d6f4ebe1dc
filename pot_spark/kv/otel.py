"""Optional OpenTelemetry binding for StoreMetrics spans.

The reference wires every store phase through an OTel tracer
(otel.go:70-98; server.go:704-712 `trace()` starts a span per phase:
create / local-lock / distributed-lock / read-write / remove). PotStore
accumulates the same phases (create / local_lock / read / write /
commit — read-write split in two, commit being the put-if-absent
publish) and exposes them per-call through
``StoreMetrics.add_span_listener``. This module turns that hook into
real OTel spans.

The dependency is OPTIONAL: ``attach_otel_exporter`` degrades to a
documented no-op (returns None) when the ``opentelemetry-api`` package
is absent, so importing this module — or calling the attach function —
never breaks a deployment without OTel. Pass an explicit ``tracer``
(anything with ``start_span(name, start_time=...)`` returning an object
with ``end(end_time=...)``) to bypass the import entirely — that is
also how the wiring is unit-tested without the SDK.

Example::

    store = PotStore(None, root)
    attach_otel_exporter(store.metrics)          # no-op without the pkg
    store.create("team/alpha", {"id": "doc-1"})  # spans: create, local_lock,
                                                 #   read, write, commit
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from pot_spark.kv.store import StoreMetrics

# the store's phase vocabulary, mirroring the reference's trace() names
# (otel.go; server.go:273-313) with read-write split at the snapshot
# boundary and the commit (put-if-absent publish) first-class
PHASES = ("create", "local_lock", "read", "write", "commit")


def attach_otel_exporter(
    metrics: StoreMetrics,
    tracer=None,
    tracer_name: str = "pot_spark.kv",
) -> Optional[Callable[[str, float], None]]:
    """Register a span listener that emits one OTel span per store phase.

    StoreMetrics listeners fire AFTER a phase completes (the store times
    phases itself), so spans are emitted retroactively with explicit
    start/end timestamps — wall-clock now minus the measured duration.
    Retroactive spans lose parent/child nesting (each phase is a root
    span carrying the phase name), which is the honest mapping of an
    after-the-fact duration callback; the aggregated sums remain in
    ``metrics.span_seconds`` regardless.

    Returns the registered listener (so callers can keep a handle), or
    None when no tracer was given and opentelemetry-api is not
    installed — the graceful-degradation contract."""
    if tracer is None:
        try:
            from opentelemetry import trace as _trace  # type: ignore
        except ImportError:
            return None
        tracer = _trace.get_tracer(tracer_name)

    def _listener(name: str, seconds: float) -> None:
        end_ns = time.time_ns()
        start_ns = end_ns - max(0, int(seconds * 1e9))
        span = tracer.start_span(name, start_time=start_ns)
        span.end(end_time=end_ns)

    metrics.add_span_listener(_listener)
    return _listener
