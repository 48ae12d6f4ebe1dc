"""Store observability: counters, span phases, and the OTel binding.

The reference exports its counters and per-phase trace spans through
OTel (otel.go:70-98; server.go:704-712). PotStore accumulates the same
surface on StoreMetrics; this example shows the three ways to consume
it:

1. the flat counter export (``metrics.as_dict()`` — feed any sink);
2. a raw per-call span listener (statsd timers, logs, ...);
3. ``attach_otel_exporter`` — real OTel spans when opentelemetry-api is
   installed, documented no-op otherwise.

Run:  python examples/observability.py
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pot_spark.kv import PotStore
from pot_spark.kv.otel import PHASES, attach_otel_exporter


def main() -> int:
    root = tempfile.mkdtemp(prefix="pot_obs_")
    store = PotStore(None, root)

    # 2. raw per-call listener: every phase of every mutation, with its
    # measured duration — the hook any metrics sink binds to
    events: list[tuple[str, float]] = []
    store.metrics.add_span_listener(lambda name, s: events.append((name, s)))

    # 3. OTel: spans per phase when the SDK is present; None (and zero
    # behavioral change) when it is not
    exporter = attach_otel_exporter(store.metrics)
    print(f"otel exporter: {'attached' if exporter else 'absent (no-op)'}")

    store.create("team/alpha", {"id": "doc-1", "body": "hello"})
    store.create("team/alpha", {"id": "doc-2", "body": "world"})
    store.get("team/alpha")
    store.remove("team/alpha", "doc-1")

    # 1. the flat export (the HTTP shim serves this at GET /:metrics)
    print(json.dumps(store.metrics.as_dict(), indent=1, sort_keys=True))

    seen = {n for n, _ in events}
    assert set(PHASES) <= seen, f"missing phases: {set(PHASES) - seen}"
    print(f"per-call span events: {len(events)} across phases {sorted(seen)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
