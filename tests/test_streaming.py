"""Streaming-equals-batch contract: each event-time window operator run
under real Structured Streaming must produce exactly the rows its batch
twin (which the DuckDB oracle verifies) produces."""

from __future__ import annotations

import pytest

from pot_spark import registry
from pot_spark.streaming.runner import (
    BUILDERS,
    STATEFUL_BUILDERS,
    run_streaming_query,
)

registry.load_all_query_modules()


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(BUILDERS) + sorted(STATEFUL_BUILDERS))
def test_stream_matches_batch(spark, sf_dir, name):
    streamed = run_streaming_query(spark, name, sf_dir)
    batch = registry.QUERIES[name](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)
