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


def test_stream_upsert_to_pot_exactly_once(spark, sf_dir, tmp_path):
    """Multi-epoch stream -> stateful dedup -> PotStore upsert sink: the
    final pot state equals the batch dedup result, each epoch commits one
    pot generation, and a replayed epoch is dropped by the ledger."""
    from pot_spark.kv.store import PotStore
    from pot_spark.streaming.runner import build_stateful_dedup
    from pot_spark.streaming.sink import _claim_epoch, start_pot_upsert_stream
    from pot_spark.tables import load

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = PotStore(spark, str(tmp_path / "potroot"))
    q = start_pot_upsert_stream(
        build_stateful_dedup(stream),
        store,
        "dedup/events",
        ["user_id", "event_type"],
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    typed = store.get_typed(
        "dedup/events",
        "user_id long, event_type string, first_event_id long, "
        "first_ts timestamp, first_value double",
    ).drop("key")
    batch = registry.QUERIES["s_dedup_first"](spark, sf_dir)
    assert _sorted_rows(typed) == _sorted_rows(batch)

    # one generation per non-empty epoch, all retained for time travel
    gens = store.list_generations("dedup/events")
    assert len(gens) >= 1
    # earlier generations are readable and no larger than the final state
    first_state = store.get_at("dedup/events", gens[0][0])
    assert 0 < len(first_state) <= len(store.get("dedup/events"))

    # replaying a committed epoch must be refused by the ledger
    assert not _claim_epoch(store, "dedup/events", 0)
