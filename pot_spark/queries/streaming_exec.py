"""Structured Streaming execution surfaced as oracle-checked queries.

The `s_*`/`q_*` event-time operators in streaming_windows.py are BATCH
evaluations of streaming plans; tests/test_streaming.py proves the real
streamed result equals the batch result. This module closes the loop for
the external correctness gate: each query here EXECUTES the actual
Structured Streaming pipeline (file-source microbatches -> windowed /
stateful plan -> memory sink via pot_spark.streaming.runner) to
completion and returns the sink table, registered with the SAME DuckDB
oracle as its batch twin — so the driver hash-checks the true streaming
output, watermarks, state machine and all, not an emulation.

Scale posture is the runner's (runner.py module docstring): file source
becomes Kafka/cloud files with the identical plan, watermarks bound
state, keyed state shards across executors, sinks go exactly-once via
the pot epoch ledger. The reference has no streaming surface at all
(SURVEY.md §2-A); this is a declared capability extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the batch twins must be registered before their ORACLES[...] lookups
# below — import them here so importing THIS module standalone works,
# instead of relying on load_all_query_modules()'s import ordering
import pot_spark.queries.joins  # noqa: F401
import pot_spark.queries.llm_dedup  # noqa: F401
import pot_spark.queries.llm_similarity  # noqa: F401
import pot_spark.queries.scale_ops  # noqa: F401
import pot_spark.queries.streaming_windows  # noqa: F401
import pot_spark.queries.timeseries  # noqa: F401
from pot_spark.registry import ORACLES, query
from pot_spark.streaming.runner import run_streaming_query


@query("s_tumbling_stream", oracle=ORACLES["s_tumbling"])
def s_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows executed under real Structured
    Streaming (complete mode -> memory sink); oracle = s_tumbling's."""
    return run_streaming_query(spark, "s_tumbling", sf_dir)


@query("s_sliding_stream", oracle=ORACLES["s_sliding"])
def s_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10m, slide 5m) executed as a real stream."""
    return run_streaming_query(spark, "s_sliding", sf_dir)


@query("s_session_stream", oracle=ORACLES["s_session"])
def s_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap session windows executed as a real stream
    (session_window state merger)."""
    return run_streaming_query(spark, "s_session", sf_dir)


@query("s_dedup_first_stream", oracle=ORACLES["s_dedup_first"])
def s_dedup_first_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator under real streaming: first-event dedup
    per (user_id, event_type) via applyInPandasWithState (min-event-id
    state, update mode). Oracle = the batch twin s_dedup_first's."""
    return run_streaming_query(spark, "s_dedup_first", sf_dir)


@query("s_dedup_daily_stream", oracle=ORACLES["q_dedup_daily_first"])
def s_dedup_daily_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-windowed stateful dedup with event-time state TTL executed as
    a real stream — the watermark retires each day's keys (the pattern
    that bounds state at 100 TB/day). Oracle = q_dedup_daily_first's."""
    return run_streaming_query(spark, "q_dedup_daily_first", sf_dir)


@query("s_theta_join_stream", oracle=ORACLES["q_theta_range_join"])
def s_theta_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join (purchase within 1h of signup,
    same user) with watermark-evicted join state, executed as a real
    stream in append mode. Oracle = the batch q_theta_range_join's."""
    return run_streaming_query(spark, "q_theta_range_join", sf_dir)


@query(
    "s_static_join_stream",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE
             AS window_end,
           c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def s_static_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join executed as a real stream: event
    microbatches joined against the broadcast customer dimension, then
    10-minute windows per market segment. The static side carries no
    join state (re-resolved per microbatch); only the window aggregate
    holds state, bounded by the watermark. Oracle recomputes the same
    enrichment + window in batch SQL."""
    return run_streaming_query(spark, "s_static_join", sf_dir)


@query(
    "s_watermark_late_stream",
    oracle="""
    WITH b1 AS (SELECT * FROM events WHERE event_id % 2 = 0),
    wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM b1),
    kept AS (
        SELECT e.* FROM events e
        WHERE e.event_id % 2 = 0
           OR time_bucket(INTERVAL '10 minutes', e.ts) + INTERVAL 10 MINUTE
                > (SELECT w FROM wm)
    )
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE
             AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM kept GROUP BY 1, 2, 3
    """,
)
def s_watermark_late_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL watermark late-data drop (the last batch-emulated s_* op,
    closed round 6): events delivered as two interleaved microbatches —
    even event_ids on time, odd event_ids as a lagging partition replay
    — plus a flush sentinel, through `withWatermark("ts", "1 hour")` +
    10-minute tumbling counts in append mode. Batch 1 advances the
    watermark to max(even ts) − 1h; the lagging batch's rows whose
    window closed at or before that watermark are dropped by the real
    stateful-aggregation operator, not an emulation. The oracle replays
    the same delivery model in SQL: kept = every on-time row + lagging
    rows whose window end is strictly after the batch-1 watermark.

    (The batch twin s_watermark_late models a PER-ROW watermark, which
    on this fixture's arrival order drops nothing — the real stream
    needed a delivery model with actual lateness to be non-vacuous:
    4,989 of 5,000 lagging rows drop at sf0.01.)"""
    from pyspark.sql import functions as F

    # defensive: the flush sentinel's window can never be emitted in
    # append mode (the final watermark stops 1h short of it), but the
    # contract is "real windows only" either way
    return run_streaming_query(spark, "s_watermark_late", sf_dir).filter(
        F.col("event_type") != "__flush__"
    )


@query(
    "s_native_dedup_stream",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value FROM events
    """,
)
def s_native_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once from at-least-once: the event file is delivered
    TWICE (two microbatches) and Spark's native stateful dedup operator
    — dropDuplicatesWithinWatermark on event_id — collapses the replay.
    In-watermark replays hit held state and dedup; replays older than
    the watermark are dropped as late data; either way each event is
    emitted exactly once, with state bounded by the watermark horizon
    (the unbounded-state trap of plain dropDuplicates avoided). Oracle:
    the batch events table verbatim."""
    return run_streaming_query(spark, "s_native_dedup", sf_dir)


@query(
    "s_outer_join_stream",
    oracle="""
    SELECT s.event_id AS signup_id,
           p.event_id AS purchase_id,
           s.user_id
    FROM events s
    LEFT JOIN events p
      ON p.event_type = 'purchase'
     AND p.user_id = s.user_id
     AND p.ts > s.ts
     AND p.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    """,
)
def s_outer_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join executed as a real stream: signups
    joined to same-user purchases within 1h, unmatched signups emitted
    with NULL purchase_id when watermark-driven state eviction proves no
    future match can arrive (machinery the inner s_theta_join_stream
    never exercises). Delivery: the complete-then-flush sentinel source
    — everything arrives before the watermark moves (nothing
    late-drops), then the sentinel advances the watermark past every
    join window so ALL unmatched rows flush, making the oracle the
    plain batch LEFT JOIN. The sentinel's own unmatched row is removed
    here on the SINK table (batch side — a filter inside the streaming
    plan would push below the watermark node, runner.py:144 note)."""
    from pyspark.sql import functions as F

    out = run_streaming_query(spark, "s_outer_join", sf_dir)
    return out.filter(F.col("s_type") != "__flush__").drop("s_type")


@query("s_cdc_compact_stream", oracle=ORACLES["s_cdc_compact"])
def s_cdc_compact_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC log compaction executed as a real stream: the event
    log replayed through applyInPandasWithState keeping the newest
    (ts, event_id) record per (user_id, event_type) — the continuously
    maintained compacted snapshot (one state row per live key, sharded
    across executors by the group key), i.e. what a Kafka-compacted
    topic's materialized view looks like as a streaming query. The sink
    converges to exactly the per-key latest rows the batch twin
    q_cdc_compact aggregates over; the oracle is the per-key
    QUALIFY row_number()=1 snapshot. Batch twin plan note: scale_ops.py
    q_cdc_compact (map-side partial max(struct))."""
    return run_streaming_query(spark, "s_cdc_compact", sf_dir)

@query("s_ohlc_stream", oracle=ORACLES["q_ohlc_bars"])
def s_ohlc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly OHLC bars executed under real Structured
    Streaming: min_by/max_by (open/close ordered on (ts, event_id)) run
    as stateful window aggregates with watermark-bounded state — the
    financial-rollup shape, continuously maintained. Oracle = the batch
    twin q_ohlc_bars'. Scale posture is the batch twin's (one
    map-side-combinable aggregation keyed (user_id, hour)) plus the
    runner's state story: each open window holds one (open, high, low,
    close, n) tuple per (user, hour), retired by the watermark."""
    return run_streaming_query(spark, "q_ohlc_bars", sf_dir)


@query("s_dedup_near_stream", oracle=ORACLES["s_dedup_near_gate"])
def s_dedup_near_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate ADMISSION GATE executed as a real
    stream: documents arrive in ingest order across microbatches; a doc
    is admitted only if its MinHash band keys match no retained
    signature (>= 6/8 lanes) — the online complement of the batch dedup
    pipeline, i.e. what a continuously-ingesting corpus runs instead of
    re-deduping from scratch. The stateful operator keys state by
    band_key (retained signature set per band, TTL-bounded — runner.py
    build_near_dedup_gate); the per-doc verdict is the stateless
    all-bands-clean conjunction over the sink's (band, doc) collision
    flags, applied here (the s_outer_join_stream post-sink pattern).
    Oracle = the batch twin s_dedup_near_gate's; stream == batch is
    additionally pinned by tests/test_streaming.py."""
    from pyspark.sql import functions as F

    sink = run_streaming_query(spark, "s_dedup_near_gate", sf_dir)
    return sink.groupBy("doc_id").agg(
        (1 - F.max("collided")).cast("bigint").alias("admitted")
    )


@query("s_user_quota_stream", oracle=ORACLES["s_user_quota"])
def s_user_quota_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission quota under real Structured Streaming: a custom
    stateful operator (applyInPandasWithState) granting each (user_id,
    event_type) its first K event_ids exactly once — K int64s of state
    per key, bounded on an unbounded stream; duplicate delivery admits
    nothing twice. Oracle = the batch twin s_user_quota's."""
    return run_streaming_query(spark, "s_user_quota", sf_dir)


@query("s_sim_index_stream", oracle=ORACLES["s_sim_index"])
def s_sim_index_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index maintenance executed as a real stream:
    embeddings arrive across microbatches, each assigned map-only to
    its nearest IVF cell (broadcast integer-exact quantizer — the
    batch twin's expression verbatim), with per-cell state maintaining
    the posting list (member ids + scores) and emitting the cell's
    (n_members, top-3 representatives) whenever membership grows —
    what a continuously-embedding ingest pipeline runs instead of
    rebuilding the index (runner.py build_sim_index / _vec_stream).
    Emissions grow monotonically per cell, so the index snapshot is
    each cell's LAST emission (max n_members — strictly increasing, so
    unique); oracle = the batch twin s_sim_index's full-corpus build.
    Stream == batch additionally pinned under at-least-once replay in
    tests/test_streaming.py."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import pot_spark.queries.llm_similarity  # noqa: F401 - batch twin

    sink = run_streaming_query(spark, "s_sim_index", sf_dir)
    w = Window.partitionBy("cell").orderBy(F.col("n_members").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
