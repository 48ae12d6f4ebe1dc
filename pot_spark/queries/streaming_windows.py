"""Event-time window operators (batch-checkable plans).

Each query here is the *batch* evaluation of a streaming window plan over
the events table — identical `F.window`/`F.session_window` expressions run
under Structured Streaming in `pot_spark.streaming.runner` (tested in
tests/test_streaming.py). The oracle replays the window semantics with
epoch-aligned bucket math / gaps-and-islands SQL.

Spark tumbling/sliding windows align to the Unix epoch; DuckDB
`time_bucket` for minute intervals aligns to 2000-01-01 00:00, which is a
whole multiple of 10 minutes from the epoch, so the boundaries coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load


from pot_spark.queries import dec as _dec  # shared engine-exact cast


@query(
    "s_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def s_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts/sums per event type."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "s_sliding",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '10 minutes', ts, TIMESTAMP '2000-01-01 00:05:00')
                 AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2, 3
    """,
)
def s_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5: each event belongs to exactly two
    windows; the oracle materializes them as two shifted tumbling bucketings."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "s_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def s_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap. Spark's
    session_window end = last event + gap; a new session starts when the
    gap is >= 30 minutes (event at exactly start+gap falls outside the
    half-open [start, end) session interval)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "s_watermark_late",
    oracle="""
    WITH marked AS (
        SELECT event_id, event_type, ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS max_seen
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE max_seen IS NULL
                                 OR ts >= max_seen - INTERVAL 1 HOUR) AS BIGINT)
             AS n_kept,
           CAST(COUNT(*) FILTER (WHERE max_seen IS NOT NULL
                                 AND ts < max_seen - INTERVAL 1 HOUR) AS BIGINT)
             AS n_dropped
    FROM marked
    GROUP BY event_type
    """,
)
def s_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics replayed in batch: arrival order = event_id; an
    event is late (dropped) if its ts < (max ts seen so far) - 1h. Under
    streaming this is `withWatermark("ts", "1 hour")` state (see
    pot_spark.streaming.runner); the batch twin computes the running
    arrival max as a THREE-level distributed prefix max — in-shard
    running max (window partitioned by event_id shard), per-shard prefix
    within a supershard, then a prefix over supershard totals — so no
    task ever sees more than one shard's rows and the only unpartitioned
    window runs over O(n / 4096^2) supershard rows (~600 rows at 10^10
    events). The oracle affords the same semantics as one global window
    on a single DuckDB node at test scale."""
    ev = load(spark, sf_dir, "events")
    shard_w, super_w = 4096, 4096
    sharded = ev.select("event_id", "event_type", "ts").withColumn(
        "shard", F.floor(F.col("event_id") / shard_w)
    )
    # level 1: running max within each shard, excluding the current row
    w_in = (
        Window.partitionBy("shard")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_shard = sharded.withColumn("m_in", F.max("ts").over(w_in))
    # level 2: per-shard totals, prefix-maxed within each supershard
    shards = sharded.groupBy("shard").agg(F.max("ts").alias("sh_max")).withColumn(
        "sup", F.floor(F.col("shard") / super_w)
    )
    w_sh = (
        Window.partitionBy("sup")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shards = shards.withColumn("m_prev_in_sup", F.max("sh_max").over(w_sh))
    # level 3: supershard totals — O(n/shard_w/super_w) rows, so the
    # unpartitioned window is over a relation that stays driver-tiny at
    # any corpus size
    w_sup = Window.orderBy("sup").rowsBetween(Window.unboundedPreceding, -1)
    supers = (
        shards.groupBy("sup")
        .agg(F.max("sh_max").alias("sup_max"))
        .withColumn("m_prev_sups", F.max("sup_max").over(w_sup))
        .select("sup", "m_prev_sups")
    )
    # base = max over all earlier shards (greatest skips nulls; null only
    # for the globally first shard)
    offsets = shards.join(supers, "sup").select(
        "shard", F.greatest("m_prev_in_sup", "m_prev_sups").alias("sh_base")
    )
    # shard-keyed join; the offsets side is O(n/shard_w) and GROWS with
    # the corpus, so no broadcast hint — AQE broadcasts while it fits
    marked = in_shard.join(offsets, "shard").withColumn(
        "max_seen", F.greatest("m_in", "sh_base")
    )
    kept = F.col("max_seen").isNull() | (
        F.col("ts") >= F.col("max_seen") - F.expr("INTERVAL 1 HOUR")
    )
    return marked.groupBy("event_type").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.count(F.when(~kept, 1)).alias("n_dropped"),
    )
