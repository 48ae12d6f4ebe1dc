"""Time-series operators over the events table: hierarchical rollup
(continuous-aggregate pattern) and gap filling with last-observation-
carried-forward.

Scale design: the rollup aggregates coarse resolutions FROM the fine
partials (sum-of-sums), which is how a 100 TB hypertable maintains hourly/
daily aggregates incrementally — the raw data is touched once, every
coarser level reads the (orders-of-magnitude smaller) level below. Gap
fill generates each series' grid from its own bounds (no global cross
join) and fills with a per-series window pass.

No reference counterpart: petomalina/pot has no temporal operators
(SURVEY.md §2-A; the only temporal values are lock lease durations,
server.go:244-249).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


@query(
    "q_ts_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q_ts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: minute partials -> hourly aggregates computed
    from the partials (sum-of-sums / sum-of-counts), the incremental
    continuous-aggregate pattern. DECIMAL partials make the two-level sum
    exactly equal the direct one-level oracle aggregation."""
    ev = load(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute_start"), "event_type"
    ).agg(
        F.sum(_dec("value")).alias("part_sum"),
        F.count("*").alias("part_n"),
    )
    return minute.groupBy(
        F.date_trunc("hour", "minute_start").alias("hour_start"), "event_type"
    ).agg(
        F.sum("part_sum").cast("double").alias("sum_value"),
        F.sum("part_n").cast("bigint").alias("n_events"),
    )


@query(
    "q_ts_gap_fill",
    oracle="""
    WITH b AS (
        SELECT user_id,
               CAST(to_timestamp(floor(epoch(ts) / 600) * 600) AS TIMESTAMP) AS bucket,
               MAX(value) AS bucket_max
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 10 MINUTE)) AS bucket
        FROM bounds
    )
    SELECT g.user_id, g.bucket,
           CAST(b.bucket_max IS NULL AS INTEGER) AS is_gap,
           last_value(b.bucket_max IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING
           ) AS filled_value
    FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket = g.bucket
    """,
)
def q_ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: each user's 10-minute grid is generated from that
    user's own [min, max] bucket range (sequence + explode — no global
    calendar cross join), empty buckets are flagged and filled with the
    last observed value (LOCF window). One shuffle keyed by user_id
    serves the grid join and the fill window."""
    ev = load(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 600) * 600)
    b = ev.groupBy("user_id", bucket.alias("bucket")).agg(
        F.max("value").alias("bucket_max")
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 10 minutes"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(b, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.col("bucket_max").isNull().cast("int").alias("is_gap"),
        F.last("bucket_max", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT user_id, bucket,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked
    GROUP BY user_id, bucket
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly OHLC bars (the candlestick/financial-rollup shape
    every time-series store exposes). Spark side is a single hash
    aggregation: open/close via `min_by`/`max_by` ordered on the
    (ts, event_id) struct — one shuffle on (user_id, hour), fully
    map-side-combinable, no window pass. The oracle needs the two-window
    formulation only because DuckDB's arg_min can't order by a struct."""
    ev = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.round(F.min_by("value", order_key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", order_key), 6).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "q_scd_intervals",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts AS valid_from
        FROM marked
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to
    FROM changes
    """,
)
def q_scd_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2-style interval construction: collapse each user's event
    stream into [valid_from, valid_to) state intervals, opening a new
    interval whenever event_type changes (change-data-capture -> history
    table). Both window passes share the same (user_id | ts) sort order,
    so Spark plans ONE shuffle + one sort and runs both windows plus the
    filter in a single stage pipeline."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_type", F.lag("event_type").over(w))
    changes = marked.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.withColumn("valid_to", F.lead("valid_from").over(w2))
