"""Additional analytic operators: statistical aggregates, scalar
subqueries, ORC format round-trip, HAVING-style post-agg filters."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load, load_spread


@query(
    "q_stats_funcs",
    oracle="""
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(var_samp(o_totalprice), 2) AS var_price,
           round(corr(o_totalprice, o_custkey), 6) AS corr_pc,
           round(covar_samp(o_totalprice, o_custkey), 2) AS covar_pc,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (rounded: the engines' accumulation orders
    differ; the true values are continuous so boundary hits are measure-
    zero). min/max on doubles are exact."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
            F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_pc"),
            F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covar_pc"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders
    )
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter by a scalar aggregate of the same table: the 1-row aggregate
    is broadcast and the comparison stays deterministic because the mean
    derives from a decimal-exact sum on both engines."""
    orders = load(spark, sf_dir, "orders")
    mean = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    return (
        orders.join(F.broadcast(mean))
        .filter(F.col("o_totalprice") > 1.8 * F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_sink_orc_roundtrip",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_linestatus = 'F'
    GROUP BY l_returnflag
    """,
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip; oracle computes straight from the
    source table."""
    out = os.path.join(tempfile.gettempdir(), "pot_spark_sink_orc")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linestatus") == "F")
    li.select("l_orderkey", "l_returnflag", "l_extendedprice").write.mode(
        "overwrite"
    ).orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
            "sum_price"
        ),
    )


@query(
    "q_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). At 100 TB exact
    percentiles need a full sort per group — the scale path swaps in
    approx_percentile (t-digest sketch, mergeable map-side) when a bounded
    error is acceptable; see q_approx_cd for the sketch-check pattern."""
    orders = load(spark, sf_dir, "orders")
    # ONE percentile buffer for both ranks (array form): each exact
    # percentile aggregate buffers and sorts the ENTIRE group's values,
    # so separate aggregates ship and sort the data once per rank
    # (r13 profile: 3 buffers = 3x the shuffle and 3 single-task sorts
    # on q_equidepth_bins). Same function, same interpolation — values
    # are bit-identical.
    pcts = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)))
    return orders.groupBy("o_orderpriority").agg(
        pcts.alias("_p"), F.count("*").alias("n")
    ).select(
        "o_orderpriority",
        F.round(F.col("_p")[0], 4).alias("p50_price"),
        F.round(F.col("_p")[1], 4).alias("p90_price"),
        "n",
    )


@query(
    "q_corr_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5x above their own customer's
    average. Catalyst decorrelates into one aggregate + join — the
    subquery never re-executes per row."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
        FROM orders_cs o
        WHERE o.o_totalprice > 1.5 * (
            SELECT AVG(o2.o_totalprice) FROM orders_cs o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: each order's trailing-30-day customer
    spend. The frame is value-based (epoch seconds), not row-based — ties
    and gaps in order dates are handled by the range semantics, and the
    DECIMAL sum keeps the running totals bit-identical across engines."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


@query(
    "q_histogram",
    oracle="""
    WITH bounds AS (
        SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(CASE WHEN o_totalprice >= hi THEN 10
                ELSE floor((o_totalprice - lo) * 10 / (hi - lo)) + 1
                END AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(round(o_totalprice, 2)) AS DOUBLE) AS bucket_min,
           CAST(MAX(round(o_totalprice, 2)) AS DOUBLE) AS bucket_max
    FROM orders, bounds
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order prices: 10 bins between the observed
    min/max (width_bucket semantics spelled out explicitly — identical
    IEEE arithmetic on both engines; the top edge folds into bin 10).
    The one-row bounds aggregate is broadcast into the scan, so the
    histogram is one pass + a tiny shuffle of 10 bucket rows — the shape
    profiling a 100 TB column must take."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    x = F.col("o_totalprice")
    bucket = (
        F.when(x >= F.col("hi"), F.lit(10))
        .otherwise(F.floor((x - F.col("lo")) * 10 / (F.col("hi") - F.col("lo"))) + 1)
        .cast("int")
    )
    return (
        orders.join(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min(F.round("o_totalprice", 2)).cast("double").alias("bucket_min"),
            F.max(F.round("o_totalprice", 2)).cast("double").alias("bucket_max"),
        )
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 6) AS value,
           ROUND((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.sigma > 0 AND ROUND(ABS((e.value - s.mu) / s.sigma), 4) > 2.5
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event_type (|z| > 2.5). The
    per-group mean/stddev is a tiny aggregate broadcast back onto the
    scan — the events table is read once, filtered in place, and never
    shuffled (the only exchange is the few-row stats broadcast). The
    threshold compares the ROUNDed score on both sides so engine-level
    double ulps can't flip boundary membership."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (F.round(F.abs(z), 4) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "q_median_mad",
    oracle="""
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS med_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           round(m.med_price, 4) AS med_price,
           round(median(abs(o.o_totalprice - m.med_price)), 4) AS mad_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN med m USING (o_orderpriority)
    GROUP BY o.o_orderpriority, m.med_price
    """,
)
def q_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread statistics: per-priority median and MAD
    (median absolute deviation) — the outlier-resistant alternative to
    mean/stddev for dirty 100 TB data. Two aggregation passes are
    inherent to MAD; the per-group medians (one row per group) come back
    as a broadcast so the second pass re-reads the fact side without a
    join shuffle."""
    orders = load_spread(spark, sf_dir, "orders", min_bytes=2_000_000)
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med_price")
    )
    j = orders.join(F.broadcast(med), "o_orderpriority")
    return j.groupBy("o_orderpriority").agg(
        F.round(F.first("med_price"), 4).alias("med_price"),
        F.round(
            F.median(F.abs(F.col("o_totalprice") - F.col("med_price"))), 4
        ).alias("mad_price"),
        F.count("*").alias("n_orders"),
    )


@query("q_approx_percentile")  # t-digest sketch: engine-specific -> rows-only;
#                                tests/test_sketches.py bounds the error
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (t-digest-style sketch, accuracy 10000):
    the scale path for q_percentile — partial sketches combine map-side,
    so no per-group sort and no raw-value shuffle. The driver's check is
    rows-only (sketch internals differ across engines); the pytest bound
    asserts each estimate lands within the exact p50/p90 neighborhood."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "ap50_price"
        ),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias(
            "ap90_price"
        ),
        F.count("*").alias("n"),
    )


@query(
    "q_regr_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_regr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_*): slope/intercept/R²
    of extendedprice against quantity per returnflag — the SQL-standard
    OLS aggregates both engines implement natively. One hash aggregate,
    map-side partials (each regr_* is a fixed-size moment sketch), so it
    scales like any sum: no extra shuffle, no second pass. Rounded per
    the moment-order rules in pot_spark/queries/__init__.py.

    No reference counterpart: the reference has no aggregation operators
    at all (SURVEY.md §2-A)."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n_pairs"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_price"),
    )


@query(
    "q_mode_agg",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT o_orderstatus, o_orderpriority, n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority) AS rn
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n_mode
    FROM r WHERE rn = 1
    """,
)
def q_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic modal value per group: Spark's mode(col, true)
    (lowest value among frequency ties — the deterministic flag makes
    the answer reproducible across partitionings, which a nondeterministic
    mode is not at 1000 executors). The modal count rides along as
    max(per-value count). The oracle replays the same semantics as a
    count + row_number cascade, since a tie-arbitrary mode() could never
    hash-match. Both aggregates share one scan; the post-agg join is
    4 rows × 5 rows and broadcasts.

    No reference counterpart (SURVEY.md §2-A)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy("o_orderstatus").agg(
        F.expr("mode(o_orderpriority, true)").alias("mode_priority")
    )
    top = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .groupBy("o_orderstatus")
        .agg(F.max("n").cast("bigint").alias("n_mode"))
    )
    return m.join(top, "o_orderstatus")


@query(
    "q_bitwise_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey) AS BIGINT) AS and_key,
           CAST(bit_or(o_orderkey) AS BIGINT) AS or_key,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_key,
           CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS total_bits
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and/bit_or/bit_xor) plus popcount
    sums — the primitives behind bitmap indexes and feature-flag rollups.
    All four are associative-commutative single-word states, so they
    partial-aggregate map-side and shuffle exactly one word per group.

    No reference counterpart (SURVEY.md §2-A)."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(k).cast("bigint").alias("and_key"),
        F.bit_or(k).cast("bigint").alias("or_key"),
        F.bit_xor(k).cast("bigint").alias("xor_key"),
        F.sum(F.bit_count(k)).cast("bigint").alias("total_bits"),
    )


@query("q_approx_topk")  # sketch output -> rows-only + error-bound pytest
def q_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per event_type via the Spark 4 approx_top_k sketch
    (space-bounded frequent-items summary, mergeable across partitions —
    the 100 TB answer to "top users per event class" where an exact
    groupBy would shuffle every distinct key). The sketch tracks up to
    10k items; with fewer distinct keys its counts are exact, which is
    what tests/test_sketches.py asserts against the exact rollup. Output
    is exploded to (event_type, user_id, cnt) rows ordered determinis-
    tically for the rows-only driver check."""
    ev = load(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("approx_top_k(user_id, 5)").alias("top")
    )
    return (
        sk.select(
            "event_type",
            F.explode("top").alias("e"),
        )
        .select(
            "event_type",
            F.col("e.item").alias("user_id"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
        .orderBy("event_type", F.col("cnt").desc(), "user_id")
    )


@query(
    "q_crosstab",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
             AS p1_urgent,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT)
             AS p2_high,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT)
             AS p3_medium,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority NOT IN
                ('1-URGENT', '2-HIGH', '3-MEDIUM')) AS BIGINT) AS p_other
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table (status x priority) as one conditional-aggregate
    pass — the deterministic form of df.stat.crosstab with pinned,
    alias-stable column names (crosstab's dynamic column set would make
    the schema data-dependent, which a contract with a fixed oracle
    cannot tolerate). Single scan, one low-cardinality shuffle, fully
    map-side-combined."""
    o = load(spark, sf_dir, "orders")

    def n(cond) -> F.Column:
        return F.count(F.when(cond, 1)).cast("bigint")

    pr = F.col("o_orderpriority")
    return o.groupBy("o_orderstatus").agg(
        n(pr == "1-URGENT").alias("p1_urgent"),
        n(pr == "2-HIGH").alias("p2_high"),
        n(pr == "3-MEDIUM").alias("p3_medium"),
        n(~pr.isin("1-URGENT", "2-HIGH", "3-MEDIUM")).alias("p_other"),
    )


@query(
    "q_describe_stats",
    oracle="""
    WITH m AS (
        SELECT 'l_quantity' AS col,
               CAST(COUNT(l_quantity) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean,
               round(sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                                   * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                           - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                             * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                             / COUNT(l_quantity))
                          / (COUNT(l_quantity) - 1)), 4) AS std,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(COUNT(l_extendedprice) AS BIGINT),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice),
               round(sqrt((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                           - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                             * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                             / COUNT(l_extendedprice))
                          / (COUNT(l_extendedprice) - 1)), 4),
               CAST(MIN(l_extendedprice) AS DOUBLE),
               CAST(MAX(l_extendedprice) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               CAST(COUNT(l_discount) AS BIGINT),
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount),
               round(sqrt((CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                                   * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                           - CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                             * CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                             / COUNT(l_discount))
                          / (COUNT(l_discount) - 1)), 4),
               CAST(MIN(l_discount) AS DOUBLE),
               CAST(MAX(l_discount) AS DOUBLE)
        FROM lineitem
    )
    SELECT * FROM m
    """,
)
def q_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.describe() re-expressed with a pinned schema and deterministic
    arithmetic: per-column count/mean/std/min/max in ONE aggregation pass
    (describe's own output formats values as strings and computes means
    as float sums — both hash-unstable across engines; this form keeps
    DECIMAL sums throughout). The sample stddev is NOT stddev_samp —
    whose float merge order varies with partitioning — but
    sqrt((sum(x^2) - sum(x)^2/n) / (n-1)) over EXACT decimal sums of x
    and x*x, converted to double in the same operation order on both
    engines, so the IEEE result is bit-identical and the 4-digit round
    is deterministic. One scan, one 1-row aggregate, unpivoted to the
    stats-table shape driver-side via a fixed union of 3 literal rows —
    no data shuffle at all."""
    li = load(spark, sf_dir, "lineitem")

    def stats(c: str):
        dec = F.col(c).cast("decimal(18,2)")
        n = F.count(c)
        sx = F.sum(dec).cast("double")
        sx2 = F.sum(dec * dec).cast("double")
        return [
            n.alias(f"{c}__n"),
            (F.sum(dec).cast("double") / F.count(c)).alias(f"{c}__mean"),
            F.round(
                F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))), 4
            ).alias(f"{c}__std"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    agg = li.agg(*[a for c in cols for a in stats(c)])
    rows = [
        agg.select(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__mean").alias("mean"),
            F.col(f"{c}__std").alias("std"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
        )
        for c in cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "q_equidepth_bins",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT CAST(CASE WHEN o_totalprice <= b.q1 THEN 0
                     WHEN o_totalprice <= b.q2 THEN 1
                     WHEN o_totalprice <= b.q3 THEN 2
                     ELSE 3 END AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS bin_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS bin_max
    FROM orders CROSS JOIN b
    GROUP BY 1
    """,
)
def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) bucketizer: fit = exact interpolated
    quartiles in one aggregate (a 1-row broadcast), transform = a CASE
    lookup applied scan-side, audit = per-bin counts and bounds proving
    the depth balance. This is the feature-binning fit/transform a
    training pipeline runs; versus equi-width (q_histogram) the bins
    adapt to the distribution. Two passes over the data, zero data-sized
    shuffles — the exact-percentile fit is per-group sort-bounded, so at
    100 TB the fit step moves to approx_percentile (q_approx_percentile)
    and the transform is unchanged."""
    o = load(spark, sf_dir, "orders")
    # ONE percentile buffer for all three quartiles (array form) — the
    # r13 profile showed three separate exact-percentile aggregates ship
    # the full value list to the single reducer three times (40.6 MB
    # shuffle read, 10.2 s one-task stage at sf1) and sort it three
    # times; the array form buffers and sorts once (values identical).
    b = o.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("_q")
    ).select(
        F.col("_q")[0].alias("q1"),
        F.col("_q")[1].alias("q2"),
        F.col("_q")[2].alias("q3"),
    )
    binc = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 0)
        .when(F.col("o_totalprice") <= F.col("q2"), 1)
        .when(F.col("o_totalprice") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(binc.cast("bigint").alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("bin_min"),
            F.max("o_totalprice").cast("double").alias("bin_max"),
        )
    )


@query(
    "q_outlier_iqr",
    oracle="""
    WITH fences AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN o.o_totalprice
                                > f.q3 + 1.5 * (f.q3 - f.q1) THEN 1 END)
                AS BIGINT) AS n_high,
           CAST(COUNT(CASE WHEN o.o_totalprice
                                < f.q1 - 1.5 * (f.q3 - f.q1) THEN 1 END)
                AS BIGINT) AS n_low,
           CAST(MAX(CASE WHEN o.o_totalprice
                              > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN o.o_totalprice END) AS DOUBLE) AS max_outlier
    FROM orders o JOIN fences f USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per priority: exact interpolated
    Q1/Q3 define [q1 - 1.5·IQR, q3 + 1.5·IQR]; rows outside are counted
    and the worst high-side value surfaced — the robust (median-family)
    screen that price/latency anomaly monitors run, immune to the
    outliers a z-score threshold lets drag its own mean. Two passes:
    the fence table is group-cardinality-sized and broadcasts back onto
    the scan, so the detection pass is scan-speed; Spark `percentile`
    and DuckDB `quantile_cont` interpolate identically, making the
    fences — and therefore the counts — engine-exact."""
    orders = load(spark, sf_dir, "orders")
    # one percentile buffer for both fences (array form — see
    # q_equidepth_bins)
    fences = orders.groupBy("o_orderpriority").agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.75))
        ).alias("_q")
    ).select(
        "o_orderpriority",
        F.col("_q")[0].alias("q1"),
        F.col("_q")[1].alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    hi = F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    lo = F.col("o_totalprice") < F.col("q1") - 1.5 * iqr
    return (
        orders.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(hi, 1)).alias("n_high"),
            F.count(F.when(lo, 1)).alias("n_low"),
            F.max(F.when(hi, F.col("o_totalprice")))
            .cast("double")
            .alias("max_outlier"),
        )
    )


@query(
    "q_fk_integrity",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'lineitems_without_order',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'duplicate_order_keys',
           CAST((SELECT COALESCE(SUM(cnt - 1), 0) FROM (
                     SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey
                 ) g WHERE cnt > 1) AS BIGINT)
    UNION ALL
    SELECT 'null_customer_keys',
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT)
    """,
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit pack (the dbt-test shape): orphaned
    orders (anti join vs customer), orphaned lineitems (anti join vs
    orders), duplicate primary keys (excess count), and null foreign
    keys — four checks, one report. Each anti join broadcasts the key
    side when dimension-sized and degrades to a shuffle otherwise; the
    duplicate check is one partial-agg'd rollup. On the fixtures every
    row must be 0 — the report exists so a 100 TB ingest can prove it
    nightly."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    orphan_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count("*").alias("n_bad")).withColumn(
        "check_name", F.lit("orders_without_customer")
    )
    orphan_li = li.join(
        orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("n_bad")).withColumn(
        "check_name", F.lit("lineitems_without_order")
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_bad"))
        .withColumn("check_name", F.lit("duplicate_order_keys"))
    )
    null_fk = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_bad")
    ).withColumn("check_name", F.lit("null_customer_keys"))
    out = (
        orphan_orders.unionByName(orphan_li)
        .unionByName(dup_keys)
        .unionByName(null_fk)
    )
    return out.select("check_name", F.col("n_bad").cast("bigint").alias("n_bad"))


@query(
    "q_hist2d",
    oracle="""
    SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bin,
           CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_discount
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (quantity × price heatmap bins): fixed-width integer
    bin ids computed scan-side by floor division, one partial-agg'd
    rollup to the bounded bins² relation — the density-grid backend a
    plotting layer asks the warehouse for instead of pulling rows.
    Deterministic: floor of one IEEE division per axis, integer group
    keys, DECIMAL measure."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bin"),
            F.floor(F.col("l_extendedprice") / 10000)
            .cast("bigint")
            .alias("price_bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_discount").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_discount"),
        )
    )


@query(
    "q_col_profile",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_val,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL
    FROM orders
    """,
)
def q_col_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (catalog statistics collection): per-column row /
    non-null / exact-distinct counts and numeric min/max in one report —
    what ANALYZE TABLE gathers for the CBO and a data catalog surfaces.
    Spark plans the multi-distinct aggregate via Expand (one pass over
    the scan, partial-agg'd); at 100 TB exact distinct counts shuffle
    the column values once each — the sketch twin (q_hll_sketch /
    approx_count_distinct) is the fast path when a bounded error is
    acceptable."""
    orders = load(spark, sf_dir, "orders")

    def profile(col: str, numeric: bool):
        aggs = [
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            (F.min(col).cast("double") if numeric else F.lit(None).cast("double")).alias("min_val"),
            (F.max(col).cast("double") if numeric else F.lit(None).cast("double")).alias("max_val"),
        ]
        return orders.agg(*aggs).withColumn("col", F.lit(col))

    out = (
        profile("o_custkey", True)
        .unionByName(profile("o_totalprice", True))
        .unionByName(profile("o_orderstatus", False))
    )
    return out.select(
        "col", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val"
    )


@query(
    "q_ab_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                                    1, 4)) AS INTEGER) % 2 AS grp,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
        FROM events GROUP BY 1, 2
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(floor(SUM(converted) * 1000000.0 / COUNT(*)) AS BIGINT)
             AS conv_ppm
    FROM assigned GROUP BY grp
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically assigned to arms
    by a salted md5 coin (the assignment IS the hash — reproducible,
    stateless, no assignment table to join), per-arm user counts,
    converters (any purchase event) and conversion rate in exact ppm.
    The statistical layer (z-test on two proportions) consumes exactly
    these four integers, so the engine emits the sufficient statistics
    rather than floats that drift. One rollup to per-user flags (the
    only data-scale shuffle), one to the 2-row arm summary."""
    ev = load(spark, sf_dir, "events")
    grp = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    assigned = ev.groupBy("user_id", grp.alias("grp")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    return assigned.groupBy("grp").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.floor(F.sum("converted") * 1000000.0 / F.count("*"))
        .cast("bigint")
        .alias("conv_ppm"),
    )


@query(
    "q_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
      SELECT event_type,
             MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN value END) AS lo,
             MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(b.lo) AS lo, MAX(b.hi) AS hi,
           CAST(COUNT(*) FILTER (WHERE e.value < b.lo) AS BIGINT) AS n_lo_clip,
           CAST(COUNT(*) FILTER (WHERE e.value > b.hi) AS BIGINT) AS n_hi_clip,
           CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi)
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_clipped
    FROM (SELECT event_type, value FROM events WHERE value IS NOT NULL) e
    JOIN bounds b USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (percentile clamping), the standard robust-cleaning
    step before training-statistics aggregation: per event type, values
    are clamped to the discrete p05/p95 bounds and the clipped counts and
    clipped DECIMAL sum are reported. Bounds are SELECTED data values at
    integer ranks ((n*5+99) div 100 — exact ceil in integer arithmetic),
    never interpolated, so both engines pick the identical double; ties
    in `value` need no tie-breaker because the value at a rank is
    invariant under permutations of equal values.

    Plan shape: the BOUNDS branch is exact but never sorts raw rows —
    the value at an integer rank is tie-invariant, so it is read off the
    per-type VALUE HISTOGRAM's cumulative counts (map-side combined
    groupBy, then a window over distinct (event_type, value) rows: the
    same type-scale posture as q_perplexity_filter's cutoff — a skewed
    event_type sorts its distinct values, not its rows); the CLAMP
    branch never shuffles a raw row either: scan -> broadcast-join the
    groups-sized bounds -> map-side partial aggregation, so the only
    thing crossing the wire is per-group partials.

    NULL values are filtered out up front ON BOTH SIDES: Spark's window
    ORDER BY defaults to NULLS FIRST and DuckDB's to NULLS LAST, so any
    NULL in the group would shift every rank between the engines — the
    explicit IS NOT NULL filter is the only rank definition they share."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    hist = ev.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # n as an unbounded frame of the SAME (partition, order) spec — not
    # a separate order-free Window.partitionBy: equal specs collapse
    # into ONE WindowExec pass over one exchange, where the order-free
    # spec planned a second WindowExec re-buffering every histogram row
    # (r10 bench-drift recovery on the r9 1.4x watch item)
    w_all = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # rank-cover form (r9 bench-drift recovery): a histogram row covers
    # ranks (prev, cum_c], so the p05/p95 rank falls in exactly ONE row
    # per type — filter to those <=2 rows and fold, instead of scanning
    # every histogram row through a conditional MIN.
    cum = hist.select(
        "event_type",
        "value",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
        (F.sum("c").over(w_cum) - F.col("c")).alias("prev"),
    )
    rlo = F.expr("(n * 5 + 99) DIV 100")
    rhi = F.expr("(n * 95 + 99) DIV 100")
    covers_lo = (F.col("prev") < rlo) & (rlo <= F.col("cum_c"))
    covers_hi = (F.col("prev") < rhi) & (rhi <= F.col("cum_c"))
    bounds = (
        cum.filter(covers_lo | covers_hi)
        .groupBy("event_type")
        .agg(
            F.min(F.when(covers_lo, F.col("value"))).alias("lo"),
            F.min(F.when(covers_hi, F.col("value"))).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.count(F.when(F.col("value") < F.col("lo"), 1))
            .cast("bigint")
            .alias("n_lo_clip"),
            F.count(F.when(F.col("value") > F.col("hi"), 1))
            .cast("bigint")
            .alias("n_hi_clip"),
            F.sum(clipped.cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_clipped"),
        )
    )


_KA_K = 10  # k-anonymity threshold


@query(
    "q_k_anonymity",
    oracle=f"""
    WITH c1 AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value / 50) AS BIGINT) AS vb,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    resid AS (
        SELECT event_type, day, SUM(cnt) AS rc
        FROM c1 WHERE cnt < {_KA_K} GROUP BY 1, 2
    )
    SELECT c.event_type,
           CAST(SUM(c.cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_l1_cohorts,
           CAST(SUM(CASE WHEN c.cnt >= {_KA_K} THEN c.cnt ELSE 0 END)
                AS BIGINT) AS n_released_l1,
           CAST(COALESCE((SELECT SUM(rc) FROM resid r
                          WHERE r.event_type = c.event_type
                            AND r.rc >= {_KA_K}), 0) AS BIGINT)
             AS n_released_l2,
           CAST(COALESCE((SELECT SUM(rc) FROM resid r
                          WHERE r.event_type = c.event_type
                            AND r.rc < {_KA_K}), 0) AS BIGINT)
             AS n_suppressed,
           CAST(COALESCE((SELECT SUM(rc) FROM resid r
                          WHERE r.event_type = c.event_type
                            AND r.rc < {_KA_K}), 0) * 1000000
                // SUM(c.cnt) AS BIGINT) AS suppressed_ppm
    FROM c1 c GROUP BY c.event_type ORDER BY c.event_type
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release accounting (k = {10}) over the quasi-
    identifier (event_type, day, value-band): fine cohorts of >= k rows
    release as-is; smaller cohorts GENERALIZE one level (drop the value
    band) and release if the regrouped cohort reaches k; the rest is
    suppressed — the standard Mondrian-style ladder, reported per
    event_type with floored suppressed ppm. Sibling of q_pii_scrub /
    q_gdpr_erase in the privacy family.

    100 TB design: pure cohort arithmetic — the row level is touched
    once (the c1 rollup, map-side partials); the generalization and the
    report are rollups OVER COHORT COUNTS (bounded by the QI
    cardinality, << rows), so the ladder costs one corpus pass no
    matter how many levels it has. Null QI values (hostile feeds) form
    their own cohort on both engines and usually suppress — exactly
    what a privacy release should do with malformed keys."""
    ev = load(spark, sf_dir, "events")
    c1 = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") / 50).cast("bigint").alias("vb"),
    ).agg(F.count("*").alias("cnt"))
    resid = (
        c1.where(F.col("cnt") < _KA_K)
        .groupBy("event_type", "day")
        .agg(F.sum("cnt").alias("rc"))
    )
    per_l2 = resid.groupBy("event_type").agg(
        F.sum(F.when(F.col("rc") >= _KA_K, F.col("rc")).otherwise(0)).alias(
            "n_released_l2"
        ),
        F.sum(F.when(F.col("rc") < _KA_K, F.col("rc")).otherwise(0)).alias(
            "n_suppressed"
        ),
    )
    per_l1 = c1.groupBy("event_type").agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_l1_cohorts"),
        F.sum(F.when(F.col("cnt") >= _KA_K, F.col("cnt")).otherwise(0)).alias(
            "n_released_l1"
        ),
    )
    return (
        per_l1.join(per_l2, "event_type", "left")
        .select(
            "event_type",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_l1_cohorts").cast("bigint").alias("n_l1_cohorts"),
            F.col("n_released_l1").cast("bigint").alias("n_released_l1"),
            F.coalesce("n_released_l2", F.lit(0))
            .cast("bigint")
            .alias("n_released_l2"),
            F.coalesce("n_suppressed", F.lit(0))
            .cast("bigint")
            .alias("n_suppressed"),
            F.expr("coalesce(n_suppressed, 0) * 1000000 div n_rows")
            .cast("bigint")
            .alias("suppressed_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "q_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
               COUNT(*) AS o
        FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, SUM(o) AS r FROM obs GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS c FROM obs GROUP BY source),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS nl,
                   COUNT(DISTINCT source) AS ns FROM obs),
    cells AS (
        SELECT rt.r, ct.c, COALESCE(obs.o, 0) AS o, tot.n, tot.nl, tot.ns
        FROM rt CROSS JOIN ct CROSS JOIN tot
        LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
    ),
    contrib AS (
        SELECT n, nl, ns,
               CAST(floor(
                   (CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
                   * (CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
                   / (CAST(n AS DOUBLE) * r * c) * 10000000000
               ) AS BIGINT) AS q_e10
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nl AS BIGINT) AS n_langs,
           CAST(ns AS BIGINT) AS n_sources,
           CAST((nl - 1) * (ns - 1) AS BIGINT) AS dof,
           round(CAST(SUM(q_e10) AS DOUBLE) / 10000000000, 6) AS chi2,
           round(sqrt(CAST(SUM(q_e10) AS DOUBLE) / 10000000000
                      / (n * least(nl - 1, ns - 1))), 6) AS cramers_v
    FROM contrib
    GROUP BY n, nl, ns
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between lang and source (+
    Cramér's V effect size) — the corpus-drift / feed-balance alarm: a
    source that suddenly ships one language moves this number before
    any downstream metric does. Empty contingency cells contribute
    their full expected mass (the cross of the marginals is built
    explicitly, never inferred from observed pairs).

    Engine-exact: each cell contribution uses the identity
    (o−e)²/e = (o·N − r·c)²/(N·r·c) on IEEE doubles of integer counts
    (every op correctly rounded — identical on both engines), then is
    FLOORED at 1e-10 into an int64 before the global sum, so shuffle
    order cannot move the statistic; chi2 and V are rounded from the
    same integer sum.

    100 TB design: one (lang, source) rollup over the corpus (map-side
    partials), then everything is marginal-table arithmetic — the
    cross join is |langs| x |sources| rows of broadcast 1-row/tiny
    aggregates. Cost is the scan, not the statistic."""
    docs = load(spark, sf_dir, "documents")
    obs = (
        docs.select(
            F.coalesce("lang", F.lit("")).alias("lang"),
            F.coalesce("source", F.lit("")).alias("source"),
        )
        .groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("c"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.count_distinct("lang").alias("nl"),
        F.count_distinct("source").alias("ns"),
    )
    cells = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["lang", "source"], "left")
        .select(
            "r",
            "c",
            F.coalesce("o", F.lit(0)).alias("o"),
            "n",
            "nl",
            "ns",
        )
    )
    num = F.col("o").cast("double") * F.col("n") - F.col("r").cast(
        "double"
    ) * F.col("c")
    q_e10 = F.floor(
        num * num / (F.col("n").cast("double") * F.col("r") * F.col("c"))
        * F.lit(10000000000)
    ).cast("bigint")
    return cells.select("n", "nl", "ns", q_e10.alias("q_e10")).groupBy(
        "n", "nl", "ns"
    ).agg(F.sum("q_e10").alias("s")).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("nl").cast("bigint").alias("n_langs"),
        F.col("ns").cast("bigint").alias("n_sources"),
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("bigint").alias("dof"),
        F.round(F.col("s").cast("double") / 1e10, 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("s").cast("double")
                / 1e10
                / (F.col("n") * F.least(F.col("nl") - 1, F.col("ns") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "q_length_bias",
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars, md5(text) AS digest
      FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
    ),
    pre AS (
      SELECT n_chars,
             ntile(10) OVER (ORDER BY n_chars, COALESCE(doc_id, -1)) AS dec
      FROM base
    ),
    keep AS (
      SELECT digest, MIN(doc_id) AS keep_id, MIN(n_chars) AS n_chars
      FROM base GROUP BY digest
    ),
    post AS (
      SELECT n_chars,
             ntile(10) OVER (ORDER BY n_chars, COALESCE(keep_id, -1)) AS dec
      FROM keep
    ),
    pr AS (
      SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_pre,
             CAST(MAX(n_chars) AS BIGINT) AS max_pre
      FROM pre GROUP BY dec
    ),
    po AS (
      SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_post,
             CAST(MAX(n_chars) AS BIGINT) AS max_post
      FROM post GROUP BY dec
    )
    SELECT CAST(pr.dec AS BIGINT) AS decile, pr.n_pre, pr.max_pre,
           COALESCE(po.n_post, 0) AS n_post, po.max_post,
           pr.max_pre - po.max_post AS boundary_shift
    FROM pr LEFT JOIN po ON po.dec = pr.dec
    """,
)
def q_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup LENGTH-BIAS audit: the doc-length decile boundaries of the
    corpus BEFORE vs AFTER exact keep-first dedup. Duplicates are not
    length-uniform (boilerplate skews short), so dedup silently shifts
    the length distribution the model trains on — boundary_shift per
    decile is that shift, exactly. Equi-depth deciles are EXACT ntile(10)
    semantics, but computed from the n_chars HISTOGRAM via
    _equidepth_tiles: ntile sizes are a function of n alone and tied
    values are interchangeable, so every boundary is the exact data
    value at the tile's last rank — derived from cumulative histogram
    counts, with no doc-scale sort anywhere (the round-6/7 weak ruling
    on prose-only cutovers; the window input is the distinct-length
    relation, the same type-scale posture as q_ks_test's grid).

    The keep-one representative is (digest -> MIN doc_id, MIN n_chars) —
    group members are verbatim copies, so MIN n_chars IS the
    representative's value and no join back to the corpus is needed.
    NULL n_chars / NULL text rows are excluded up front on BOTH engines
    (the Spark NULLS FIRST vs DuckDB NULLS LAST window divergence). No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    ).select("doc_id", "n_chars", F.md5("text").alias("digest"))
    pre_hist = base.groupBy("n_chars").agg(F.count("*").alias("c"))
    keep = base.groupBy("digest").agg(F.min("n_chars").alias("n_chars"))
    post_hist = keep.groupBy("n_chars").agg(F.count("*").alias("c"))
    # side-tag and union the two histograms so BOTH decile computations
    # share one window pass + one bounds join (r9 bench-drift recovery:
    # the per-relation pipeline ran every tile stage twice, all fixed
    # overhead at this histogram size), then pivot the sides back with
    # conditional aggregation instead of a join
    hists = pre_hist.withColumn("side", F.lit(0)).unionByName(
        post_hist.withColumn("side", F.lit(1))
    )
    tiles = _equidepth_tiles(hists, "n_chars", 10, by="side")
    return (
        tiles.groupBy("tile")
        .agg(
            F.min(F.when(F.col("side") == 0, F.col("sz"))).alias("n_pre"),
            F.min(F.when(F.col("side") == 0, F.col("maxv")))
            .cast("bigint")
            .alias("max_pre"),
            F.min(F.when(F.col("side") == 1, F.col("sz"))).alias("_n_post"),
            F.min(F.when(F.col("side") == 1, F.col("maxv")))
            .cast("bigint")
            .alias("max_post"),
        )
        .filter(F.col("n_pre").isNotNull())  # oracle: pre LEFT JOIN post
        .select(
            F.col("tile").cast("bigint").alias("decile"),
            F.col("n_pre").cast("bigint").alias("n_pre"),
            "max_pre",
            F.coalesce("_n_post", F.lit(0)).cast("bigint").alias("n_post"),
            "max_post",
            (F.col("max_pre") - F.col("max_post"))
            .cast("bigint")
            .alias("boundary_shift"),
        )
    )


def _equidepth_tiles(
    counted: DataFrame, value: str, k: int, by: str | None = None
) -> DataFrame:
    """ntile(k) per-tile (count, max value) computed EXACTLY from the
    value HISTOGRAM — never from a doc-scale sort. ntile's bucket sizes
    are a pure function of n (q = n div k; tile i holds q+1 rows for
    i <= n mod k, else q), and because tied values are interchangeable
    under any tie-break, the value at rank r is determined by the
    cumulative histogram alone: the smallest value whose cum count
    reaches r. So each tile's MAX is the value at its last rank hi_i =
    i*q + least(i, n mod k), and the whole computation is one map-side
    combined groupBy + one window over DISTINCT values (type-scale: the
    value domain, not the corpus) + a broadcast of the k-row bound
    table. Output is bit-identical to ntile(k) + groupBy, at any scale.

    ``counted`` must have columns (value, c) — one row per distinct
    value with its occurrence count. With ``by`` set, every stage
    partitions on that column and the result carries it — several
    independent tile computations (e.g. pre/post relations side-tagged
    and unioned) share ONE pipeline instead of running it per relation.

    JOIN-FREE (r9 bench-drift recovery): every boundary rank hi_i lands
    in exactly ONE histogram row (prev_cum < hi_i <= cum_c), and because
    hi_i = i*(q+1) for i <= m and i*q + m for i > m (q = n div k,
    m = n mod k), the tiles a row emits are two CLOSED-FORM integer
    ranges of i — computed per row and exploded. The whole operator is
    one window pass over the histogram plus a projection: no bounds
    relation, no broadcast join, no post-join aggregation (each tile is
    emitted exactly once). Integer DIV here is truncation-toward-zero,
    which equals floor for the non-negative regime-1 operands and only
    LOOSENS the lower cap for regime-2's possibly-negative prev-m (the
    greatest(m+1, ...) cap restores it)."""
    part = [by] if by else []
    w_cum = (
        Window.partitionBy(*part)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # n rides a second frame of the SAME window partitioning — one
    # exchange, no recompute of the (possibly expensive) counted lineage
    w_n = Window.partitionBy(*part)
    cum = counted.select(
        *part,
        value,
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_n).alias("n"),
        (F.sum("c").over(w_cum) - F.col("c")).alias("prev"),
    )
    kq = f"(n DIV {k})"
    km = f"(n % {k})"
    lo1 = f"greatest(1L, prev DIV ({kq} + 1) + 1)"
    hi1 = f"least({km}, cum_c DIV ({kq} + 1))"
    lo2 = f"greatest({km} + 1, (prev - {km}) DIV {kq} + 1)"
    hi2 = f"least({k}L, (cum_c - {km}) DIV {kq})"
    tiles = F.expr(
        f"concat("
        f"CASE WHEN {lo1} <= {hi1} THEN sequence({lo1}, {hi1}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END, "
        f"CASE WHEN {kq} > 0 AND {lo2} <= {hi2} THEN sequence({lo2}, {hi2}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END)"
    )
    return cum.select(
        *part, value, "n", F.explode(tiles).alias("tile")
    ).select(
        *part,
        "tile",
        (
            F.expr(kq)
            + F.when(F.col("tile") <= F.expr(km), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("sz"),
        F.col(value).alias("maxv"),
    )


# Benford expected first-digit frequencies, floored to ppm in PYTHON so
# the literals are identical on both engines (log10 never enters a plan)
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


@query(
    "q_benford",
    oracle=f"""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM c WHERE cents >= 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(*) * 1000000 // n.total AS BIGINT) AS observed_ppm,
           CAST(CASE digit {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_PPM.items())} END
                AS BIGINT) AS benford_ppm,
           CAST(COUNT(*) * 1000000 // n.total
                - CASE digit {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_PPM.items())} END
                AS BIGINT) AS delta_ppm
    FROM d CROSS JOIN n
    GROUP BY digit, n.total
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    synthetic-data / fraud detector: organically-grown magnitudes follow
    log10(1+1/d); generated or tampered values don't. Expected
    frequencies are Python-precomputed integer ppm LITERALS (log10 never
    enters either engine's plan), the observed digit comes from the
    decimal string of floor(price*100) (floor first: DuckDB's
    double→int cast rounds where Spark truncates), and all ratios are
    floored integer ppm.

    Scale posture: one scan, digit extraction in codegen, a 9-row
    rollup crossJoined with the 1-row total — nothing corpus-sized ever
    shuffles. No reference counterpart (SURVEY.md §2-A)."""
    o = load(spark, sf_dir, "orders")
    c = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    d = c.filter(F.col("cents") >= 1).select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    n = d.agg(F.count("*").cast("bigint").alias("total"))
    expected = None
    for k, v in _BENFORD_PPM.items():
        expected = (
            F.when(F.col("digit") == k, v)
            if expected is None
            else expected.when(F.col("digit") == k, v)
        )
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count("*").cast("bigint").alias("n_values"))
        .select(
            "digit",
            "n_values",
            F.expr("CAST(n_values * 1000000 DIV total AS BIGINT)").alias(
                "observed_ppm"
            ),
            expected.cast("bigint").alias("benford_ppm"),
            (
                F.expr("n_values * 1000000 DIV total")
                - expected
            )
            .cast("bigint")
            .alias("delta_ppm"),
        )
    )


@query(
    "q_gini",
    oracle="""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(COALESCE(len(list_filter(string_split(lower(text), ' '),
                                           x -> x <> '')), 0) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    r AS (
      SELECT lang, n_tok,
             row_number() OVER (
               PARTITION BY lang ORDER BY n_tok, COALESCE(doc_id, -1)
             ) AS rk
      FROM t
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           -- HUGEINT per-row product: rk*n_tok and the *1e6 numerator
           -- exceed int64 on huge languages (round-8 advice)
           CAST(CASE WHEN SUM(n_tok) = 0 THEN NULL
                     ELSE (2 * SUM(CAST(rk AS HUGEINT) * n_tok)
                           - (COUNT(*) + 1) * SUM(CAST(n_tok AS HUGEINT)))
                          * 1000000
                          // (COUNT(*) * SUM(CAST(n_tok AS HUGEINT)))
                END AS BIGINT) AS gini_ppm
    FROM r GROUP BY lang
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per language — the
    inequality statistic that flags a corpus mixing boilerplate stubs
    with book-length outliers (high Gini = a few docs carry the token
    mass; a packing/curriculum hazard). Computed with the exact
    rank-sum identity G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) over the total
    order (n_tok, doc_id) — pure integer arithmetic, floored ppm, NULL
    on empty languages on both engines.

    Scale posture: the rank-sum is TIE-INVARIANT (tied lengths are
    interchangeable: Σ r·x over a tied run of value x with count c
    starting after cumulative count C is x·(c·C + c(c+1)/2) no matter
    how the tie-break assigns ranks), so the exact statistic is computed
    from the per-lang LENGTH HISTOGRAM — the only window runs over
    (lang, distinct n_tok) rows, type-scale like q_ks_test's grid, never
    over docs. A 90%-one-lang corpus therefore sorts that lang's
    distinct-length rows on one reducer, not half the corpus. No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    # NULL text counts as 0 tokens: without the COALESCE, NULL n_tok
    # rows rank NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting
    # every non-null rank (caught by the hostile-parity sweep)
    t = docs.select(
        "lang",
        F.coalesce(
            F.size(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).cast("bigint"),
            F.lit(0),
        ).alias("n_tok"),
    )
    hist = t.groupBy("lang", "n_tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per tied run: ranks C+1..C+c, so SUM(rk*n_tok) contribution is
    # n_tok * (c*C + c*(c+1)/2) — exact bigint arithmetic throughout
    runs = hist.select(
        "lang",
        "n_tok",
        "c",
        (F.sum("c").over(w_cum) - F.col("c")).alias("c_prev"),
    )
    return runs.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum(F.col("n_tok") * F.col("c")).cast("bigint").alias(
            "total_tokens"
        ),
        # DECIMAL(38,0) + doubled identity 2*(c*C + c(c+1)/2) =
        # 2*c*C + c*(c+1) (round-8 advice): exact to 10^38 like the
        # oracle's HUGEINT, loud (error/NULL) beyond — never a silent
        # int64 wrap on a language whose rank-sum numerator passes 9e18.
        F.expr(
            "CAST(CASE WHEN SUM(CAST(n_tok AS DECIMAL(38,0)) * c) = 0 "
            "THEN NULL ELSE "
            "(SUM(CAST(n_tok AS DECIMAL(38,0)) "
            "* (2 * CAST(c AS DECIMAL(38,0)) * c_prev "
            "+ CAST(c AS DECIMAL(38,0)) * (c + 1))) "
            "- (SUM(c) + 1) * SUM(CAST(n_tok AS DECIMAL(38,0)) * c)) "
            "* 1000000 "
            "DIV (SUM(c) * SUM(CAST(n_tok AS DECIMAL(38,0)) * c)) "
            "END AS BIGINT)"
        ).alias("gini_ppm"),
    )


@query(
    "q_ks_test",
    oracle="""
    WITH base AS (
      SELECT source, n_chars AS x FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
    ),
    srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM base GROUP BY source),
    vals AS (SELECT DISTINCT x FROM base),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM base),
    c AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM base GROUP BY source, x),
    g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS gcnt FROM base GROUP BY x),
    grid AS (
      SELECT s.source, s.ns, v.x, COALESCE(c.cnt, 0) AS cnt
      FROM srcs s CROSS JOIN vals v
      LEFT JOIN c ON c.source = s.source AND c.x = v.x
    ),
    cum AS (
      SELECT grid.source, grid.ns, grid.x,
             SUM(grid.cnt) OVER (PARTITION BY grid.source ORDER BY grid.x
                                 ROWS UNBOUNDED PRECEDING) AS s_cum,
             SUM(g.gcnt) OVER (PARTITION BY grid.source ORDER BY grid.x
                               ROWS UNBOUNDED PRECEDING) AS t_cum
      FROM grid JOIN g ON g.x = grid.x
    ),
    dev AS (
      -- HUGEINT: the cross-multiplied CDF deviation is quadratic in
      -- corpus size (the r8-advice int64 class, fixed repo-wide in r9)
      SELECT source, ns, x,
             abs(CAST(s_cum AS HUGEINT) * (n.total - ns)
                 - (t_cum - s_cum) * CAST(ns AS HUGEINT)) AS dnum,
             row_number() OVER (
               PARTITION BY source
               ORDER BY abs(CAST(s_cum AS HUGEINT) * (n.total - ns)
                            - (t_cum - s_cum) * CAST(ns AS HUGEINT))
                        DESC, x
             ) AS rn
      FROM cum CROSS JOIN n
      WHERE n.total > ns
    )
    SELECT d.source, d.ns AS n_docs,
           CAST(d.dnum * 1000000
                // (CAST(d.ns AS HUGEINT) * (n.total - d.ns)) AS BIGINT)
             AS ks_ppm,
           CAST(d.x AS BIGINT) AS ks_at
    FROM dev d CROSS JOIN n WHERE d.rn = 1
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of each source's doc-length
    distribution against the REST of the corpus: the max CDF gap in
    floored ppm plus the length where it occurs — the
    continuous-distribution drift test that complements q_corpus_drift's
    categorical TV distance (a source whose length CDF diverges is
    templated, truncated, or a different register, even when its
    language mix looks normal). The statistic is the exact integer
    rational |cum_s·n_rest − cum_rest·n_s| / (n_s·n_rest) evaluated at
    every observed length — no floats until the final ppm floor; argmax
    ties break to the smallest length on both engines.

    Scale posture: the corpus compresses to (source, length) counts
    before any window (bounded by sources × distinct lengths — a
    type-scale grid, since n_chars is bounded); the CDF accumulations
    are per-source windows over that grid. Single-source corpora yield
    no rows (no rest to test against) identically on both engines. No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    ).select("source", F.col("n_chars").alias("x"))
    srcs = base.groupBy("source").agg(F.count("*").cast("bigint").alias("ns"))
    vals = base.select("x").distinct()
    n = base.agg(F.count("*").cast("bigint").alias("total"))
    c = base.groupBy("source", "x").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    g = base.groupBy("x").agg(F.count("*").cast("bigint").alias("gcnt"))
    grid = (
        srcs.crossJoin(vals)
        .join(c, ["source", "x"], "left")
        .select("source", "ns", "x", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.join(g, "x").select(
        "source",
        "ns",
        "x",
        F.sum("cnt").over(w).alias("s_cum"),
        F.sum("gcnt").over(w).alias("t_cum"),
    )
    # DECIMAL(38,0): the cross-multiplied CDF deviation is quadratic in
    # corpus size (the r8-advice int64 class, fixed repo-wide in r9)
    dev = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("total") > F.col("ns"))
        .select(
            "source",
            "ns",
            "x",
            "total",
            F.abs(
                F.col("s_cum").cast("decimal(38,0)")
                * (F.col("total") - F.col("ns"))
                - (F.col("t_cum") - F.col("s_cum"))
                * F.col("ns").cast("decimal(38,0)")
            ).alias("dnum"),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(F.desc("dnum"), F.asc("x"))
    return (
        dev.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("ns").alias("n_docs"),
            F.expr(
                "CAST(dnum * 1000000 "
                "DIV (CAST(ns AS DECIMAL(38,0)) * (total - ns)) AS BIGINT)"
            ).alias("ks_ppm"),
            F.col("x").cast("bigint").alias("ks_at"),
        )
    )


@query(
    "q_rank_sum_test",
    oracle="""
    WITH base AS (
      SELECT source, n_chars AS x FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
    ),
    g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS gcnt FROM base GROUP BY x),
    gc AS (
      SELECT x, gcnt,
             SUM(gcnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - gcnt
               AS c_before
      FROM g
    ),
    c AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM base GROUP BY source, x),
    srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
             FROM base GROUP BY source),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM base),
    r2 AS (
      -- HUGEINT: the midrank sum is quadratic in corpus size (the
      -- r8-advice int64 class, fixed repo-wide in r9)
      SELECT c.source,
             SUM(CAST(c.cnt AS HUGEINT)
                 * (2 * gc.c_before + gc.gcnt + 1)) AS two_r
      FROM c JOIN gc ON gc.x = c.x
      GROUP BY c.source
    )
    SELECT s.source, s.ns AS n_docs,
           CAST(n.total - s.ns AS BIGINT) AS n_rest,
           CAST(r2.two_r - CAST(s.ns AS HUGEINT) * (s.ns + 1) AS BIGINT)
             AS u2,
           ROUND(CAST(r2.two_r - CAST(s.ns AS HUGEINT) * (s.ns + 1)
                      AS DOUBLE)
                 / (CAST(s.ns AS DOUBLE) * (n.total - s.ns)) - 1.0, 6)
             AS rank_biserial
    FROM srcs s
    JOIN r2 ON r2.source = s.source
    CROSS JOIN n
    WHERE n.total > s.ns
    """,
)
def q_rank_sum_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum test of each source's doc-length
    distribution against the REST of the corpus — the location-shift
    companion to q_ks_test's max-CDF-gap (KS sees any shape change;
    rank-sum quantifies the direction and size of a median shift).
    Everything is exact integers via midranks read off the GLOBAL value
    histogram: the midrank of value x is C_before + (g+1)/2, so
    2*R_source = sum(cnt * (2*C_before + g + 1)) and the doubled
    U statistic u2 = 2R - ns(ns+1) stays integral (no float ranks, no
    tie-correction drift). The effect size is the rank-biserial
    r = u2/(ns*n_rest) - 1 in [-1, 1], an IEEE-exact division rounded
    to 6dp — never an integer DIV on a signed numerator (the engines'
    truncate-vs-floor mismatch).

    Scale posture: the corpus compresses to (source, length) and
    (length) histograms before the one cumulative window, which runs
    over DISTINCT lengths (the q_ks_test grid posture). Single-source
    corpora emit nothing. No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    ).select("source", F.col("n_chars").alias("x"))
    g = base.groupBy("x").agg(F.count("*").cast("bigint").alias("gcnt"))
    w_cum = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select(
        "x",
        "gcnt",
        (F.sum("gcnt").over(w_cum) - F.col("gcnt")).alias("c_before"),
    )
    c = base.groupBy("source", "x").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    srcs = base.groupBy("source").agg(
        F.count("*").cast("bigint").alias("ns")
    )
    n = base.agg(F.count("*").cast("bigint").alias("total"))
    r2 = (
        c.join(gc, "x")
        .groupBy("source")
        .agg(
            # DECIMAL(38,0): the midrank sum is quadratic in corpus
            # size (the r8-advice int64 class, fixed repo-wide in r9);
            # u2 itself stays bigint — it exceeds int64 only past
            # ns*total ~ 9e18, a documented domain bound
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * (2 * F.col("c_before") + F.col("gcnt") + 1)
            ).alias("two_r")
        )
    )
    return (
        srcs.join(r2, "source")
        .crossJoin(F.broadcast(n))
        .filter(F.col("total") > F.col("ns"))
        .select(
            "source",
            F.col("ns").alias("n_docs"),
            (F.col("total") - F.col("ns")).cast("bigint").alias("n_rest"),
            (
                F.col("two_r")
                - F.col("ns").cast("decimal(38,0)") * (F.col("ns") + 1)
            )
            .cast("bigint")
            .alias("u2"),
            F.round(
                (
                    F.col("two_r")
                    - F.col("ns").cast("decimal(38,0)") * (F.col("ns") + 1)
                ).cast("double")
                / (
                    F.col("ns").cast("double")
                    * (F.col("total") - F.col("ns"))
                )
                - 1.0,
                6,
            ).alias("rank_biserial"),
        )
    )


@query(
    "q_theil_index",
    oracle="""
    WITH t AS (
      SELECT lang,
             CAST(COALESCE(len(list_filter(string_split(lower(text), ' '),
                                           x -> x <> '')), 0) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    pos AS (SELECT lang, n_tok FROM t WHERE n_tok > 0),
    h AS (SELECT lang, n_tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM pos GROUP BY lang, n_tok)
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(c * n_tok) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(c * n_tok * LN(CAST(n_tok AS DOUBLE))
                               AS DECIMAL(38,12))) AS DOUBLE)
                   / SUM(c * n_tok)
                 + LN(CAST(SUM(c) AS DOUBLE))
                 - LN(CAST(SUM(c * n_tok) AS DOUBLE)), 6) AS theil
    FROM h GROUP BY lang
    """,
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of token-count inequality per language — the
    decomposable inequality statistic that complements q_gini (Theil is
    additive across subgroups, so per-lang values roll up to a corpus
    figure; Gini does not). Uses the identity
    T = sum(c*x*ln x)/S + ln(n) - ln(S) over the per-lang length
    HISTOGRAM (S = total tokens): the x*ln(x) terms are deterministic
    doubles fixed in DECIMAL before summation, the rest is exact
    integer sums under IEEE ln/division, rounded to 6dp. Zero-token
    documents are excluded on both engines (x ln x has no limit
    contribution but T's population must be positive-valued).

    Scale posture: identical to the round-8 q_gini — the only
    aggregation below the rollup is the (lang, n_tok) histogram;
    nothing doc-scale is sorted or windowed. No reference counterpart
    (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.coalesce(
            F.size(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).cast("bigint"),
            F.lit(0),
        ).alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    h = t.groupBy("lang", "n_tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return h.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum(F.col("c") * F.col("n_tok")).cast("bigint").alias(
            "total_tokens"
        ),
        F.round(
            F.sum(
                (
                    F.col("c")
                    * F.col("n_tok")
                    * F.log(F.col("n_tok").cast("double"))
                ).cast("decimal(38,12)")
            ).cast("double")
            / F.sum(F.col("c") * F.col("n_tok"))
            + F.log(F.sum("c").cast("double"))
            - F.log(F.sum(F.col("c") * F.col("n_tok")).cast("double")),
            6,
        ).alias("theil"),
    )


@query(
    "q_simpson_diversity",
    oracle="""
    WITH base AS (
      SELECT source, lang FROM documents WHERE source IS NOT NULL
    ),
    sl AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
           FROM base GROUP BY source, lang)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           -- HUGEINT: c*(c-1) and n*(n-1) are quadratic in group size
           -- (the r8-advice int64 class, fixed repo-wide in r9)
           CAST(CASE WHEN SUM(c) < 2 THEN NULL
                     ELSE SUM(CAST(c AS HUGEINT) * (c - 1)) * 1000000
                          // (SUM(CAST(c AS HUGEINT))
                              * (SUM(CAST(c AS HUGEINT)) - 1))
                END AS BIGINT) AS simpson_ppm
    FROM sl GROUP BY source
    """,
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration of each source's language mix: the exact
    probability (ppm) that two documents drawn WITHOUT replacement from
    the source share a language — sum c(c-1) / n(n-1), pure integer
    arithmetic (the unbiased finite-population form, so no float
    squares and no DIV sign trap: every term is non-negative).
    Near-10^6 means a monolingual feed; a drop over time in a feed
    that should be monolingual flags language-ID drift. NULL lang is a
    real category, exactly as in q_js_divergence's grid.

    Scale posture: one (source, lang) scan-side rollup, then a
    source-level rollup of type-scale rows. Single-doc sources yield
    NULL (undefined without a second draw) on both engines. No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    sl = (
        docs.filter(F.col("source").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return sl.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_langs"),
        # DECIMAL(38,0): quadratic numerator/denominator exact to 10^38
        # (the r8-advice int64 class, fixed repo-wide in r9)
        F.expr(
            "CAST(CASE WHEN SUM(c) < 2 THEN NULL "
            "ELSE SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)) * 1000000 "
            "DIV (SUM(CAST(c AS DECIMAL(38,0))) "
            "* (SUM(CAST(c AS DECIMAL(38,0))) - 1)) END AS BIGINT)"
        ).alias("simpson_ppm"),
    )
