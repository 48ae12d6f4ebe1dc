"""Bucketed co-located join: pre-partition both fact tables on the join
key so the join itself needs NO shuffle — the physical pattern that makes
repeated large-fact joins viable at 100 TB (bucket once at ingest,
join shuffle-free forever after).

tests/test_plans.py asserts the join stage of this query's physical plan
contains no Exchange under the SortMergeJoin.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load

N_BUCKETS = 8

_BUCKET_DIRS_REGISTERED: set[str] = set()


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/lineitem bucketed by the join key (idempotent per
    sf_dir)."""
    import hashlib

    # fixture-identity + per-process tag: a second fixture root sharing
    # the basename must not resolve to the same catalog tables, and two
    # concurrent sessions must not saveAsTable into one directory (the
    # in-session idempotence only needs the catalog check)
    tag = "{}_{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"),
        hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:8],
        os.getpid(),
    )
    lt, ot = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    base = os.path.join(tempfile.gettempdir(), f"pot_spark_buckets_{tag}")
    if base not in _BUCKET_DIRS_REGISTERED:
        # per-PID dirs would otherwise pile up in /tmp across runs
        import atexit
        import shutil

        _BUCKET_DIRS_REGISTERED.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    if not spark.catalog.tableExists(lt):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, lt))
            .mode("overwrite")
            .saveAsTable(lt)
        )
    if not spark.catalog.tableExists(ot):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, ot))
            .mode("overwrite")
            .saveAsTable(ot)
        )
    return lt, ot


@query(
    "q_bucket_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables bucketed on the join key: both sides scan their
    co-located buckets; the SortMergeJoin runs with zero Exchange."""
    lt, ot = ensure_bucketed_tables(spark, sf_dir)
    # disable broadcast for this plan so the bucketed SMJ is exercised
    li = spark.table(lt).hint("merge")
    orders = spark.table(ot).hint("merge")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
