"""Sorts, limits (top-k) and set operations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load


@query(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by extendedprice. Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition heap top-k then a k-row merge on
    the driver, never a full global sort; exactly what survives 100 TB."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(10)
    )


@query(
    "q_union",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two segments: unionByName + dropDuplicates —
    one shuffle on all columns for the distinct."""
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_name")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_name")
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that placed both an URGENT and a LOW priority order."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOMOBILE customers minus those with a finished order (EXCEPT is
    distinct-semantics, like the SQL twin)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@query(
    "q_union_all",
    oracle="""
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS total
    FROM (
        SELECT 'auto_or_building' AS seg, c_custkey, 1 AS cnt FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        UNION ALL
        SELECT 'high_balance' AS seg, c_custkey, 1 AS cnt FROM customer
        WHERE c_acctbal > 5000
    )
    GROUP BY seg
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics UNION ALL (q_union is the distinct variant):
    overlapping segments keep their duplicates, verified by per-segment
    counts. unionAll never shuffles — it is purely a plan concatenation."""
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    ).select(F.lit("auto_or_building").alias("seg"), "c_custkey", F.lit(1).alias("cnt"))
    b = cust.filter(F.col("c_acctbal") > 5000).select(
        F.lit("high_balance").alias("seg"), "c_custkey", F.lit(1).alias("cnt")
    )
    return (
        a.unionAll(b)
        .groupBy("seg")
        .agg(F.count("*").alias("n"), F.sum("cnt").cast("bigint").alias("total"))
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product of two tiny dimensions (5 x 25 rows) —
    the only place a cross join belongs: when both sides are broadcast-
    small and the product IS the answer (e.g. a grid of cells to fill).
    Spark requires the explicit crossJoin call, which is the right
    guardrail against accidental products at scale."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_global_sort",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order global sort (no limit): Spark samples the key
    distribution and range-partitions, so each partition holds a
    contiguous, internally sorted key range — partition i's keys all
    precede partition i+1's. This is the sorted-output path (sorted
    parquet export, merge-ready shards) as opposed to top-k
    (q_sort_limit, which never materializes a full sort). The driver's
    value-hash ignores order, so the oracle is the unsorted selection;
    the plan test pins the rangepartitioning Exchange."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
    )
