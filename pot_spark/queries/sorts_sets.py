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
