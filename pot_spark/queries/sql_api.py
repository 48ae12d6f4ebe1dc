"""SQL API surface: the same engine driven through `spark.sql` over
registered temp views — the declarative twin of the DataFrame queries
(identical Catalyst plans, so every physical property the plan tests pin
holds here too).

No reference counterpart: the reference has no query language at all
(readme.md:43).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load

_Q3 = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("q_sql_q3", oracle=_Q3)
def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority) run as literal SQL text through
    spark.sql over temp views — the oracle is the *same string* executed
    by DuckDB, so this also proves the engine's SQL dialect stays in the
    ANSI-compatible subset. Catalyst plans it exactly like the DataFrame
    equivalent: customer filter pushed to the scan, dim side broadcast,
    TakeOrderedAndProject for the top-10."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3)


_Q18 = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 20
"""


@query("q_sql_q18", oracle=_Q18)
def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN-subquery over a grouped
    HAVING aggregate feeding a 3-table join + regroup. Catalyst plans the
    IN as a left-semi join against the aggregated subquery — the lineitem
    scan is shared, and the DECIMAL quantity sums are engine-exact."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q18)


_Q5 = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("q_sql_q5", oracle=_Q5)
def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): the 6-way star join with the
    c_nationkey = s_nationkey theta condition folded into the supplier
    equi-join. The oracle is the same SQL string run by DuckDB. Scale
    shape: region/nation/supplier are dimension-sized and broadcast;
    the only real shuffle is orders ⋈ lineitem on the orderkey, and the
    region filter cascades through nation→supplier→customer so the fact
    rows that survive to that shuffle are already region-pruned.
    DECIMAL revenue keeps the sum order-independent (hash-exact)."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5)


_Q10 = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("q_sql_q10", oracle=_Q10)
def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a quarter-year window. The returnflag filter and
    the orderdate range both push to the scans; nation broadcasts; the
    top-20 plans as TakeOrderedAndProject (per-partition heap + driver
    merge — never a global sort shuffle). c_acctbal passes through
    unrounded: it is a stored value, identical bytes in both engines."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q10)


_RECURSIVE_SPINE = """
WITH RECURSIVE months(m) AS (
    SELECT 0
    UNION ALL
    SELECT m + 1 FROM months WHERE m < 83
),
agg AS (
    SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price
    FROM orders
    GROUP BY 1
)
SELECT months.m,
       COALESCE(agg.n_orders, 0) AS n_orders,
       CAST(COALESCE(agg.sum_price, 0) AS DOUBLE) AS sum_price
FROM months LEFT JOIN agg ON agg.m = months.m
"""


@query("q_sql_recursive", oracle=_RECURSIVE_SPINE)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4's UnionLoop execution): an
    84-month calendar spine generated by recursion, LEFT JOINed onto
    orders so empty months survive with zero counts — the date-spine
    pattern a warehouse uses when it cannot assume every bucket has
    data. The oracle is the *same SQL string* run by DuckDB. Scale
    shape: the fact table is aggregated to O(months) rows BEFORE the
    spine join (a spine-first LEFT JOIN against raw orders would force
    Spark to broadcast or shuffle the fact side to keep the left-outer
    spine — aggregate-then-join keeps the orders scan one partial-agg
    pass and makes the join trivially broadcastable); the recursion
    itself is O(months) rows and runs once.

    No reference counterpart: petomalina/pot has no query language at
    all (readme.md:43)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE)


_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> EXTEND CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          AS disc_price
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(disc_price) AS DOUBLE) AS revenue
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_items > 0
|> SELECT l_returnflag, l_linestatus, n_items, sum_qty, revenue
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 0
"""


@query("q_sql_pipe", oracle=_PIPE_ORACLE)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators: FROM |> WHERE |> EXTEND
    |> AGGREGATE |> SELECT) — the linear query form through the same
    Catalyst planner, so pushdown/partial-aggregation behave exactly as
    the nested-SELECT equivalent the DuckDB oracle runs. Demonstrates
    the engine's SQL API surface is full Spark 4, not just classic
    SELECT.

    No reference counterpart: petomalina/pot has no query language at
    all (readme.md:43)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SQL)


@query(
    "q_sql_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_totalprice > 50000.0
    GROUP BY o_orderpriority
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (spark.sql named parameter markers): the
    injection-safe API surface an engine exposes to applications —
    parameters bind as typed literals in the parsed plan, so constant
    folding and pushdown see real values, not string concatenation.
    The oracle runs the equivalent inlined query."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={
            "cutoff": datetime.datetime(1996, 1, 1),
            "min_price": 50000.0,
        },
    )


@query(
    "q_transpose",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM orders
    )
    SELECT 'n_orders' AS key, n_orders AS metrics FROM m
    UNION ALL SELECT 'sum_price', sum_price FROM m
    UNION ALL SELECT 'max_price', max_price FROM m
    """,
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4): a 1-row metrics aggregate flipped
    to (key, value) rows — the metrics-table shape dashboards ingest.
    Transpose collects the frame being flipped, so it is strictly a
    small-aggregate affair (here: one row); the heavy lifting stays in
    the aggregation before it."""
    o = load(spark, sf_dir, "orders")
    m = o.agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    ).withColumn("metrics", F.lit("metrics"))
    return (
        m.select("metrics", "n_orders", "sum_price", "max_price")
        .transpose(F.col("metrics"))
    )


_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q_sql_q6", oracle=_Q6)
def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure-scan aggregate —
    every predicate (date range, discount band, quantity cap) pushes to
    the parquet scan, no join, no shuffle beyond the 1-row final
    aggregate. The benchmark's lower bound on scan throughput: at 100 TB
    this runs at raw column-decode speed with row-group stats skipping
    out-of-range date chunks. DECIMAL products keep the revenue sum
    order-independent."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6)


_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
             AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q_sql_q7", oracle=_Q7)
def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade flows
    — the OR-of-conjunctions predicate over two broadcast nation lookups
    that a naive planner turns into a fan-out union. Both nation dims
    broadcast; the nation filter prunes fact rows before the
    orders⋈lineitem shuffle; per-(pair, year) DECIMAL rollup."""
    for t in ("supplier", "lineitem", "orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q7)


_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q_sql_q13", oracle=_Q13)
def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): a count-of-counts — LEFT JOIN
    with a join-side-only predicate (the classic trap: filtering in
    WHERE would silently drop order-less customers), per-customer order
    counts, then the histogram of those counts. Two aggregations, the
    second over a tiny distinct-count domain; the join predicate pushes
    to the orders scan."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q13)


_Q22 = """
SELECT cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
    SELECT c_nationkey % 10 AS cntrycode, c_acctbal
    FROM customer c
    WHERE c_nationkey % 10 IN (1, 3, 5, 7)
      AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7)
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q_sql_q22", oracle=_Q22)
def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): wealthy customers who never
    ordered, by country code — an uncorrelated scalar subquery (global
    positive-balance average as an exact DECIMAL sum over one double
    division — order-independent, so the threshold is engine-exact —
    broadcast as a 1-row relation) AND a
    correlated NOT EXISTS (planned as a left-anti join against the
    date-filtered orders slice — "no recent orders", the fixture-dense
    adaptation of the reference predicate).
    The anti join shuffles on custkey once; everything else is scan-side.
    Country code adapted to the fixture as c_nationkey % 10."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22)


_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q_sql_q1", oracle=_Q1)
def q_sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) as LITERAL SQL — the canonical
    wide-aggregate scan, here through spark.sql with the identical
    string run by DuckDB (the DataFrame twin is q_groupby_agg). One
    partial-agg'd shuffle to a 6-row result; every measure is an exact
    DECIMAL sum (order-independent, hash-exact)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q1)


_Q8 = """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
             AS volume,
           n2.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q_sql_q8", oracle=_Q8)
def q_sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the 8-table join with TWO roles
    for nation (customer's region filter vs supplier's share nation) and
    a conditional-share ratio per year. Every dimension broadcasts; the
    part-type filter prunes lineitem rows through the first join; the
    share is a ratio of two exact DECIMAL sums with one final IEEE
    division — engine-exact."""
    for t in ("part", "lineitem", "supplier", "orders", "customer",
              "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q8)


_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
             AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("q_sql_q15", oracle=_Q15)
def q_sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a named revenue view consumed twice —
    once joined to supplier, once aggregated to the scalar max that
    filters it. Catalyst plans the scalar subquery as a broadcast 1-row
    relation; the CTE's quarterly revenue rollup is one partial-agg'd
    shuffle on suppkey. DECIMAL equality (not double) decides the max
    comparison, so ties resolve identically in both engines."""
    for t in ("lineitem", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q15)


_Q17 = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("q_sql_q17", oracle=_Q17)
def q_sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): a correlated aggregate
    subquery per part — Catalyst decorrelates it into a per-partkey
    average join instead of re-scanning lineitem per row (the
    O(n²) trap a naive executor falls into). The brand filter prunes
    the probe side first; the per-part averages aggregate once. The
    0.2·avg threshold comparison happens on doubles computed identically
    in both engines (single division of a count-backed average)."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17)


_Q14 = """
SELECT CAST(floor(
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2))
                                 - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           * 1000000.0
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       ) AS BIGINT) AS promo_share_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q_sql_q14", oracle=_Q14)
def q_sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo revenue share of one month's
    shipments — a conditional-aggregate ratio over the lineitem ⋈ part
    join (part broadcasts; the date range pushes to the scan). Both
    sums are exact DECIMALs; the share is one double multiply-divide
    floored to ppm, so the ratio is engine-exact (the original's
    100.0*x/y double form rounds differently per engine)."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q14)


# -- round-6 additions: the four partsupp-free TPC-H queries still missing --
#
# The fixtures carry no l_commitdate / l_receiptdate / l_shipmode /
# p_container / o_comment columns, so each query keeps its CANONICAL
# SHAPE (the part Catalyst must plan well) with the missing column
# swapped for a fixture-available stand-in, documented per query. The
# oracle is the identical SQL string run by DuckDB.

_Q4 = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q_sql_q4", oracle=_Q4)
def q_sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): one quarter's orders that have
    at least one problem lineitem, counted per priority. Shape under
    test: the correlated EXISTS must decorrelate to a LEFT SEMI join on
    l_orderkey with the inner-only predicate pushed to the lineitem
    scan — never a per-row subquery. (The original's late-delivery
    predicate l_commitdate < l_receiptdate uses columns the fixture
    lacks; l_returnflag = 'R' stands in as the same inner-only
    single-table predicate.)"""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q4)


_Q12 = """
SELECT l.l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('N', 'R')
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY ship_class
"""


@query("q_sql_q12", oracle=_Q12)
def q_sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority): per ship class, how many
    high- vs low-priority orders shipped in the year — the two-level
    conditional-count shape (CASE inside SUM over a fact join). The
    lineitem filters (class membership + date window) must push to the
    scan; the only shuffle is the orderkey join. (l_linestatus stands in
    for the missing l_shipmode; the shipdate year window for the
    missing commit/receipt predicates.)"""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q12)


_Q19 = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_type = 'SMALL'
       AND l.l_quantity >= 1 AND l.l_quantity <= 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#23' AND p.p_type = 'MEDIUM'
       AND l.l_quantity >= 10 AND l.l_quantity <= 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#34' AND p.p_type = 'LARGE'
       AND l.l_quantity >= 20 AND l.l_quantity <= 30
       AND p.p_size BETWEEN 1 AND 15)
"""


@query("q_sql_q19", oracle=_Q19)
def q_sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the OR-of-conjunctions query —
    three disjuncts, each mixing part-side (brand/type/size) and
    lineitem-side (quantity) predicates. Shape under test: the mixed OR
    must NOT defeat the join strategy — part stays the broadcast build
    side with the disjunction evaluated as the join's post-condition,
    and Catalyst's CNF extraction pushes the part-only residue
    (brand/type/size disjunction) down to the part scan so the build
    side is pre-filtered. (p_type stands in for the missing
    p_container; the shipmode/shipinstruct filters are dropped with the
    columns.)"""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q19)


_Q21 = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_7'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@query("q_sql_q21", oracle=_Q21)
def q_sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the hardest
    partsupp-free query: a 4-table join carrying BOTH a correlated
    EXISTS and a correlated NOT EXISTS against lineitem, each with an
    equi-correlation (l_orderkey) plus a non-equi residual
    (l_suppkey <>). Shape under test: both subqueries must decorrelate
    — EXISTS to a left-semi, NOT EXISTS to a left-anti, each a single
    hash join on orderkey with the residual as join condition — never a
    per-row re-scan of lineitem (the O(n²) trap). supplier/nation
    broadcast; the multi-supplier orders flow through one orderkey
    shuffle shared by the semi/anti probes. (l_returnflag = 'R' stands
    in for the original's l_receiptdate > l_commitdate on both the
    outer row and the NOT EXISTS arm, preserving the 'only THIS
    supplier was late' semantics.)"""
    for t in ("supplier", "lineitem", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21)


# -- round-6 (cont.): the five partsupp TPC-H queries over a DERIVED
#    partsupp --
#
# The fixtures carry no partsupp table, so Q2/Q9/Q11/Q16/Q20 were the
# only TPC-H queries still missing. partsupp's JOIN STRUCTURE is fully
# deterministic arithmetic in dbgen itself (each part gets 4 suppliers
# by a partkey-indexed formula over the supplier count); we derive an
# equivalent table as a CTE from `part` x a 4-row sequence, modulo
# COUNT(supplier) so the derivation holds at every scale factor. The
# CTE text is embedded verbatim in BOTH the Spark query and the DuckDB
# oracle (one string), so parity needs no cross-engine trust in RNG.
# ps_supplycost is carried as exact integer CENTS alongside the double
# view: aggregates sum the cents (order-independent, no double drift,
# and no double->bigint cast, which truncates in Spark but rounds in
# DuckDB) and divide once at the end.
#
# Catalyst treats the CTE like any derived relation: the 4-row sequence
# and 1-row supplier count are broadcast, so partsupp is produced by a
# narrow map over the part scan -- no shuffle, and at 100 TB it is
# exactly as partitioned as `part` itself.

_PARTSUPP = """partsupp AS (
    SELECT p.p_partkey AS ps_partkey,
           (p.p_partkey + seq.i) % sc.n_supp AS ps_suppkey,
           ((p.p_partkey * 13 + seq.i * 7) % 9999) + 1 AS ps_availqty,
           ((p.p_partkey * 31 + seq.i * 17) % 90000) + 10000 AS ps_cost_cents,
           CAST(((p.p_partkey * 31 + seq.i * 17) % 90000) + 10000 AS DOUBLE)
               / 100.0 AS ps_supplycost
    FROM part p
    CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1
                UNION ALL SELECT 2 UNION ALL SELECT 3) seq
    CROSS JOIN (SELECT COUNT(*) AS n_supp FROM supplier) sc
)"""

_Q2 = f"""
WITH {_PARTSUPP}
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
       ps.ps_supplycost
FROM part p
JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size BETWEEN 1 AND 15
  AND p.p_type = 'ECONOMY'
  AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("q_sql_q2", oracle=_Q2)
def q_sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    supplier(s) in one region offering the region-minimum supplycost.
    Shape under test: the correlated scalar MIN subquery over the same
    partsupp ⋈ supplier ⋈ nation ⋈ region tree must DECORRELATE to a
    grouped-min aggregate joined back on ps_partkey — one extra hash
    join, never a per-part re-scan. The min-cost equality compares
    doubles produced by the identical CTE expression on both sides of
    the decorrelated join, so it is engine-exact. (p_brand stands in
    for the missing p_mfgr in the projection; s_acctbal/s_name for the
    missing address/phone/comment.)"""
    for t in ("part", "supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q2)


_Q9 = f"""
WITH {_PARTSUPP}
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                     * 100
                     - CAST(ps.ps_cost_cents AS DECIMAL(18,2))
                       * CAST(l.l_quantity AS DECIMAL(18,2)))
                 AS DOUBLE) / 100.0
            AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey AND ps.ps_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
ORDER BY nation, o_year DESC
"""


@query("q_sql_q9", oracle=_Q9)
def q_sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): per nation and order-year, the
    profit (revenue minus supply cost) on one product family. The
    classic 6-table star-with-two-facts query: lineitem joins partsupp
    on the COMPOSITE (partkey, suppkey) key. Shape under test: the
    p_name LIKE filter must reach the part scan and the derived
    partsupp must stay a narrow map over part (no shuffle to build
    it); part/supplier/nation broadcast, orders joins on the orderkey
    shuffle. Profit terms are DECIMAL-exact (cents-based supplycost),
    so the grouped sums are order-independent."""
    for t in ("lineitem", "supplier", "part", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q9)


_Q11 = f"""
WITH {_PARTSUPP}
SELECT ps.ps_partkey,
       CAST(SUM(CAST(ps.ps_cost_cents AS DECIMAL(18,2))
                * CAST(ps.ps_availqty AS DECIMAL(18,2))) / 100.0
            AS DOUBLE) AS value
FROM partsupp ps
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
GROUP BY ps.ps_partkey
HAVING SUM(CAST(ps.ps_cost_cents AS DECIMAL(18,2))
           * CAST(ps.ps_availqty AS DECIMAL(18,2))) * 2000 > (
    SELECT SUM(CAST(ps2.ps_cost_cents AS DECIMAL(18,2))
               * CAST(ps2.ps_availqty AS DECIMAL(18,2)))
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    WHERE n2.n_name = 'NATION_7'
)
ORDER BY value DESC, ps.ps_partkey
"""


@query("q_sql_q11", oracle=_Q11)
def q_sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose stock value within one
    nation exceeds a fixed fraction of that nation's total stock value.
    Shape under test: the uncorrelated scalar total is computed ONCE
    and broadcast into the HAVING filter (Catalyst's ScalarSubquery),
    not re-evaluated per group. Both the per-part and total sums are
    exact DECIMAL cents·qty products, so the threshold comparison
    (x * 2000 > total, the integer form of x > total * 0.0005) is
    engine-exact with no double rounding at the cut line."""
    for t in ("supplier", "nation", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q11)


_Q16 = f"""
WITH {_PARTSUPP}
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("q_sql_q16", oracle=_Q16)
def q_sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier counts
    per (brand, type, size) over qualifying parts, excluding a
    supplier blocklist. Shape under test: the NOT IN subquery must
    become a null-aware broadcast anti join (the blocklist is tiny);
    the brand/type/size predicates push to the part scan; COUNT
    DISTINCT plans as the two-phase partial/final distinct aggregate.
    (s_acctbal < 0 stands in for the original's complaints-comment
    LIKE as the blocklist predicate; the fixture has no s_comment.)"""
    for t in ("part", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q16)


_Q20 = f"""
WITH {_PARTSUPP}
SELECT s.s_name, n.n_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      WHERE ps.ps_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      AND ps.ps_availqty > (
          SELECT 0.5 * SUM(l.l_quantity)
          FROM lineitem l
          WHERE l.l_partkey = ps.ps_partkey
            AND l.l_suppkey = ps.ps_suppkey
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      )
  )
ORDER BY s.s_name
"""


@query("q_sql_q20", oracle=_Q20)
def q_sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers (with their
    nation) whose stock of one part family exceeds half of what they
    actually shipped in a year. The deepest nesting in TPC-H: IN ( ...
    IN (...) AND x > (correlated scalar agg) ). (The original's
    single-nation filter is lifted to a nation projection — with the
    fixture's 25 nations x derived partsupp the filtered result is
    empty at test scale, which would be vacuous evidence; the
    semi-join nesting, the hard part, is unchanged.) Shape under test:
    the inner
    correlated SUM over lineitem must decorrelate to a grouped
    aggregate on (l_partkey, l_suppkey) joined back to partsupp —
    never a per-(part,supplier) lineitem re-scan — and both IN
    subqueries become semi joins. A NULL scalar (no shipments) fails
    the > comparison in both engines, preserving TPC-H's
    must-have-shipped semantics. l_quantity values are integral, so
    the double SUM is exact and order-independent."""
    for t in ("supplier", "nation", "part", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q20)
