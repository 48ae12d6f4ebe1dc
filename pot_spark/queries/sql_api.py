"""SQL API surface: the same engine driven through `spark.sql` over
registered temp views — the declarative twin of the DataFrame queries
(identical Catalyst plans, so every physical property the plan tests pin
holds here too).

No reference counterpart: the reference has no query language at all
(readme.md:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
