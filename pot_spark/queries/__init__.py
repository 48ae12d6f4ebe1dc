"""Relational/analytic operator inventory (SURVEY.md §2-B-2).

Each module registers queries into ``pot_spark.registry`` with a DuckDB
oracle twin. Conventions that keep the oracle hash-match stable:

- every computed column is aliased identically in Spark and SQL;
- aggregates over DOUBLE go through DECIMAL(18,2) (order-independent,
  bit-identical across engines) and are cast back to DOUBLE;
- counts/ranks are cast to BIGINT on both sides (DuckDB's COUNT/ROW_NUMBER
  are BIGINT; Spark's row_number is INT);
- transcendental results (ln/pow/cos-sim) are rounded to a fixed scale so
  1-ulp libm differences cannot flip the hash;
- any top-k or window ordering carries a unique tie-breaker column.
"""

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def dec(col: str) -> Column:
    """The engine-exact aggregation cast (convention #2 above): DOUBLE ->
    DECIMAL(18,2) before any SUM, so partial-aggregation order cannot
    move the result and both engines agree bit-for-bit."""
    return F.col(col).cast("decimal(18,2)")
