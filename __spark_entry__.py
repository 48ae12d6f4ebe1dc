"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``pot_spark`` (see SURVEY.md §2-B for the
inventory this exposes).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pot_spark import registry  # noqa: E402

# This module exists solely for the driver's CORRECTNESS gate (Spark
# result hash-compared against exact DuckDB SQL), so the adaptive dedup
# chooser must never take its approximate banded candidate tier here:
# force the exact fallback for everything invoked through this entry.
# bench.py imports registry directly (separate process) and keeps the
# adaptive behavior, so benchmarks still exercise the banded tier.
os.environ.setdefault("POT_SPARK_DEDUP_FORCE_EXACT", "1")

registry.load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_multiway_join revenue rollup) on sf0.001."""
    return registry.QUERIES["q_multiway_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI-SQL twin for each SQL-expressible query. Keys absent
    here (approximate/algorithmic/stubbed ops) get the driver's weaker
    rows-only check."""
    return dict(registry.ORACLES)
