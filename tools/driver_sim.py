#!/usr/bin/env python
"""Driver-session simulation: run the parity sweep under a VANILLA
SparkSession (no pot_spark.session confs) to catch any query that
silently depends on the repo's own session configuration.

Round 2's only red correctness row (`q_pot_datasource`) failed exactly
this way: it worked under ``get_spark()`` (which sets
``spark.sql.python.filterPushdown.enabled``) and died under the external
driver's default session. This tool reproduces the driver's environment:
``SparkSession.builder.master("local[N]").getOrCreate()`` and nothing
else, then runs every registered query against its DuckDB oracle.

Usage: python tools/driver_sim.py [sf_dir] [only_csv]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from pot_spark import registry  # noqa: E402
from pot_spark.oracle import run_all  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # deliberately NOT get_spark(): this is the driver's session shape
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    registry.load_all_query_modules()
    results = run_all(spark, sf_dir, only=only)
    n_bad = 0
    for r in results:
        if not r.ok:
            n_bad += 1
            print(r)
    print(f"driver_sim: {len(results)} queries, {n_bad} failures (vanilla session)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
