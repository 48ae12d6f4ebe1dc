#!/usr/bin/env python
"""Empty-input robustness sweep: run EVERY registered query against a
zero-row copy of the fixture schema and fail on any exception.

Why this matters at scale: a 100 TB pipeline routinely produces empty
intermediate slices (a date partition with no data, a filter that
matches nothing, a tenant with no rows). An operator that throws on
empty input — zero-file partitioned sinks failing schema inference,
driver-side collect()[0] on an empty aggregate, div-by-zero paths —
takes the whole job down exactly when it should produce an empty
result. Every query must degrade to 0 rows, not an exception.

Usage: python tools/empty_sweep.py [empty_dir]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq


def write_empty_fixture(dst: str, src: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(dst, exist_ok=True)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        schema = pq.read_schema(f)
        pq.write_table(schema.empty_table(), os.path.join(dst, os.path.basename(f)))
    return dst


def main() -> None:
    import tempfile

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        tempfile.gettempdir(), "pot_spark_sf_empty"
    )
    write_empty_fixture(dst)

    from pot_spark.registry import QUERIES, load_all_query_modules
    from pot_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("empty_sweep")
    fails = []
    for name, fn in QUERIES.items():
        try:
            # noop sink, NOT count(): count() lets Spark prune the
            # projection, hiding expression-level crashes (div-by-zero,
            # bad casts) in columns nobody aggregates
            fn(spark, dst).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - collecting the inventory
            fails.append((name, type(e).__name__, str(e).split("\n")[0][:140]))
    print(f"{len(QUERIES)} queries, {len(fails)} failures on empty input")
    for f in fails:
        print(" ", f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
