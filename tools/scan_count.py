#!/usr/bin/env python
"""Plan-only audit: for every registered batch query, count Scan parquet
nodes per source table in the (initial) physical plan tree. A query whose
plan scans the same table N>1 times re-reads and re-derives that source N
times unless AQE stage reuse dedupes canonically-identical exchanges —
flagging candidates for the shared-base-aggregate restructure (guide
§1.2-1 / §2.4: remove passes outright).

Usage: python tools/scan_count.py [sf_dir] [min_scans] [name_prefix...]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pot_spark import registry  # noqa: E402
from pot_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    prefixes = tuple(sys.argv[3:])
    spark = get_spark("scan_count")
    registry.load_all_query_modules()
    rows = []
    for name, fn in sorted(registry.QUERIES.items()):
        if name.startswith("s_"):
            continue  # streaming twins: separate machinery
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1, f"ERROR {type(e).__name__}: {e}"))
            continue
        tables = collections.Counter()
        for m in re.finditer(r"Location: InMemoryFileIndex \[[^\]]*?([\w.]+)\.parquet", plan):
            tables[m.group(1)] += 1
        total = sum(tables.values())
        if total >= min_scans and any(v >= 2 for v in tables.values()):
            rows.append((name, total, dict(tables)))
    rows.sort(key=lambda r: -r[1])
    for name, total, tables in rows:
        print(f"{total:3d}  {name:32s} {tables}")
    print(f"-- {len(rows)} queries with a table scanned >=2x (or errors)")


if __name__ == "__main__":
    main()
