#!/usr/bin/env python
"""Snapshot .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/plan_snapshot.py <tag> <suffix> q_a q_b ...
Writes plans/<tag>/<query>_<suffix>.txt (e.g. tag=r13, suffix=before).

Queries that eagerly checkpoint at build time still execute those jobs;
the captured plan is the final returned DataFrame's, which is what the
bench times (modulo the checkpointed subtree, noted inline).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pot_spark import registry  # noqa: E402
from pot_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    registry.load_all_query_modules()
    spark = get_spark("plan_snapshot")
    sf = os.environ.get("POT_SPARK_PLAN_SF_DIR", "/root/testdata/sf0.001")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
