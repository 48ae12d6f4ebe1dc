#!/usr/bin/env python
"""Hostile-input robustness sweep: run EVERY registered query against a
fixture copy where ~30% of each non-key value is NULL and text columns
are salted with empty strings, whitespace-only strings, and multibyte
unicode — then fail on any exception.

What this catches (all found real bugs on first run): FAILFAST variant
parsing aborting on one malformed row, NaN-to-int casts in Pandas UDFs,
None payloads hitting np.frombuffer / file writes, and Spark's
`sequence(1, n-1)` COUNTING DOWN for n < 2 so element_at indexes 0/-1
into an empty array. At 100 TB every one of these exists somewhere in
the corpus; a single bad row must degrade to NULL/empty output, never
abort the job.

Usage: python tools/hostile_sweep.py [hostile_dir] [--parity]

--parity runs the full Spark-vs-DuckDB hash comparison on the hostile
fixture instead of the crash check — the strongest cross-engine
determinism gate in the repo: nulls and junk text push both engines
down code paths the clean fixture never exercises (NULLS FIRST/LAST
window defaults, concat null-propagation, arg_min null skipping,
json parse strictness). Round 4 drove this to zero failures.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# columns whose integrity the fixtures' joins/keys depend on: kept intact
KEYS = {
    "doc_id", "vec_id", "event_id", "user_id", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "c_custkey",
    "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey", "n_nationkey",
    "n_regionkey", "r_regionkey", "ts", "lang", "label", "source",
    "event_type", "o_orderdate", "l_shipdate", "o_orderpriority",
    "o_orderstatus", "l_returnflag", "l_linestatus", "c_mktsegment",
    "embedding",
}

_JUNK = ["", " ", "é中文 \U0001F600", "\t\n"]


def write_hostile_fixture(dst: str, src: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(7)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        t = pq.read_table(f)
        null_mask = rng.random(t.num_rows) < 0.3
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in KEYS:
                cols[name] = col
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                vals = col.to_pylist()
                cols[name] = pa.array(
                    [
                        None
                        if null_mask[i]
                        else (_JUNK[i % 4] if i % 11 == 0 else v)
                        for i, v in enumerate(vals)
                    ],
                    type=col.type,
                )
            elif (
                pa.types.is_floating(col.type)
                or pa.types.is_integer(col.type)
                or pa.types.is_decimal(col.type)
            ):
                vals = col.to_pylist()
                cols[name] = pa.array(
                    [None if null_mask[i] else v for i, v in enumerate(vals)],
                    type=col.type,
                )
            else:
                cols[name] = col
        pq.write_table(
            pa.table(
                cols,
                schema=pa.schema(
                    [(c, t.schema.field(c).type) for c in t.column_names]
                ),
            ),
            os.path.join(dst, os.path.basename(f)),
        )
    return dst


def main() -> None:
    import tempfile

    args = [a for a in sys.argv[1:] if a != "--parity"]
    parity = "--parity" in sys.argv[1:]
    dst = args[0] if args else os.path.join(
        tempfile.gettempdir(), "pot_spark_sf_hostile"
    )
    write_hostile_fixture(dst)

    from pot_spark.registry import QUERIES, load_all_query_modules
    from pot_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("hostile_sweep")

    if parity:
        from pot_spark.oracle import run_all

        bad = [r for r in run_all(spark, dst) if not r.ok]
        print(f"{len(QUERIES)} queries, {len(bad)} parity failures on hostile input")
        for r in bad:
            print(r)
        sys.exit(1 if bad else 0)

    fails = []
    for name, fn in QUERIES.items():
        try:
            # noop sink, NOT count(): count() lets Spark prune the
            # projection, hiding expression-level crashes (div-by-zero,
            # bad casts) in columns nobody aggregates
            fn(spark, dst).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - collecting the inventory
            fails.append((name, type(e).__name__, str(e).split("\n")[0][:140]))
    print(f"{len(QUERIES)} queries, {len(fails)} failures on hostile input")
    for f in fails:
        print(" ", f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
