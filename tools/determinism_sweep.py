#!/usr/bin/env python
"""Partitioning-determinism sweep: run EVERY registered query twice —
under the engine defaults (local[32], 32 shuffle partitions) and under
a deliberately different layout (local[8], 7 shuffle partitions, 1 MiB
input splits so scans produce many more tasks) — and fail if any result
hashes differently.

Why this matters at 100 TB: partition count is the one thing guaranteed
to differ between the test rig and a 1000-executor cluster (and between
two runs on the same cluster once AQE re-plans). Any operator whose
result depends on partition layout — a raw double sum accumulated in
shuffle-arrival order, a row_number over a non-unique ordering, a
first()/head() without a sort — is silently nondeterministic in
production. The repo's DECIMAL-accumulation and unique-tie-break rules
exist precisely to kill this class; this sweep enforces them
inventory-wide.

Usage: python tools/determinism_sweep.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _result_hash(pdf) -> str:
    from pot_spark.oracle import _canon

    c = _canon(pdf)
    return hashlib.sha1(
        c.to_csv(index=False, float_format="%.12g").encode()
    ).hexdigest()


def _run_all_hashes(spark, sf_dir: str) -> dict[str, str]:
    from pot_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    out: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            out[name] = _result_hash(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 - recorded, compared below
            out[name] = f"ERROR:{type(e).__name__}:{str(e)[:80]}"
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pot_spark.session import get_spark

    spark = get_spark("determinism_a")
    baseline = _run_all_hashes(spark, sf_dir)
    spark.stop()

    # deliberately different layout: fewer cores, prime shuffle
    # partition count, tiny input splits (many more scan tasks)
    alt = (
        SparkSession.builder.master("local[8]")
        .appName("determinism_b")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    alt.sparkContext.setLogLevel("WARN")
    other = _run_all_hashes(alt, sf_dir)

    diffs = [
        (n, baseline[n], other.get(n))
        for n in baseline
        if baseline[n] != other.get(n)
    ]
    # an identical ERROR on both sides is NOT determinism — surface it
    errs = [n for n in baseline if str(baseline[n]).startswith("ERROR")]
    errs += [n for n in other if str(other[n]).startswith("ERROR") and n not in errs]
    print(f"{len(baseline)} queries, {len(diffs)} partitioning-dependent results")
    for n, a, b in diffs:
        print(f"  {n}:\n    32p: {a}\n     7p: {b}")
    if errs:
        print(f"{len(errs)} queries ERRORED (both sides): {errs}")
    sys.exit(1 if (diffs or errs) else 0)


if __name__ == "__main__":
    main()
