#!/usr/bin/env python
"""Skewed-key 10x smoke for the low-cardinality-partition window family.

Builds a DELIBERATELY SKEWED 10x fixture from the standard shifted-key
10x corpus (tools/scale_smoke.py): 90% of documents are forced into ONE
language and 90% of events into ONE event_type — the exact shape the
round-7 verdict flagged (half a web corpus is one language, so a
lang-partitioned doc-scale sort lands on one reducer). The ops under
test were rewritten in round 8 to run their windows over per-partition
VALUE HISTOGRAMS (type-scale), so the measured wall-clock ratio
1x -> skewed-10x must stay near the data ratio, not blow up on the hot
partition.

Usage:
    python tools/skew_smoke.py                 # default op set
    python tools/skew_smoke.py --queries a,b   # override

Results feed SCALE.md's "skewed-key smoke" table.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SYNTH = "/tmp/sf1_synth"  # built by tools/scale_smoke.py
DST = "/tmp/sf1_skew"

# ops whose windows partition on the skewed key (lang / event_type /
# day); q_peak_concurrency's skew dimension is `day`, which the shifted
# 10x fixture already stresses (10x boundary rows per day)
DEFAULT = [
    "q_gini",
    "q_ccnet_bins",
    "q_length_bias",
    "q_winsorize",
    "q_peak_concurrency",
]


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    if not os.path.isdir(os.path.join(SYNTH, "documents.parquet")):
        from tools.scale_smoke import build_fixture as build_synth

        build_synth(spark)
    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SYNTH}/documents.parquet")
    # deterministic 90% collapse: doc_id % 10 != 0 -> the hot language
    docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 10 != 0, F.lit("hot")).otherwise(
            F.col("lang")
        ),
    ).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    ev = spark.read.parquet(f"{SYNTH}/events.parquet")
    ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 10 != 0, F.lit("hot")).otherwise(
            F.col("event_type")
        ),
    ).write.mode("overwrite").parquet(f"{DST}/events.parquet")
    for f in glob.glob(SYNTH + "/*.parquet"):
        name = os.path.basename(f)
        if name.split(".")[0] not in ("documents", "events"):
            d = f"{DST}/{name}"
            if os.path.isdir(f):
                shutil.copytree(f, d, dirs_exist_ok=True)
            else:
                shutil.copy(f, d)
    print("skew fixture ready", flush=True)


def smoke(spark, names: list[str]) -> None:
    from pot_spark import registry

    registry.load_all_query_modules()
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):  # pay JVM/codegen outside the clock
        for name in names:
            try:
                registry.QUERIES[name](spark, warm_sf).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:  # noqa: BLE001
                pass
    results: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SRC, "1x"), (DST, "skew10x")):
        for name in names:
            t0 = time.perf_counter()
            try:
                registry.QUERIES[name](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name} @{tag}: {e}", flush=True)
                dt = float("nan")
            results.setdefault(name, {})[tag] = dt
            print(f"{name:24s} {tag:>8s} {dt:7.2f}s", flush=True)
    print("\n| query | 1x | skewed 10x | ratio |")
    print("|---|---|---|---|")
    for name in names:
        r = results[name]
        ratio = r["skew10x"] / r["1x"] if r.get("1x") else float("nan")
        print(f"| {name} | {r['1x']:.2f}s | {r['skew10x']:.2f}s | {ratio:.1f}x |")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    from pot_spark.session import get_spark

    spark = get_spark("skew_smoke", cpus="32")
    if not os.path.isdir(os.path.join(DST, "documents.parquet")):
        print("building skewed 10x fixture...", flush=True)
        build_fixture(spark)
    smoke(spark, args.queries.split(",") if args.queries else DEFAULT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
