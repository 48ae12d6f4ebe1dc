#!/usr/bin/env python
"""10x scale-up smoke: measure wall-clock ratios for the heaviest
queries (and optionally the heaviest KV ops) between sf0.1 and a
synthetic ~sf1 fixture built by unioning sf0.1 ten times with shifted
keys. Shifting (rather than regenerating) means every duplicate cluster
also grows 10x — the WORST case for dedup candidate volume — while all
value distributions stay identical, so a ratio > 10/(cores saturation)
is always an algorithmic super-linearity, never a data-shape change.

Usage:
    python tools/scale_smoke.py            # query smoke (builds fixture if absent)
    python tools/scale_smoke.py --kv       # KV-layer smoke only
    python tools/scale_smoke.py --queries q_ngram_jaccard,q_containment_dedup

Results feed SCALE.md's "10x scale-up smoke" table.
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
DST = "/tmp/sf1_synth"

# per-replica key shifts keep ids unique; events user_id stays in range so
# per-user group counts grow 10x; orders/lineitem cross-refs stay within
# replica 0 (same recipe as the round-4 smoke — ratios are comparable)
SHIFTS = {
    "documents": ("doc_id", 10_000_000),
    "events": ("event_id", 100_000_000),
    "embeddings": ("vec_id", 10_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "customer": ("c_custkey", 10_000_000),
}

HEAVY = [
    "q_groupby_agg",
    "q_multiway_join",
    "q_window_ntile_dense",
    "q_seq_pack",
    "q_sql_q5",
    "q_dedup_near",
    "q_sim_ivf",
    "q_contamination",
    "q_prefix_filter_join",
    "q_triangle_count",
    "q_ngram_jaccard",
    "q_containment_dedup",
]


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for t, (key, shift) in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = df
        for i in range(1, 10):
            out = out.unionByName(df.withColumn(key, F.col(key) + F.lit(i * shift)))
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print("wrote", t, flush=True)
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        if name.split(".")[0] not in SHIFTS:
            d = f"{DST}/{name}"
            if os.path.isdir(f):
                shutil.copytree(f, d, dirs_exist_ok=True)
            else:
                shutil.copy(f, d)
            print("copied", name, flush=True)


def smoke_queries(spark, names: list[str]) -> None:
    from pot_spark import registry

    registry.load_all_query_modules()
    # warm the JVM/codegen/parquet paths on the tiny fixture first: the
    # 1x timings run before the 10x ones, and without this the first 1x
    # measurements absorb session startup, deflating the very ratios the
    # tool exists to expose
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in names:
            try:
                registry.QUERIES[name](spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 - warmup must not kill the smoke
                pass
    results: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SRC, "1x"), (DST, "10x")):
        for name in names:
            t0 = time.perf_counter()
            try:
                registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name} @{tag}: {e}", flush=True)
                dt = float("nan")
            results.setdefault(name, {})[tag] = dt
            print(f"{name:28s} {tag:>3s} {dt:7.2f}s", flush=True)
    print("\n| query | 1x | 10x | ratio |")
    print("|---|---|---|---|")
    for name in names:
        r = results[name]
        ratio = r["10x"] / r["1x"] if r.get("1x") else float("nan")
        print(f"| {name} | {r['1x']:.2f}s | {r['10x']:.2f}s | {ratio:.1f}x |")


def smoke_kv(spark) -> None:
    """The five heaviest KV ops at N and 10N keys. The claims under
    test: bulk load / compact / full diff scale ~linearly; the BUCKETED
    DELTA MERGE is O(delta + affected-bucket bytes), so a small delta
    into a 10x table must stay far below 10x."""
    import tempfile

    from pyspark.sql import functions as F

    from pot_spark.kv.store import PotStore

    N_BUCKETS = 256
    DELTA = 64  # keys per delta commit — touches <= 64 of 256 buckets

    def one_scale(n_keys: int) -> dict[str, float]:
        root = tempfile.mkdtemp(prefix=f"kvsmoke_{n_keys}_")
        store = PotStore(spark, root)
        base = spark.range(n_keys).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.to_json(F.struct(F.col("id").alias("v"))).alias("doc"),
        )
        delta = spark.range(DELTA).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.to_json(F.struct((F.col("id") + 1).alias("v"))).alias("doc"),
        )
        out: dict[str, float] = {}
        t0 = time.perf_counter()
        store.create_df("plain", base)
        out["create_df_load"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.create_df_bucketed("bucketed", base, n_buckets=N_BUCKETS)
        out["bucketed_load"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.create_df_bucketed("bucketed", delta, n_buckets=N_BUCKETS)
        out["bucketed_delta"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.changes_df("bucketed", 1, 2).write.format("noop").mode(
            "overwrite"
        ).save()
        out["changes_df"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.compact("bucketed")
        out["compact"] = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
        return out

    one_scale(10_000)  # warmup: pay JVM/codegen costs outside the clock
    small = one_scale(1_000_000)
    big = one_scale(10_000_000)
    print("\n| kv op | 1x (1M keys) | 10x (10M keys) | ratio |")
    print("|---|---|---|---|")
    for op in small:
        print(
            f"| {op} | {small[op]:.2f}s | {big[op]:.2f}s "
            f"| {big[op] / small[op]:.1f}x |"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", action="store_true", help="KV-layer smoke only")
    ap.add_argument("--queries", default=None, help="comma-separated override")
    args = ap.parse_args()

    from pot_spark.session import get_spark

    spark = get_spark("scale_smoke", cpus="32")
    if args.kv:
        smoke_kv(spark)
        return 0
    if not os.path.isdir(os.path.join(DST, "lineitem.parquet")):
        print("building 10x fixture...", flush=True)
        build_fixture(spark)
    names = args.queries.split(",") if args.queries else HEAVY
    smoke_queries(spark, names)
    return 0


if __name__ == "__main__":
    sys.exit(main())
