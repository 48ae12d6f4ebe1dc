#!/usr/bin/env python
"""Production-k SemDeDup/D4 smoke: grow N and k TOGETHER (the paper's
k ∝ N operating point) and measure that per-cell pair volume stays flat
and wall-clock stays ~linear — closing the inferential step in the
100 TB argument that the fixed-k 10x smoke (tools/scale_smoke.py) leaves
open (that smoke deliberately holds k=4 so cells grow 10x and the pair
join absorbs a ~100x blowup; this one holds cell size constant).

Monkeypatches llm_similarity._KM_K (the module reads it at call time);
correctness is NOT the point here (the oracle pins k=4), wall-clock and
pair-volume shape are.

Usage: python tools/prodk_smoke.py

Results feed SCALE.md's 10x-smoke table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import DST, SRC, build_fixture  # noqa: E402


def _cells(spark, sf_dir, mod):
    """Cell-size profile of the Lloyd assignment at the current k."""
    from pyspark.sql import functions as F

    _iv, assign = mod._km_exact_parts(spark, sf_dir)
    sizes = assign.groupBy("cluster").agg(F.count("*").alias("n"))
    row = sizes.agg(
        F.count("*").alias("k_used"),
        F.max("n").alias("max_cell"),
        F.avg("n").alias("avg_cell"),
        F.sum(F.expr("n * (n - 1) DIV 2")).alias("pairs"),
    ).collect()[0]
    return row


def _run(spark, mod, sf_dir, k):
    mod._KM_K = k
    # warm the JVM/codegen on a throwaway materialization first
    mod.q_semdedup(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    mod.q_semdedup(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.time() - t0
    prof = _cells(spark, sf_dir, mod)
    return dt, prof


def main() -> None:
    import argparse

    from pot_spark.queries import llm_similarity as mod
    from pot_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--fixture",
        default=DST,
        help=(
            "10x fixture dir (default: the shifted-union /tmp/sf1_synth;"
            " pass /tmp/sf1_true for the distribution-true gen_sf fixture"
            " — VERDICT r11 item 4's fixture-k vs production-k closure)"
        ),
    )
    ap.add_argument(
        "--lo-fixture",
        default=SRC,
        help="baseline fixture dir (default: driver sf0.1)",
    )
    ap.add_argument("--lo-k", type=int, default=4)
    ap.add_argument("--hi-k", type=int, default=40)
    args = ap.parse_args()
    spark = get_spark("prodk_smoke")
    dst = args.fixture
    if dst == DST and not os.path.isdir(DST):
        build_fixture(spark)
    if not os.path.isdir(dst):
        print(f"fixture missing: {dst} (run tools/gen_sf.py first)")
        sys.exit(2)
    k0 = mod._KM_K
    try:
        t1, p1 = _run(spark, mod, args.lo_fixture, args.lo_k)
        t10, p10 = _run(spark, mod, dst, args.hi_k)
    finally:
        mod._KM_K = k0
    print(f"\nfixtures: {args.lo_fixture} (k={args.lo_k}) vs {dst} (k={args.hi_k})")
    print("| config | k | avg cell | max cell | within-cell pairs | sec |")
    print("|---|---|---|---|---|---|")
    print(
        f"| lo | {args.lo_k} | {p1.avg_cell:.0f} | {p1.max_cell} |"
        f" {p1.pairs} | {t1:.2f} |"
    )
    print(
        f"| hi | {args.hi_k} | {p10.avg_cell:.0f} | {p10.max_cell} |"
        f" {p10.pairs} | {t10:.2f} |"
    )
    print(
        f"wall ratio {t10 / t1:.1f}x, pair ratio {p10.pairs / max(1, p1.pairs):.1f}x,"
        f" avg-cell ratio {p10.avg_cell / p1.avg_cell:.2f}x"
    )


if __name__ == "__main__":
    main()
