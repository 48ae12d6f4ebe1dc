#!/usr/bin/env python
"""Full local parity sweep: run EVERY registered query against its DuckDB
oracle at sf0.01 and record one JSON file (PARITY_r{N}.json at the repo
root) with per-query ok/rows/errors.

The external driver's correctness gate samples only the first 50 registry
entries per round; this sweep is the complementary full-inventory record,
so every query — sampled by the driver or not — has per-round correctness
evidence in the repo.

Usage: python tools/parity_sweep.py [round_tag] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pot_spark.oracle import run_all
from pot_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("parity_sweep")
    results = run_all(spark, sf_dir)
    out = {
        r.name: {
            "ok": r.ok,
            "spark_rows": r.spark_rows,
            "oracle_rows": r.oracle_rows,
            "errors": r.errors,
        }
        for r in results
    }
    n_bad = sum(1 for v in out.values() if not v["ok"])
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_{tag}.json",
    )
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(out), "n_fail": n_bad, "queries": out},
            f,
            indent=1,
            sort_keys=True,
        )
    for r in results:
        if not r.ok:
            print(r)
    print(f"{len(out)} queries, {n_bad} failures -> {path}")
    # a failing sweep must fail the invoking shell/CI step, not just
    # record n_fail in the JSON (driver_sim.py has the same contract)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
