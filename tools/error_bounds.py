#!/usr/bin/env python
"""Measured error-bound evidence for the rows-only (no-oracle) queries.

The registry entries declared rows-only (tests/test_registry.py
ROWS_ONLY): approximate sketches whose outputs can't hash-match a
deterministic SQL oracle. Their
correctness story lives in pytest error-bound tests — but the external
driver's CORRECTNESS_r*.json rows for them say only ``no_oracle``. This
tool turns the same measurements into a per-op JSON artifact
(ERROR_BOUNDS.json at the repo root) so those rows carry NUMBERS:

- q_hll_sketch / q_approx_cd: max relative error of the estimate vs the
  exact distinct count (bound: 5% ≈ >4σ at the configured precision);
- q_approx_percentile: max RANK error of the returned element vs the
  requested quantile (bound: 1/accuracy + one-element discreteness);
- q_approx_topk: exact-regime contract — every returned count equals
  the exact count and clears the true top-k threshold (bound: 0);

(The multimodal trio — features/resize/frames — measured here through
r9 graduated to hash-checked real-PNG DuckDB oracles in r10, so they
left the rows-only set; their correctness is now the driver's hash
gate, and the generic binary-payload extractor keeps its real-decode
pytest leg in tests/test_multimodal_real.py.)

The pytest suite cross-references this module (tests/test_sketches.py
imports ``measure_all`` and asserts every entry passes), so the artifact
and the tests can never drift apart.

Usage: python tools/error_bounds.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _rel_err_entry(name, est, exact, bound):
    errs = {k: abs(est[k] - exact[k]) / exact[k] for k in exact}
    worst = max(errs, key=errs.get)
    return {
        "op": name,
        "metric": "max_relative_error_vs_exact_distinct",
        "value": round(errs[worst], 6),
        "bound": bound,
        "groups": len(exact),
        "worst_group": str(worst),
        "pass": errs[worst] < bound,
    }


def measure_hll(spark, sf_dir):
    from pot_spark import registry
    from pot_spark.tables import load

    est = {
        r.o_orderpriority: r.approx_customers
        for r in registry.QUERIES["q_hll_sketch"](spark, sf_dir).collect()
    }
    orders = load(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["__all__"] = orders.select("o_custkey").distinct().count()
    return _rel_err_entry("q_hll_sketch", est, exact, 0.05)


def measure_approx_cd(spark, sf_dir):
    from pot_spark import registry
    from pot_spark.tables import load

    est = {
        r.l_returnflag: r.approx_parts
        for r in registry.QUERIES["q_approx_cd"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    return _rel_err_entry("q_approx_cd", est, exact, 0.05)


def measure_approx_percentile(spark, sf_dir):
    from pot_spark import registry
    from pot_spark.tables import load

    approx = {
        r.o_orderpriority: (r.ap50_price, r.ap90_price)
        for r in registry.QUERIES["q_approx_percentile"](spark, sf_dir).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in (
        load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").collect()
    ):
        vals.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    worst, worst_info, bound_used = -1.0, None, 0.0
    for k, (a50, a90) in approx.items():
        v = sorted(vals[k])
        for a, q in ((a50, 0.5), (a90, 0.9)):
            rank = sum(x <= a for x in v) / len(v)
            err = abs(rank - q)
            bound = 0.01 + 1.0 / len(v)
            if err > worst:
                worst, worst_info, bound_used = err, (str(k), q), bound
    return {
        "op": "q_approx_percentile",
        "metric": "max_rank_error_of_returned_element",
        "value": round(worst, 6),
        "bound": round(bound_used, 6),
        "groups": len(approx),
        "worst_group": f"{worst_info[0]}@q{worst_info[1]}",
        "pass": worst <= bound_used,
    }


def measure_approx_topk(spark, sf_dir):
    from pot_spark import registry
    from pot_spark.tables import load

    got = registry.QUERIES["q_approx_topk"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    exact_rows = (
        ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n")).collect()
    )
    exact = {(r.event_type, r.user_id): r.n for r in exact_rows}
    per_type: dict[str, list[int]] = {}
    for r in exact_rows:
        per_type.setdefault(r.event_type, []).append(r.n)
    count_mismatches = sum(
        1 for r in got if exact[(r.event_type, r.user_id)] != r.cnt
    )
    below_threshold = sum(
        1
        for r in got
        if r.cnt < sorted(per_type[r.event_type], reverse=True)[4]
    )
    return {
        "op": "q_approx_topk",
        "metric": "exact_regime_count_mismatches+below_top5_threshold",
        "value": count_mismatches + below_threshold,
        "bound": 0,
        "rows": len(got),
        "pass": count_mismatches == 0 and below_threshold == 0,
    }


def measure_bpe_encode(spark, sf_dir):
    """q_bpe_encode: exact row-for-row equality against an independent
    pure-pandas re-computation (same train/apply helpers, none of the
    Spark plumbing — the helpers themselves are anchored by
    hand-computed micro examples in tests/test_sketches.py)."""
    import os

    import pyarrow.parquet as pq

    from pot_spark import registry
    from pot_spark.queries.text_index import (
        _BPE_TOP_WORDS,
        _bpe_token_count,
        _bpe_train,
    )

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in registry.QUERIES["q_bpe_encode"](spark, sf_dir).collect()
    }
    pdf = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    freqs: dict[str, int] = {}
    for text in pdf["text"]:
        if text is None:
            continue
        for w in text.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP_WORDS]
    merges = _bpe_train(top)
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}
    mismatches = 0
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if text is None:
            exp = (0, 0)
        else:
            ws = [w for w in text.split(" ") if w]
            tot = 0
            for w in ws:
                if w not in cache:
                    cache[w] = _bpe_token_count(w, merges, ranks)
                tot += cache[w]
            exp = (len(ws), tot)
        if got.get(doc_id) != exp:
            mismatches += 1
    return {
        "op": "q_bpe_encode",
        "metric": "exact_row_mismatches_vs_pandas_reference",
        "value": mismatches,
        "bound": 0,
        "rows": len(got),
        "pass": mismatches == 0 and len(got) == len(pdf),
    }


def measure_banded_recall(spark, sf_dir):
    """q_banded_recall_audit: MEASURED recall of the banded candidate
    tier's two contracts on the dense (contiguous-id) corpus slice —
    the r13 margin record backing the analytic 0.95/0.995 S-curve pins
    (the query itself is hash-checked against DuckDB; this entry
    records the margin the way the sketch bounds are recorded). NOT a
    rows-only op — listed under extra_measures, not entries."""
    from pot_spark import registry

    rows = {
        r.contract: r
        for r in registry.QUERIES["q_banded_recall_audit"](
            spark, sf_dir
        ).collect()
    }
    worst = min(
        rows.values(), key=lambda r: (r.recall_ppm or 0) - r.contract_floor_ppm
    )
    return {
        "op": "q_banded_recall_audit",
        "metric": "min_measured_recall_ppm_minus_contract_floor",
        "value": (worst.recall_ppm or 0) - worst.contract_floor_ppm,
        "bound": 0,
        "contracts": {
            k: {
                "n_truth": r.n_truth,
                "n_hits": r.n_hits,
                "recall_ppm": r.recall_ppm,
                "floor_ppm": r.contract_floor_ppm,
            }
            for k, r in rows.items()
        },
        "pass": all(
            (r.recall_ppm or 0) >= r.contract_floor_ppm and r.n_truth > 0
            for r in rows.values()
        ),
    }


MEASURES = [
    measure_hll,
    measure_approx_cd,
    measure_approx_percentile,
    measure_approx_topk,
    measure_bpe_encode,
]

# measured-margin records for ops that ARE oracle-checked but carry an
# additional statistical contract (recall floors) — kept out of MEASURES
# so the entries<->ROWS_ONLY bijection stays exact
EXTRA_MEASURES = [measure_banded_recall]


def measure_all(spark, sf_dir) -> list[dict]:
    from pot_spark import registry

    registry.load_all_query_modules()
    return [m(spark, sf_dir) for m in MEASURES]


def measure_extras(spark, sf_dir) -> list[dict]:
    from pot_spark import registry

    registry.load_all_query_modules()
    return [m(spark, sf_dir) for m in EXTRA_MEASURES]


def main() -> None:
    from pot_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "ERROR_BOUNDS.json")
    )
    spark = get_spark("error_bounds")
    entries = measure_all(spark, sf_dir)
    extras = measure_extras(spark, sf_dir)
    doc = {
        "note": (
            "Measured accuracy evidence for the declared rows-only ops "
            "(no-oracle CORRECTNESS rows). Regenerate with "
            "tools/error_bounds.py; pytest cross-checks every entry "
            "passes (tests/test_sketches.py::test_error_bounds_artifact). "
            "extra_measures: measured statistical margins for ops that "
            "ARE oracle-checked but also carry a recall/error contract."
        ),
        "sf_dir": sf_dir,
        "entries": entries,
        "extra_measures": extras,
        "all_pass": all(e["pass"] for e in entries + extras),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, default=str)
        f.write("\n")
    for e in entries + extras:
        print(f"{'PASS' if e['pass'] else 'FAIL'} {e['op']}: {e['metric']} = "
              f"{e['value']} (bound {e['bound']})")
    print(f"wrote {out}")
    if not doc["all_pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
