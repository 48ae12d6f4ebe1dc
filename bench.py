#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are fully materialized through the noop sink (measures the whole
plan incl. shuffle/exchange, excludes driver-side row transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pot_spark import registry
from pot_spark.session import get_spark

HEADLINE = [
    "q_multiway_join",
    "q_groupby_agg",
    "q_hash_join",
    "q_broadcast_join",
    "q_window_rank",
    "q_sort_limit",
    "q_asof_join",
    "q_theta_range_join",
    "q_dedup_near",
    "q_sim_topk",
    "s_session",
    "s_sliding",
    "q_text_stats",
    "u_udtf",
    "q_bucket_join",
    "q_skew_salt_join",
    "q_sim_ivf",
    "q_ts_rollup",
    "q_corpus_select",
    "q_sim_topk_batch",
    "q_contamination",
    "q_chunk_dedup",
    "q_funnel",
    "q_retention",
    "q_full_outer_join",
    "q_dpp_join",
    "q_unigram_logprob",
    "q_seq_pack",
    "q_ts_interp",
    "q_bm25",
    "q_temporal_join",
    "q_zorder_key",
    "q_embed_quantize",
    # round-3 additions (no BENCH_r02 baseline row; diffed once recorded)
    "q_sql_q5",
    "q_containment_dedup",
    "q_bpe_pair_counts",
    "q_ann_pq",
    "q_kmeans",
    "q_merge_upsert",
    "q_interval_union",
    "q_triangle_count",
    "q_bigram_lm",
    "q_bloom_decontaminate",
    "q_prefix_filter_join",
    "q_twap",
    "q_event_transitions",
    "q_sql_q1",
    "q_sql_q8",
    "q_boilerplate_ngrams",
    "q_window_median",
    "q_window_ewma",
    "q_winsorize",
    # round-4 addition: the de-globalized ntile/dense_rank (banded rank
    # + broadcast offsets) — tracked so a regression back to a global
    # window shows up as a timing cliff, not just a plan-test failure
    "q_window_ntile_dense",
    # round-6 additions: the four new TPC-H queries — tracked so a
    # decorrelation or broadcast regression (the shapes their plan tests
    # pin) also shows up as a timing cliff
    "q_sql_q4",
    "q_sql_q12",
    "q_sql_q19",
    "q_sql_q21",
    # round-6 additions: event-stream + pipeline ops whose single-shuffle
    # / WindowGroupLimit plans are pinned in test_plans.py — tracked so a
    # re-shuffle regression shows up as a timing cliff
    "q_sessionize",
    "q_attribution",
    "q_incremental_dedup",
    "q_rank_fusion",
    "q_lsh_tuning",
    "q_dedup_audit",
    "q_feature_hash",
    "q_embedding_audit",
    "q_dedup_rate_by_source",
    "q_quality_gate_report",
    "q_bpe_encode",
    # round-6 (cont.): the five partsupp TPC-H queries (derived-partsupp
    # CTE) — tracked so a decorrelation / narrow-derivation regression
    # shows up as a timing cliff
    "q_sql_q2",
    "q_sql_q9",
    "q_sql_q11",
    "q_sql_q16",
    "q_sql_q20",
    # round-6 (cont.): corpus-quality ops — the perplexity gate is the
    # heaviest new text op (two token-scale shuffles + histogram window)
    "q_perplexity_filter",
    "q_distinct_ngrams",
    # round-6 (cont. 2): winnowing fingerprints (per-doc window + fp joins)
    # and CDC log compaction (the max(struct) partial-agg plan)
    "q_winnow_fingerprint",
    "q_winnow_pairs",
    "q_cdc_compact",
    # round-6 (cont. 3): rolling-distinct (bounded explode) and the
    # sample-bounded ANN recall eval (broadcast probes + window heaps)
    "q_rolling_dau",
    "q_ann_recall",
    "q_mmr_select",
    # round-6 (cont. 4): the published-selection pair (SemDeDup shares the
    # kmeans plan; DSIR is two token-scale shuffles + a lambda join), the
    # quality/dedup text ops (Gopher rules is the scan-side rule battery;
    # ExactSubstr + span merge are the digest rollup family), and the
    # eval/layout/privacy/drift ops — all plan-pinned in test_plans.py
    "q_semdedup",
    "q_dsir_select",
    "q_gopher_rules",
    "q_exact_substring",
    "q_dup_spans",
    "q_cluster_purity",
    "q_zorder_skipping",
    "q_ndcg_eval",
    "q_k_anonymity",
    "q_chi2_independence",
    # round-6 (cont. 5): the real-stream OHLC twin (stateful min_by/max_by
    # window state), the KN LM (type-scale model tables), the JL audit
    # (broadcast sign matrix), and the D4 / soft-dedup selection pair
    "s_ohlc_stream",
    "q_kneser_ney",
    "q_random_projection",
    "q_d4_select",
    "q_soft_dedup",
    # round-7 additions: the dedup funnel (composes exact + near-dup +
    # clustering — the heaviest new op), the corpus-growth/overlap
    # audits (distinct-gram and tok-keyed join shapes), the per-lang
    # window ops (ntile tertiles / decile tiling), and the drift audit
    # (decimal-exact centroid sums) — plan-pinned in test_plans.py
    "q_dedup_funnel",
    "q_ngram_novelty",
    "q_ccnet_bins",
    "q_zipf_fit",
    "q_affix_dup",
    "q_vocab_overlap",
    "q_centroid_drift",
    "q_length_bias",
    # round-7 (cont.): the one-verify-pass threshold sweep (the
    # heaviest new op — a second banding join sneaking in shows up as a
    # timing cliff), the compressed-relation time-series pair, and the
    # stateful quota's batch twin
    "q_dedup_threshold_sweep",
    "q_acf",
    "q_peak_concurrency",
    "s_user_quota",
    # round-8 additions: the histogram-rewritten gini (tracked so a
    # regression back to the doc-scale rank window shows as a cliff),
    # the three-explode width sweep (heaviest new op), the banded
    # candidate-graph histogram, the no-pairs diversity identity, and
    # the token-pass Heaps fit
    "q_gini",
    "q_shingle_size_sweep",
    "q_dup_graph_degree",
    "q_intra_label_diversity",
    "q_heaps_fit",
]


def _rotation_cohort(here: str, all_names: list[str]) -> tuple[list[str], int]:
    """Non-headline coverage rotation (VERDICT r7 item 5): the queries
    outside HEADLINE are split into two deterministic cohorts (sorted
    name order, alternating), and each driver round benches one cohort —
    so EVERY registered query gets a measured sf0.1 row at most 2 rounds
    old, without doubling the per-round bench budget. The upcoming round
    number is inferred from the highest driver-recorded BENCH_r{N}.json
    at the repo root (the driver writes one per completed round);
    its parity picks the cohort. Headline stays the 2x-gate tier;
    rotation rows are coverage evidence, recorded in BENCH_LOCAL.json
    and diffed against any baseline row they have."""
    import glob
    import re

    rest = sorted(n for n in all_names if n not in HEADLINE)
    rounds = []
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(f))
        if m:
            rounds.append(int(m.group(1)))
    upcoming = (max(rounds) + 1) if rounds else 0
    parity = upcoming % 2
    return [q for i, q in enumerate(rest) if i % 2 == parity], upcoming


def _calibrate() -> float:
    """Fixed single-threaded CPU workload (~200 MB of md5): a rig-health
    probe. On an unloaded host this takes a stable wall time; under CPU
    steal it inflates proportionally. Recording it pre and post lets a
    reader attribute a uniformly-slower bench to ambient contention
    (every query AND the calibration moved together) vs a plan
    regression (queries moved, calibration did not) — the round-4
    drift question, made measurable."""
    import hashlib

    t0 = time.perf_counter()
    block = b"x" * 1024
    for _ in range(200_000):
        block = hashlib.md5(block).digest() + block[:1008]
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_query_modules()
    calib_pre = _calibrate()
    spark = get_spark("pot_spark_bench")
    # warm the JVM/codegen and parquet-reader paths so timings measure the
    # queries, not session startup or first-footer parsing
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pot_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        try:
            # full scan+decode (count() alone is metadata-only on parquet):
            # primes the OS page cache and column decoders so timed queries
            # measure plan execution, not first-touch file I/O
            load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - warm-up must never kill the bench
            print(f"warmup {t}: {type(e).__name__}: {e}", file=sys.stderr)
    # bucketed layout is an ingest-time build (bucket once, join
    # shuffle-free forever) — materialize it outside the timed section
    from pot_spark.queries.bucketing import ensure_bucketed_tables

    ensure_bucketed_tables(spark, sf_dir)
    # the DPP query's partitioned layout is likewise an ingest-time build:
    # constructing the query once materializes it (guarded by _SUCCESS)
    registry.QUERIES["q_dpp_join"](spark, sf_dir)

    # JIT/codegen warm-up on the tiny sf0.001 fixtures: compiles the
    # join/agg/window operator paths once so timings measure the queries,
    # not first-use JVM compilation (~2s on the first join otherwise)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        # u_udf_scalar also forks the Python/Arrow worker pool once, so
        # Pandas-UDF queries don't pay worker startup in the timed section
        for wq in (
            "s_tumbling_stream",  # the session's FIRST streaming query
            #  pays the JVM streaming-machinery init (~3-5s) — run one
            #  tiny real stream here so the s_*_stream tiers measure
            #  their plans, not cold start (the r10 closing-run
            #  s_ohlc_stream 2.3x flag, BENCH_NOTES.md)
            "s_ohlc_stream",  # r12: the tumbling warmup does not cover
            #  the stateful min_by/max_by window-agg path — ohlc's own
            #  first rep still measured ~1.8s over steady state; warming
            #  the exact plan shape tightens its best-of-3
            "q_multiway_join",
            "q_groupby_agg",
            "q_window_rank",
            "u_udf_scalar",
            "q_dedup_near",  # JITs the shingle/banding codegen stages
            "q_sim_ivf",
            "q_contamination",  # JITs the gram-explode/broadcast stages
            "q_chunk_dedup",
            "q_funnel",
            "q_dpp_join",  # compiles the DPP subquery machinery
        ):
            try:
                registry.QUERIES[wq](spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                print(f"warmup {wq}: {type(e).__name__}: {e}", file=sys.stderr)

    # per-query isolation: one broken query records an error entry and the
    # rest of the bench still produces numbers (never a whole-run crash).
    # best-of-N reps per query: single-shot timings on a shared VM carry
    # 30-50% CPU-steal noise, and this number is the recorded baseline that
    # later rounds are held within 2x of — the minimum is the stable
    # estimator of actual plan cost
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # SPARK_GRAFT_BENCH_ONLY=q_a,q_b: targeted protocol run over exactly
    # the named queries (baseline fill recording — tools/freeze_baseline
    # median-groups several such runs); rotation is skipped so the run
    # measures only what it was asked to
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    tier = [q for q in only_env.split(",") if q] if only_env else HEADLINE
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in tier:
        fn = registry.QUERIES.get(name)
        if fn is None:
            errors[name] = "unknown query name"
            continue
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # caches a query populates (e.g. persisted LSH band pairs) must
            # not leak into its next rep or into later queries' timings —
            # every rep pays the query's full cost
            spark.catalog.clearCache()
        if best is not None and name not in errors:
            timings[name] = round(best, 3)

    # rotation tier: half the non-headline inventory per round (see
    # _rotation_cohort) — fewer reps (these are coverage rows, not the
    # 2x gate; the headline tier keeps best-of-3)
    here_early = os.path.dirname(os.path.abspath(__file__))
    rotation: dict[str, float] = {}
    rotation_errors: dict[str, str] = {}
    cohort_parity = -1
    if not only_env and os.environ.get("SPARK_GRAFT_BENCH_ROTATION", "1") != "0":
        cohort, upcoming = _rotation_cohort(here_early, list(registry.QUERIES))
        cohort_parity = upcoming % 2
        rot_reps = max(1, reps - 1)
        for name in cohort:
            fn = registry.QUERIES[name]
            best = None
            for _ in range(rot_reps):
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # noqa: BLE001
                    rotation_errors[name] = (
                        f"{type(e).__name__}: {str(e)[:200]}"
                    )
                    break
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            if best is not None and name not in rotation_errors:
                rotation[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # diff against the recorded baseline: BENCH_BASELINE.json is the
    # consolidated 2x-gate reference (BENCH_r02 rows verbatim + the
    # earliest later round for queries r02 never covered — see
    # tools/freeze_baseline.py), so EVERY headline query has a ratio and
    # the regression detector has teeth for all 53. Per-query deltas go
    # to stderr, queries >2x slower than their baseline are listed in
    # the JSON so a regression fails loudly instead of hiding in the
    # total. Falls back to BENCH_r02.json if the consolidated file is
    # absent.
    regressions: dict[str, str] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    base = {}
    for base_name in ("BENCH_BASELINE.json", "BENCH_r02.json"):
        try:
            with open(os.path.join(here, base_name)) as f:
                raw = json.load(f)
            # the driver wraps the bench line as {"parsed": {...}}; a raw
            # bench.py output has "queries" at the top level
            base = (raw.get("parsed") or raw).get("queries", {})
            break
        except Exception:  # noqa: BLE001 - no baseline -> nothing to diff
            continue
    ratios: dict[str, float] = {}
    for name, t in sorted(timings.items()):
        b = base.get(name)
        if not b:
            print(f"bench diff: {name} {t:.3f}s (no baseline)", file=sys.stderr)
            continue
        ratios[name] = t / b
        print(
            f"bench diff: {name} {t:.3f}s vs baseline {b:.3f}s ({ratios[name]:.2f}x)",
            file=sys.stderr,
        )
    # a shared VM drifts uniformly (CPU steal): a run where EVERY query is
    # 1.4x the recording is ambient, not a plan regression. Flag queries
    # >2x after normalizing by the median ratio (floored at 1 so a faster
    # machine never hides a true regression).
    if ratios:
        vals = sorted(ratios.values())
        mid = len(vals) // 2
        # true median (average the two middles on even counts): the
        # upper-middle alone biases the gate upward and hides regressions
        med = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
    else:
        med = 1.0
    threshold = 2.0 * max(1.0, med)
    for name, ratio in ratios.items():
        if ratio > threshold:
            regressions[name] = (
                f"{timings[name]:.3f}s vs {base[name]:.3f}s ({ratio:.2f}x, "
                f"median {med:.2f}x)"
            )
    if regressions:
        print(f"bench REGRESSIONS >2x-of-median: {regressions}", file=sys.stderr)

    payload = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "regressions": regressions,
        "median_vs_baseline": round(med, 3),
        # sum over only the queries present in the recorded
        # baseline, so totals stay comparable as the headline
        # list grows across rounds
        "baseline_comparable_total": round(
            sum(t for n, t in timings.items() if n in base), 3
        ),
        # rig-health probe (see _calibrate): compare across
        # rounds to separate ambient CPU steal from plan changes
        "calib_sec_pre": calib_pre,
        "calib_sec_post": _calibrate(),
        "sf": sf_val,
        # coverage-rotation tier (half the non-headline inventory per
        # round — every registered query measured within 2 rounds)
        "rotation_queries": rotation,
        "rotation_errors": rotation_errors,
        "rotation_cohort": cohort_parity,
        "rotation_total_sec": round(sum(rotation.values()), 3),
    }
    # full per-query record goes to a file; the driver's tail capture is
    # 2 KB, which the ~90-entry queries dict overflows (round 6 recorded
    # parsed: null) — so the FINAL printed line is a compact summary
    # with only the slowest queries, flagged as truncated
    local_out = os.environ.get("SPARK_GRAFT_BENCH_LOCAL_OUT", "BENCH_LOCAL.json")
    with open(os.path.join(here, local_out), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:12]
    )
    compact = dict(
        payload,
        queries={k: round(v, 3) for k, v in sorted(slowest.items())},
        queries_truncated=len(timings) > len(slowest),
        n_queries=len(timings),
        full_record="BENCH_LOCAL.json",
        # the full rotation dict lives in BENCH_LOCAL.json only — the
        # driver's 2 KB tail capture cannot hold ~90 more entries
        rotation_queries={},
        rotation_errors={},
        n_rotation=len(rotation),
    )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
