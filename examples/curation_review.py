"""Curation-review board: the round-7 audit family composed into the
one-page report a data team reads before shipping a corpus build.

    1. plan     q_dedup_cost_plan  — price each dedup strategy from the
                measured df profile BEFORE running anything
    2. funnel   q_dedup_funnel     — what exact + near-dup actually buy,
                in docs AND tokens
    3. bias     q_length_bias      — did dedup shift the length
                distribution the model will train on?
    4. overlap  q_vocab_overlap    — which sources are mirrors of each
                other (containment ~ 10^6 = same feed twice)
    5. novelty  q_ngram_novelty    — which sources still contribute new
                content gram-by-gram
    6. health   q_zipf_fit / q_gini / q_distinct_ngrams — distribution-
                level corpus health per language/source
    7. drift    q_ks_test / q_centroid_drift / q_cusum_drift — length-
                CDF, embedding-space, and event-volume drift alarms
    8. sizing   q_context_fit      — pick the context length

Run:  python examples/curation_review.py [sf_dir]

Every stage is a registered, DuckDB-oracle-checked query; this script
only sequences and prints them. At 100 TB each stage's shuffle posture
is argued per-operator in SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pot_spark import registry
from pot_spark.session import get_spark


SECTIONS = [
    ("dedup strategy pricing", "q_dedup_cost_plan", None),
    ("dedup funnel (docs + tokens)", "q_dedup_funnel", "stage_ord"),
    ("length-bias by decile", "q_length_bias", "decile"),
    ("source vocabulary overlap (top containment)", "q_vocab_overlap", None),
    ("n-gram novelty by source", "q_ngram_novelty", "source"),
    ("Zipf exponent by language", "q_zipf_fit", "lang"),
    ("doc-length Gini by language", "q_gini", "lang"),
    ("length-CDF drift (KS) by source", "q_ks_test", None),
    ("embedding centroid drift by label", "q_centroid_drift", "label"),
    ("event-volume changepoints", "q_cusum_drift", "event_type"),
    ("context-length sizing", "q_context_fit", "context_len"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_review")
    registry.load_all_query_modules()
    for title, name, order in SECTIONS:
        df = registry.QUERIES[name](spark, sf_dir)
        if name == "q_vocab_overlap":
            df = df.orderBy(df.containment_ppm.desc()).limit(5)
        elif name == "q_ks_test":
            df = df.orderBy(df.ks_ppm.desc()).limit(5)
        elif order is not None:
            df = df.orderBy(order)
        print(f"\n== {title} ({name}) ==")
        df.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
