"""Corpus-health AUDIT board: one pass over a corpus directory that
prints the round-7/8 audit-family signals a data-engineering oncall
actually reads before green-lighting a training run:

    distribution   q_token_entropy / q_zipf_fit / q_heaps_fit
                   (diversity, Zipf slope, vocabulary growth exponent)
    inequality     q_gini / q_theil_index / q_length_bias
                   (token-mass concentration, dedup length shift)
    drift          q_js_divergence / q_term_drift / q_ks_test
                   (which source moved, which tokens moved)
    duplication    q_dup_cluster_hist / q_dedup_funnel stages /
                   q_dup_graph_degree (mirror problem vs boilerplate)
    integrity      q_split_leakage (eval contamination under the
                   shipped split rule)
    hygiene        q_char_class_profile (unstripped markup, log spew)
    sizing         q_vocab_coverage / q_context_fit (tokenizer budget,
                   context-window loss)

Run:  python examples/corpus_audit.py [sf_dir]

Each signal is a registered, oracle-checked query (SURVEY.md §2-B-2) —
this example only composes and formats them. Everything is scan-side or
type-scale (see SCALE.md); the board costs a handful of corpus passes
at any scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pot_spark import registry
from pot_spark.session import get_spark


def _show(spark, sf_dir: str, name: str, limit: int = 8) -> None:
    print(f"\n== {name} ==")
    registry.QUERIES[name](spark, sf_dir).show(limit, truncate=False)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all_query_modules()
    spark = get_spark("corpus_audit")

    print(f"corpus audit over {sf_dir}")
    for name in (
        # distribution
        "q_token_entropy",
        "q_zipf_fit",
        "q_heaps_fit",
        # inequality
        "q_gini",
        "q_theil_index",
        "q_length_bias",
        # drift
        "q_js_divergence",
        "q_term_drift",
        # duplication
        "q_dup_cluster_hist",
        "q_dup_graph_degree",
        # integrity + hygiene
        "q_split_leakage",
        "q_char_class_profile",
        # sizing
        "q_vocab_coverage",
        "q_context_fit",
    ):
        _show(spark, sf_dir, name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
