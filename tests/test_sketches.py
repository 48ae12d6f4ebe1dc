"""HLL sketch accuracy: rows-only queries still need a correctness story
— the estimates must land within HLL's error bound of the exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pot_spark import registry
from pot_spark.tables import load

registry.load_all_query_modules()


def test_hll_estimates_within_error_bound(spark, sf_dir):
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
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 0.05, (k, e, exact[k])


def test_approx_percentile_within_error_bound(spark, sf_dir):
    approx = {
        r.o_orderpriority: (r.ap50_price, r.ap90_price)
        for r in registry.QUERIES["q_approx_percentile"](spark, sf_dir).collect()
    }
    vals = {}
    for r in load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect():
        vals.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    assert set(approx) == set(vals)
    for k, (a50, a90) in approx.items():
        v = sorted(vals[k])
        # the estimate is an actual element whose RANK must sit within
        # 1% (accuracy=10000 guarantees 1/accuracy; small-group
        # discreteness makes value-distance the wrong metric)
        for a, q in ((a50, 0.5), (a90, 0.9)):
            rank = sum(x <= a for x in v) / len(v)
            assert abs(rank - q) <= 0.01 + 1.0 / len(v), (k, q, a, rank)


def test_approx_count_distinct_within_error_bound(spark, sf_dir):
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
    assert set(est) == set(exact)
    # rsd=0.01 -> 1% relative standard deviation; 5% is > 4 sigma
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 0.05, (k, e, exact[k])


def test_approx_topk_exact_when_under_capacity(spark, sf_dir):
    """events has < 10k distinct users per type, so the approx_top_k
    sketch is in its exact regime: every (type, user, cnt) it returns
    must equal the exact count, and its top-5 must be a valid top-5."""
    got = registry.QUERIES["q_approx_topk"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    exact = {
        (r.event_type, r.user_id): r.n
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_type: dict[str, list[int]] = {}
    for r in ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n")).collect():
        per_type.setdefault(r.event_type, []).append(r.n)
    for r in got:
        assert exact[(r.event_type, r.user_id)] == r.cnt, r
        # cnt must be within the true top-5 count threshold for its type
        thresh = sorted(per_type[r.event_type], reverse=True)[4]
        assert r.cnt >= thresh, r


def test_ann_lsh_scores_exact_and_candidates_subset(spark, sf_dir):
    """q_sim_ann_lsh's accuracy story (hash-checked since round 9, but
    the approximation contract still needs its own pin): every returned
    cosine must EQUAL the brute-force cosine for that vector (the
    re-rank is exact — LSH only prunes candidates), and the ANN top-10
    candidates must each share a bucket with the probe (the pruning
    contract), recomputed here from the integer-quantized components."""
    ann = {
        r.vec_id: r.cos_sim
        for r in registry.QUERIES["q_sim_ann_lsh"](spark, sf_dir).collect()
    }
    # brute-force scores for ALL vectors (not just top-10): recompute
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("p")
    )
    dots = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with("v", "p", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / (
                    F.sqrt(
                        F.aggregate(
                            F.transform("v", lambda x: x * x),
                            F.lit(0.0),
                            lambda a, x: a + x,
                        )
                    )
                    * F.sqrt(
                        F.aggregate(
                            F.transform("p", lambda x: x * x),
                            F.lit(0.0),
                            lambda a, x: a + x,
                        )
                    )
                ),
                6,
            ).alias("cos"),
        )
    )
    all_exact = {r.vec_id: r.cos for r in dots.collect()}
    for vid, c in ann.items():
        assert abs(all_exact[vid] - c) < 1e-9, (vid, c, all_exact[vid])
    # the fixture embeddings are random (near-orthogonal), so there are
    # no planted neighbors and recall@k is not a meaningful bound; the
    # structural guarantee instead: every returned candidate shares at
    # least one LSH bucket with the probe
    from pot_spark.queries.llm_similarity import _N_TABLES, _N_BITS, _hyperplane

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def sig(v, t):
        import math

        # the op buckets floor(x*1000) int64 components, not raw floats
        iv = [math.floor(a * 1000) for a in v]
        out = 0
        for j in range(_N_BITS):
            plane = _hyperplane(t, j)
            if sum(a * b for a, b in zip(iv, plane)) >= 0:
                out |= 1 << j
        return out

    probe_sigs = [sig(vecs[0], t) for t in range(_N_TABLES)]
    for vid in ann:
        assert any(
            sig(vecs[vid], t) == probe_sigs[t] for t in range(_N_TABLES)
        ), f"vec {vid} returned without a bucket collision"


def test_error_bounds_artifact(spark, sf_dir):
    """The evidence artifact (ERROR_BOUNDS.json, tools/error_bounds.py)
    and these tests share ONE measurement implementation: every declared
    rows-only op must have a measure that passes its bound, covering the
    full ROWS_ONLY set so the artifact can never silently miss an op."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from error_bounds import measure_all, measure_extras

    from tests.test_registry import ROWS_ONLY

    entries = measure_all(spark, sf_dir)
    assert {e["op"] for e in entries} == ROWS_ONLY
    for e in entries:
        assert e["pass"], e
    # extra margin records (oracle-checked ops with statistical
    # contracts): the banded-tier recall floors must be measured-met
    extras = measure_extras(spark, sf_dir)
    assert {e["op"] for e in extras} == {"q_banded_recall_audit"}
    for e in extras:
        assert e["pass"], e


def test_bpe_train_merge_order_hand_computed():
    """Pair counts on the classic BPE example, by hand:
    es = 6 (newest) + 3 (widest) = 9  -> learned first
    est = 9 after the es merge       -> second
    lo = 5 (low) + 2 (lower) = 7     -> third
    low = 7 after the lo merge       -> fourth
    Ties would break lexicographically (asserted via the (-count, pair)
    key being a total order)."""
    from pot_spark.queries.text_index import _bpe_train

    merges = _bpe_train(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 4
    )
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_bpe_encode_hand_computed():
    from pot_spark.queries.text_index import _bpe_token_count, _bpe_train

    merges = _bpe_train(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 4
    )
    ranks = {p: i for i, p in enumerate(merges)}
    # newest -> n e w est -> 4 symbols; lowest -> low est -> 2;
    # unseen word: no pair applies -> one symbol per char
    assert _bpe_token_count("newest", merges, ranks) == 4
    assert _bpe_token_count("lowest", merges, ranks) == 2
    assert _bpe_token_count("xyz", merges, ranks) == 3
    assert _bpe_token_count("w", merges, ranks) == 1
    assert _bpe_token_count("", merges, ranks) == 0
    # merge-all-occurrences semantics: 'eses' -> es es -> 2 (not 3)
    assert _bpe_token_count("eses", merges, ranks) == 2


def test_bpe_encode_empty_vocab_degrades_to_chars():
    from pot_spark.queries.text_index import _bpe_token_count, _bpe_train

    merges = _bpe_train([], 4)
    assert merges == []
    assert _bpe_token_count("abc", merges, {}) == 3


# --- BPE property-based invariants (pure Python, no Spark) ---------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=8)
_corpus = st.lists(
    st.tuples(_word, st.integers(min_value=1, max_value=20)),
    min_size=0,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(corpus=_corpus, probe=_word)
def test_bpe_count_bounds_and_determinism(corpus, probe):
    from pot_spark.queries.text_index import _bpe_token_count, _bpe_train

    merges = _bpe_train(corpus, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    n = _bpe_token_count(probe, merges, ranks)
    assert 1 <= n <= len(probe)
    assert n == _bpe_token_count(probe, merges, ranks)  # deterministic
    # learned merges are distinct: a merged adjacency can never re-emerge
    assert len(merges) == len(set(merges))


@settings(max_examples=200, deadline=None)
@given(corpus=_corpus, probe=_word)
def test_bpe_more_merges_never_increase_tokens(corpus, probe):
    """Extending the merge list is monotone: the first k merges apply in
    the same order before any later one is reachable, and every merge
    application strictly reduces the symbol count."""
    from pot_spark.queries.text_index import _bpe_token_count, _bpe_train

    full = _bpe_train(corpus, 8)
    prev = len(probe)
    for k in range(len(full) + 1):
        merges = full[:k]
        ranks = {p: i for i, p in enumerate(merges)}
        n = _bpe_token_count(probe, merges, ranks)
        assert n <= prev
        prev = n
