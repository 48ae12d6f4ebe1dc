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
