"""Semantic contracts for the merge/graph/interval operators and the
stream-static join: each checked against an independent brute-force
recomputation (or the batch twin) on the sf0.001 fixtures."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pot_spark import registry
from pot_spark.tables import load

registry.load_all_query_modules()


def test_interval_union_matches_bruteforce(spark, sf_dir):
    got = {
        r.user_id: (r.n_islands, r.covered_sec)
        for r in registry.QUERIES["q_interval_union"](spark, sf_dir).collect()
    }
    per_user = defaultdict(list)
    for r in load(spark, sf_dir, "events").select("user_id", "ts").collect():
        s = int(r.ts.timestamp())
        per_user[r.user_id].append((s, s + 600))
    want = {}
    for uid, ivs in per_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        want[uid] = (len(islands), sum(e - s for s, e in islands))
    assert got == want


def test_merge_upsert_action_accounting(spark, sf_dir):
    rows = {r.action: r for r in registry.QUERIES["q_merge_upsert"](spark, sf_dir).collect()}
    base = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").collect()
    n_upd = sum(1 for r in base if r.o_orderkey % 10 == 0)
    n_del = sum(1 for r in base if r.o_orderkey % 10 == 1)
    n_ins = sum(1 for r in base if r.o_orderkey % 10 == 2)
    assert rows["update"].n_rows == n_upd
    assert rows["delete"].n_rows == n_del
    assert rows["insert"].n_rows == n_ins
    assert rows["unchanged"].n_rows == len(base) - n_upd - n_del
    # updated rows gained exactly +1000 each vs their base sum
    base_upd_sum = round(
        sum(r.o_totalprice for r in base if r.o_orderkey % 10 == 0), 2
    )
    assert abs(rows["update"].sum_price - (base_upd_sum + 1000 * n_upd)) < 0.01


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    pairs = registry.QUERIES["q_dedup_near"](spark, sf_dir).collect()
    edges = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in pairs
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    n_tri = sum(
        1
        for a, b in edges
        for c in adj[b]
        if c in adj[a]
    )
    got = registry.QUERIES["q_triangle_count"](spark, sf_dir).collect()[0]
    assert got.n_triangles == n_tri
    assert got.n_edges == len(edges)
    assert got.n_nodes == len({v for e in edges for v in e})
    # the duplicate graph on this fixture is non-trivial
    assert got.n_edges > 0


def test_stream_static_join_equals_batch(spark, sf_dir):
    streamed = registry.QUERIES["s_static_join_stream"](spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        ev.join(dim, "user_id")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "c_mktsegment",
            "n",
            "sum_value",
        )
    )
    key = ["window_start", "window_end", "c_mktsegment"]
    s_rows = sorted(
        streamed.collect(), key=lambda r: (r.window_start, r.c_mktsegment)
    )
    b_rows = sorted(batch.collect(), key=lambda r: (r.window_start, r.c_mktsegment))
    assert [tuple(r) for r in s_rows] == [tuple(r) for r in b_rows]


def test_asof_forward_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    purchases = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            purchases[r.user_id].append(r.ts)
    for v in purchases.values():
        v.sort()
    got = {
        r.signup_id: r.next_purchase_ts
        for r in registry.QUERIES["q_asof_forward"](spark, sf_dir).collect()
    }
    n_signups = 0
    for r in ev:
        if r.event_type != "signup":
            continue
        n_signups += 1
        nxt = next((t for t in purchases[r.user_id] if t > r.ts), None)
        assert got[r.event_id] == nxt, r.event_id
    assert len(got) == n_signups


def test_outlier_iqr_fences(spark, sf_dir):
    import numpy as np

    rows = {
        r.o_orderpriority: r
        for r in registry.QUERIES["q_outlier_iqr"](spark, sf_dir).collect()
    }
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_prio = defaultdict(list)
    for r in orders:
        by_prio[r.o_orderpriority].append(r.o_totalprice)
    for prio, vals in by_prio.items():
        q1, q3 = np.percentile(vals, [25, 75], method="linear")
        iqr = q3 - q1
        n_high = sum(1 for v in vals if v > q3 + 1.5 * iqr)
        n_low = sum(1 for v in vals if v < q1 - 1.5 * iqr)
        assert rows[prio].n == len(vals)
        assert rows[prio].n_high == n_high, prio
        assert rows[prio].n_low == n_low, prio


def test_array_setops_consistency(spark, sf_dir):
    for r in registry.QUERIES["q_array_setops"](spark, sf_dir).collect():
        # inclusion-exclusion on set sizes
        assert r.n_union == r.n_both + r.n_only_early + (
            r.n_union - r.n_both - r.n_only_early
        )
        assert r.n_both >= 0 and r.n_only_early >= 0
        assert r.n_union >= max(r.n_both, r.n_only_early)


def test_twap_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((int(r.ts.timestamp()), r.event_id, r.value))
    got = {
        r.user_id: (r.n_segments, r.span_sec, r.twap)
        for r in registry.QUERIES["q_twap"](spark, sf_dir).collect()
    }
    for uid, obs in per_user.items():
        obs.sort(key=lambda o: (o[0], o[1]))
        segs = [
            (obs[i][2], obs[i + 1][0] - obs[i][0])
            for i in range(len(obs) - 1)
        ]
        if not segs:
            assert uid not in got
            continue
        span = sum(d for _, d in segs)
        num = sum(v * d for v, d in segs)
        n, s, twap = got[uid]
        assert n == len(segs)
        assert s == span
        if span:
            assert abs(twap - num / span) < 1e-6, uid


def test_event_transitions_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = defaultdict(int)
    for seq in per_user.values():
        seq.sort(key=lambda o: (o[0], o[1]))
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    got = {
        (r.prev_type, r.next_type): (r.n, r.n_from_prev)
        for r in registry.QUERIES["q_event_transitions"](spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(trans)
    from_totals = defaultdict(int)
    for (a, _), n in trans.items():
        from_totals[a] += n
    for (a, _), (_, tot) in got.items():
        assert tot == from_totals[a]


def test_fk_integrity_all_clean_on_fixtures(spark, sf_dir):
    rows = {
        r.check_name: r.n_bad
        for r in registry.QUERIES["q_fk_integrity"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        "orders_without_customer",
        "lineitems_without_order",
        "duplicate_order_keys",
        "null_customer_keys",
    }
    assert all(v == 0 for v in rows.values()), rows


def test_hist2d_covers_all_rows(spark, sf_dir):
    got = registry.QUERIES["q_hist2d"](spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "lineitem").count()
    assert sum(r.n for r in got) == n_total
    for r in got:
        assert r.qty_bin >= 0 and r.price_bin >= 0


def test_col_profile_matches_bruteforce(spark, sf_dir):
    rows = {r.col: r for r in registry.QUERIES["q_col_profile"](spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderstatus"
    ).collect()
    assert rows["o_custkey"].n_distinct == len({r.o_custkey for r in orders})
    assert rows["o_totalprice"].n_distinct == len({r.o_totalprice for r in orders})
    assert rows["o_orderstatus"].n_distinct == len({r.o_orderstatus for r in orders})
    assert rows["o_custkey"].min_val == min(r.o_custkey for r in orders)
    assert rows["o_totalprice"].max_val == max(r.o_totalprice for r in orders)
    assert rows["o_orderstatus"].min_val is None


def test_cohort_ltv_curve_is_cumulative(spark, sf_dir):
    rows = registry.QUERIES["q_cohort_ltv"](spark, sf_dir).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_wk].append((r.age_wk, r.wk_value, r.cum_value))
    for cohort, seq in by_cohort.items():
        seq.sort()
        run = 0.0
        for age, wk, cum in seq:
            run += wk
            assert abs(cum - run) < 1e-6, (cohort, age)
    # cumulative totals match the raw value sum
    total = sum(
        r.value
        for r in load(spark, sf_dir, "events").select("value").collect()
    )
    final = sum(max(s)[2] for s in by_cohort.values())
    assert abs(final - total) < 1e-4


def test_skew_audit_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    got = registry.QUERIES["q_skew_audit"](spark, sf_dir).collect()[0]
    keys = Counter(
        r.o_custkey
        for r in load(spark, sf_dir, "orders").select("o_custkey").collect()
    )
    counts = sorted(keys.values())
    assert got.n_keys == len(counts)
    assert got.n_rows == sum(counts)
    assert got.max_key_rows == max(counts)
    assert got.min_key_rows == min(counts)
    assert got.max_share_ppm == (max(counts) * 1000000) // sum(counts)


def test_compaction_plan_covers_all_bytes(spark, sf_dir):
    plan = registry.QUERIES["q_compaction_plan"](spark, sf_dir).collect()
    # every input file lands in exactly one output bin; byte totals conserve
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_orderkey"
    ).collect()
    total_bytes = sum(len(str(r.o_orderkey)) + 64 for r in orders)
    assert sum(r.out_bytes for r in plan) == total_bytes
    for r in plan:
        assert r.n_inputs >= 1
        assert r.out_file >= 0


def test_ab_lift_assignment_is_hash_rule(spark, sf_dir):
    import hashlib

    rows = {r.grp: r for r in registry.QUERIES["q_ab_lift"](spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    conv = {}
    for r in ev:
        conv.setdefault(r.user_id, 0)
        if r.event_type == "purchase":
            conv[r.user_id] = 1
    want = {0: [0, 0], 1: [0, 0]}
    for uid, c in conv.items():
        g = int(hashlib.md5(f"{uid}:ab".encode()).hexdigest()[:4], 16) % 2
        want[g][0] += 1
        want[g][1] += c
    for g, (n, nc) in want.items():
        if n == 0:
            assert g not in rows
            continue
        assert rows[g].n_users == n
        assert rows[g].n_converted == nc
        assert rows[g].conv_ppm == nc * 1000000 // n


def test_basket_rules_matches_bruteforce(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    part = {
        r.p_partkey: r.p_type
        for r in load(spark, sf_dir, "part").select("p_partkey", "p_type").collect()
    }
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(part[r.l_partkey])
    singles, pairs = defaultdict(int), defaultdict(int)
    for items in baskets.values():
        for t in items:
            singles[t] += 1
        for x in items:
            for y in items:
                if x != y:
                    pairs[(x, y)] += 1
    n_orders = len(baskets)
    got = {
        (r.antecedent, r.consequent): (r.support, r.confidence_ppm, r.lift_ppm)
        for r in registry.QUERIES["q_basket_rules"](spark, sf_dir).collect()
    }
    want = {}
    for (x, y), s in pairs.items():
        # relative Apriori min-support: support/n_orders >= 23.5%
        if s * 1000 >= 235 * n_orders:
            conf = int(s * 1000000.0 // singles[x])
            lift = int((s * 1000000.0 * n_orders) // (singles[x] * singles[y]))
            want[(x, y)] = (s, conf, lift)
    # the floor must actually bind: some pair below it, some above
    assert 0 < len(want) < len(pairs)
    assert got == want
