"""Semantic contracts for the round-3 corpus operators: containment
dedup direction/threshold, weighted-sampling determinism, chunk tiling
geometry, and the BPE pair statistic — each verified against an
independent brute-force recomputation on the sf0.001 fixtures."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from pot_spark import registry
from pot_spark.tables import load

registry.load_all_query_modules()


def _doc_shingle_sets(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    out = {}
    for r in rows:
        toks = r.text.split(" ")
        if len(toks) < 3:
            continue
        out[r.doc_id] = (
            r.lang,
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)},
        )
    return out


def test_containment_pairs_match_bruteforce(spark, sf_dir):
    got = {
        (r.doc_sub, r.doc_sup): r.containment
        for r in registry.QUERIES["q_containment_dedup"](spark, sf_dir).collect()
    }
    sets = _doc_shingle_sets(spark, sf_dir)
    want = {}
    for a, (la, sa) in sets.items():
        for b, (lb, sb) in sets.items():
            if a == b or la != lb:
                continue
            c = len(sa & sb) / len(sa)
            smaller_side = len(sa) < len(sb) or (len(sa) == len(sb) and a < b)
            if c >= 0.8 and smaller_side:
                want[(a, b)] = round(c, 6)
    assert got == want


def test_weighted_sample_is_exactly_the_hash_rule(spark, sf_dir):
    kept = {
        r.doc_id: r.n_chars
        for r in registry.QUERIES["q_weighted_sample"](spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    for r in docs:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4], 16)
        should_keep = h < min(65536, r.n_chars * 32)
        assert (r.doc_id in kept) == should_keep, r.doc_id
    # the realized rate must track the expected token-weighted rate
    exp = sum(min(1.0, r.n_chars / 2048) for r in docs)
    assert abs(len(kept) - exp) < 5 * math.sqrt(max(exp, 1.0))


def test_doc_chunks_tile_each_document(spark, sf_dir):
    chunks = registry.QUERIES["q_doc_chunk"](spark, sf_dir).collect()
    n_toks = {
        r.doc_id: len(r.text.split(" "))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    per_doc = Counter(r.doc_id for r in chunks)
    for doc_id, n in n_toks.items():
        assert per_doc[doc_id] == math.ceil(n / 24), doc_id
    for r in chunks:
        n = n_toks[r.doc_id]
        assert r.start_tok == r.chunk_idx * 24
        assert r.chunk_len == min(32, n - r.start_tok)
        assert 1 <= r.chunk_len <= 32


def test_bpe_top_pair_matches_bruteforce(spark, sf_dir):
    got = registry.QUERIES["q_bpe_pair_counts"](spark, sf_dir).collect()
    wf = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        for w in r.text.split(" "):
            if len(w) >= 2:
                wf[w] += 1
    pairs = Counter()
    for w, f_ in wf.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += f_
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.pair, r.n) for r in got] == want


def test_tpch_q5_q10_shapes(spark, sf_dir):
    q5 = registry.QUERIES["q_sql_q5"](spark, sf_dir)
    rows5 = q5.collect()
    assert all(r.revenue > 0 for r in rows5)
    # revenue sorted descending (ties broken by name)
    revs = [r.revenue for r in rows5]
    assert revs == sorted(revs, reverse=True)
    q10 = registry.QUERIES["q_sql_q10"](spark, sf_dir)
    rows10 = q10.collect()
    assert len(rows10) <= 20
    assert all(r.revenue > 0 for r in rows10)


def test_temperature_mixture_sqrt_flattening(spark, sf_dir):
    rows = registry.QUERIES["q_temperature_mixture"](spark, sf_dir).collect()
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        want_thresh = math.floor(math.sqrt(n_min / r.n_docs) * 65536)
        assert r.thresh == want_thresh, r.source
        # the smallest source keeps everything (rate 1.0)
        if r.n_docs == n_min:
            assert r.n_kept == r.n_docs
        assert 0 <= r.n_kept <= r.n_docs
    # selection is the exact md5 rule
    docs = load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    thresh = {r.source: r.thresh for r in rows}
    kept = Counter()
    for d in docs:
        h = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:4], 16)
        if h < thresh[d.source]:
            kept[d.source] += 1
    assert {r.source: r.n_kept for r in rows} == dict(kept)


def test_gdpr_erase_cascade_consistency(spark, sf_dir):
    rows = {r.tbl: r for r in registry.QUERIES["q_gdpr_erase"](spark, sf_dir).collect()}
    cust = load(spark, sf_dir, "customer").select("c_custkey").collect()
    erased_cust = {r.c_custkey for r in cust if r.c_custkey % 17 == 3}
    assert rows["customer"].n_erased == len(erased_cust)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    erased_orders = {r.o_orderkey for r in orders if r.o_custkey in erased_cust}
    assert rows["orders"].n_erased == len(erased_orders)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    assert rows["lineitem"].n_erased == sum(
        1 for r in li if r.l_orderkey in erased_orders
    )
    for r in rows.values():
        assert r.n_survive == r.n_total - r.n_erased


def test_bigram_lm_matches_bruteforce(spark, sf_dir):
    texts = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    uni, cb = Counter(), Counter()
    for ts in texts.values():
        uni.update(ts)
        cb.update(zip(ts, ts[1:]))
    big_n = sum(uni.values())
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in registry.QUERIES["q_bigram_lm"](spark, sf_dir).collect()
    }
    for doc_id, ts in texts.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        s = sum(
            -math.log(0.75 * cb[p] / uni[p[0]] + 0.25 * uni[p[1]] / big_n)
            for p in pairs
        )
        n, score = got[doc_id]
        assert n == len(pairs)
        assert abs(score - s / len(pairs)) < 1e-5, doc_id


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom guarantee: every eval doc whose exact text exists in the
    training split MUST be flagged; false positives are audited but
    bounded well below the eval size at the fixture's fill rate."""
    rows = registry.QUERIES["q_bloom_decontaminate"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select("text", "source", "lang").collect()
    train_texts = {r.text for r in docs if r.source != "src0"}
    true_dups = Counter(
        r.lang for r in docs if r.source == "src0" and r.text in train_texts
    )
    n_eval = Counter(r.lang for r in docs if r.source == "src0")
    for r in rows:
        assert r.n_docs == n_eval[r.lang]
        assert r.n_true_dup == true_dups[r.lang]
        # no false negatives: flagged >= true dups
        assert r.n_flagged >= r.n_true_dup
        assert r.n_false_pos == r.n_flagged - r.n_true_dup
    total_fp = sum(r.n_false_pos for r in rows)
    total = sum(r.n_docs for r in rows)
    assert total_fp <= max(3, total // 2)  # fill-rate-bounded, not exploding


def test_prefix_filter_join_exact_and_pruned(spark, sf_dir):
    """Prefix lemma: the result must EQUAL the brute-force threshold
    join (no recall loss), while candidates come from rarest-prefix
    shingles only (strictly fewer index postings than the full join)."""
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["q_prefix_filter_join"](spark, sf_dir).collect()
    }
    sets = _doc_shingle_sets(spark, sf_dir)
    want = {}
    for a, (la, sa) in sets.items():
        for b, (lb, sb) in sets.items():
            if a >= b or la != lb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.7:
                want[(a, b)] = round(j, 6)
    assert got == want
    # scale contract: prefix postings strictly fewer than full postings
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    full_postings = sum(
        max(0, len(r.text.split(" ")) - 2)
        for r in docs.select("text").collect()
    )
    import math

    prefix_postings = sum(
        len(s) - math.ceil(0.7 * len(s)) + 1 for _, s in sets.values()
    )
    assert prefix_postings < full_postings // 2


def test_dsir_select_matches_bruteforce(spark, sf_dir):
    """DSIR selection must match an independent Python recomputation:
    add-one-smoothed unigram log importance weights toward src0 with the
    decimal(14,12) per-term quantization the engine uses, top-25
    non-target docs by (weight desc, doc_id)."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    q12 = Decimal("1e-12")
    tf_r, tf_t = Counter(), Counter()
    doc_toks = {}
    src = {}
    for r in rows:
        toks = [t for t in r.text.lower().split(" ") if t != ""]
        doc_toks[r.doc_id] = Counter(toks)
        src[r.doc_id] = r.source
        tf_r.update(toks)
        if r.source == "src0":
            tf_t.update(toks)
    r_total, t_total, v = sum(tf_r.values()), sum(tf_t.values()), len(tf_r)
    lam = {
        w: Decimal(math.log(tf_t.get(w, 0) + 1.0) - math.log(n + 1.0)).quantize(
            q12, rounding=ROUND_HALF_UP
        )
        for w, n in tf_r.items()
    }
    const = Decimal(math.log(r_total + v) - math.log(t_total + v)).quantize(
        q12, rounding=ROUND_HALF_UP
    )
    scored = []
    for doc_id, cnt in doc_toks.items():
        if src[doc_id] == "src0" or not cnt:
            continue
        n_tokens = sum(cnt.values())
        w = sum(m * lam[t] for t, m in cnt.items()) + n_tokens * const
        w6 = float(w.quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))
        scored.append((doc_id, src[doc_id], n_tokens, w6))
    scored.sort(key=lambda x: (-x[3], x[0]))
    want = scored[:25]
    got = [
        (r.doc_id, r.source, r.n_tokens, r.log_weight)
        for r in registry.QUERIES["q_dsir_select"](spark, sf_dir).collect()
    ]
    assert got == want
    # the cut must be non-degenerate: weights at the boundary differ
    assert want[0][3] > want[-1][3]


def test_gopher_rules_match_bruteforce(spark, sf_dir):
    """Per-source Gopher gate counts must match an independent Python
    pass applying the same six integer-exact rules."""
    rows = (
        load(spark, sf_dir, "documents").select("source", "text").collect()
    )
    sw = ("the", "a", "of", "and", "to", "in", "is")
    agg = {}
    for r in rows:
        tk = [t for t in (r.text or "").split(" ") if t != ""] if r.text is not None else None
        if tk is None:
            flags = (False,) * 6
        else:
            n = len(tk)
            c = sum(len(t) for t in tk)
            n_alpha = sum(1 for t in tk if any(ch.isascii() and ch.isalpha() for ch in t))
            n_sw = len({t for t in tk if t in sw})
            n_sym = sum(1 for t in tk if "#" in t or "..." in t)
            bg = [f"{tk[i]} {tk[i+1]}" for i in range(n - 1)]
            maxbg = max(Counter(bg).values()) if bg else None
            flags = (
                30 <= n <= 100000,
                n >= 1 and 3 * n <= c <= 10 * n,
                5 * n_alpha >= 4 * n,
                n_sw >= 2,
                10 * n_sym <= n,
                n < 2 or 10 * maxbg <= n,
            )
        a = agg.setdefault(r.source, [0] * 8)
        a[0] += 1
        for i, ok in enumerate(flags):
            a[1 + i] += 0 if ok else 1
        a[7] += 1 if all(flags) else 0
    want = {
        s: tuple(a) + (a[7] * 1000000 // a[0],) for s, a in agg.items()
    }
    got = {
        r.source: (
            r.n_docs,
            r.fail_wordcount,
            r.fail_meanwordlen,
            r.fail_alphaword,
            r.fail_stopword,
            r.fail_symbol,
            r.fail_repetition,
            r.n_pass,
            r.pass_ppm,
        )
        for r in registry.QUERIES["q_gopher_rules"](spark, sf_dir).collect()
    }
    assert got == want
    # the fixture must exercise at least one failing rule, not pass vacuously
    assert any(v[1] + v[4] + v[6] > 0 for v in got.values())


def test_exact_substring_matches_bruteforce(spark, sf_dir):
    """ExactSubstr window-duplication profile must match an independent
    Python pass: 8-token windows, duplicated iff the gram text occurs
    >= 2 times corpus-wide."""
    W = 8
    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    wins = []  # (source, doc_id, gram)
    for r in rows:
        if r.text is None:
            continue
        tk = [t for t in r.text.split(" ") if t != ""]
        for i in range(len(tk) - W + 1):
            wins.append((r.source, r.doc_id, " ".join(tk[i : i + W])))
    df = Counter(g for _, _, g in wins)
    agg = {}
    for src, doc, g in wins:
        a = agg.setdefault(src, [set(), 0, 0, set()])
        a[0].add(doc)
        a[1] += 1
        if df[g] >= 2:
            a[2] += 1
            a[3].add(g)
    want = {
        s: (len(a[0]), a[1], a[2], a[2] * 1000000 // a[1], len(a[3]))
        for s, a in agg.items()
    }
    got = {
        r.source: (r.n_docs, r.n_windows, r.n_dup_windows, r.dup_ppm, r.n_dup_grams)
        for r in registry.QUERIES["q_exact_substring"](spark, sf_dir).collect()
    }
    assert got == want
    # duplicated spans must exist in the fixture, or the op is untested
    assert sum(v[2] for v in got.values()) > 0


def test_dup_spans_match_bruteforce(spark, sf_dir):
    """Span merge must equal an independent interval-union pass over the
    duplicated 8-token windows."""
    W = 8
    rows = (
        load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    wins = []  # (doc_id, pos, gram)
    for r in rows:
        if r.text is None:
            continue
        tk = [t for t in r.text.split(" ") if t != ""]
        for i in range(len(tk) - W + 1):
            wins.append((r.doc_id, i + 1, " ".join(tk[i : i + W])))
    df = Counter(g for _, _, g in wins)
    dup = {}
    for doc, pos, g in wins:
        if df[g] >= 2:
            dup.setdefault(doc, []).append(pos)
    want = {}
    for doc, poss in dup.items():
        poss.sort()
        spans = []  # [start, end, n_windows]
        for p in poss:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + W - 1)
                spans[-1][2] += 1
            else:
                spans.append([p, p + W - 1, 1])
        lens = [e - s + 1 for s, e, _ in spans]
        want[doc] = (len(spans), sum(lens), max(lens), sum(n for _, _, n in spans))
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.max_span_tokens, r.n_dup_windows)
        for r in registry.QUERIES["q_dup_spans"](spark, sf_dir).collect()
    }
    assert got == want
    # the merge must actually merge somewhere (a span wider than W)
    assert any(v[2] > W for v in got.values())


def test_zorder_skipping_locality_property(spark, sf_dir):
    """Both layouts must see the same matching rows, and the Z-order
    layout must dominate: fewer blocks hit, fewer rows scanned, lower
    amplification, higher skip rate."""
    got = {
        r.layout: r
        for r in registry.QUERIES["q_zorder_skipping"](spark, sf_dir).collect()
    }
    nat, z = got["natural"], got["zorder"]
    assert nat.rows_match == z.rows_match > 0
    # key-range blocks: non-empty counts are data-dependent but must be
    # comparable for the scan-cost comparison to be fair
    assert abs(nat.n_blocks - z.n_blocks) * 10 <= max(nat.n_blocks, z.n_blocks)
    assert z.blocks_hit < nat.blocks_hit
    assert z.rows_scanned < nat.rows_scanned
    assert z.skip_ppm > nat.skip_ppm
    assert z.amp_x1000 < nat.amp_x1000


def test_k_anonymity_ladder_matches_bruteforce(spark, sf_dir):
    """The release ladder must match an independent cohort pass: fine
    cohorts >= k release, residuals regroup one level up, leftovers
    suppress; every row lands in exactly one bucket."""
    import datetime

    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"),
                F.floor(F.col("value") / 50).cast("bigint").alias("vb"))
        .collect()
    )
    K = 10
    c1 = Counter((r.event_type, r.day, r.vb) for r in rows)
    agg = {}
    for (et, day, vb), n in c1.items():
        a = agg.setdefault(et, {"rows": 0, "cohorts": 0, "l1": 0, "resid": Counter()})
        a["rows"] += n
        a["cohorts"] += 1
        if n >= K:
            a["l1"] += n
        else:
            a["resid"][day] += n
    want = {}
    for et, a in agg.items():
        l2 = sum(n for n in a["resid"].values() if n >= K)
        sup = sum(n for n in a["resid"].values() if n < K)
        want[et] = (a["rows"], a["cohorts"], a["l1"], l2, sup,
                    sup * 1000000 // a["rows"])
    got = {
        r.event_type: (r.n_rows, r.n_l1_cohorts, r.n_released_l1,
                       r.n_released_l2, r.n_suppressed, r.suppressed_ppm)
        for r in registry.QUERIES["q_k_anonymity"](spark, sf_dir).collect()
    }
    assert got == want
    for v in got.values():
        assert v[2] + v[3] + v[4] == v[0]  # every row lands in one bucket
    # the ladder must exercise all three buckets somewhere
    assert any(v[3] > 0 for v in got.values()) or any(v[4] > 0 for v in got.values())


def test_chi2_independence_matches_bruteforce(spark, sf_dir):
    """Chi2 must match an independent contingency pass including empty
    cells, using the same floored 1e-10 integer summation."""
    import math as _m

    rows = (
        load(spark, sf_dir, "documents").select("lang", "source").collect()
    )
    obs = Counter((r.lang or "", r.source or "") for r in rows)
    langs = sorted({k[0] for k in obs})
    srcs = sorted({k[1] for k in obs})
    n = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (l, s), o in obs.items():
        rt[l] += o
        ct[s] += o
    s_e10 = 0
    for l in langs:
        for s in srcs:
            o = obs.get((l, s), 0)
            num = float(o) * n - float(rt[l]) * ct[s]
            s_e10 += _m.floor(num * num / (float(n) * rt[l] * ct[s]) * 1e10)
    chi2 = round(s_e10 / 1e10, 6)
    v = round(_m.sqrt(s_e10 / 1e10 / (n * min(len(langs) - 1, len(srcs) - 1))), 6)
    got = registry.QUERIES["q_chi2_independence"](spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n, g.n_langs, g.n_sources, g.dof) == (
        n, len(langs), len(srcs), (len(langs) - 1) * (len(srcs) - 1)
    )
    assert g.chi2 == chi2
    assert g.cramers_v == v


def test_kneser_ney_matches_bruteforce(spark, sf_dir):
    """Interpolated KN bigram scores must match an independent Python
    pass: D = 0.75, continuation counts from the bigram-type table,
    per-term decimal(28,12) quantization before the per-doc average."""
    from decimal import ROUND_HALF_UP, Decimal

    texts = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    cb, fwd_types, bwd_types, ctx = Counter(), Counter(), Counter(), Counter()
    for ts in texts.values():
        cb.update(zip(ts, ts[1:]))
    for (w1, w2), c in cb.items():
        fwd_types[w1] += 1
        bwd_types[w2] += 1
        ctx[w1] += c
    B = len(cb)
    q12 = Decimal("1e-12")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in registry.QUERIES["q_kneser_ney"](spark, sf_dir).collect()
    }
    q28 = Decimal("1e-12")
    for doc_id, ts in texts.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        per = Counter(pairs)
        s = Decimal(0)
        for p, m in per.items():
            w1, w2 = p
            prob = (max(cb[p] - 0.75, 0.0) + 0.75 * fwd_types[w1] * (bwd_types[w2] / B)) / ctx[w1]
            s += Decimal(m * math.log(prob)).quantize(q28, rounding=ROUND_HALF_UP)
        n, score = got[doc_id]
        assert n == len(pairs)
        want = round(float(-s) / len(pairs), 6)
        assert abs(score - want) < 2e-6, doc_id


def test_soft_dedup_matches_bruteforce(spark, sf_dir):
    """Soft-dedup weights must equal 1e6 // cluster_size summed per
    source, and a source's effective mass can never exceed its count."""
    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    c = Counter(r.text for r in rows if r.text is not None)
    agg = {}
    for r in rows:
        if r.text is None:
            continue
        a = agg.setdefault(r.source, [0, set(), 0])
        a[0] += 1
        a[1].add(r.text)
        a[2] += 1000000 // c[r.text]
    want = {
        s: (a[0], len(a[1]), a[2], a[2] // a[0]) for s, a in agg.items()
    }
    got = {
        r.source: (r.n_docs, r.n_distinct, r.sum_weight_ppm, r.eff_ppm)
        for r in registry.QUERIES["q_soft_dedup"](spark, sf_dir).collect()
    }
    assert got == want
    for n_docs, n_distinct, sum_w, eff in got.values():
        assert sum_w <= n_docs * 1000000
        assert eff <= 1000000
    # when the fixture has exact duplicates, the weights must deflate
    if any(n > 1 for n in c.values()):
        assert any(v[3] < 1000000 for v in got.values())


# -- round-7 additions: novelty / affix / inflation / growth / bins ----------


def _docs_rows(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "text", "n_chars")
        .collect()
    )


def _lower_toks(text):
    return [t for t in text.lower().split(" ") if t != ""]


def test_ngram_novelty_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    inc = set()
    for r in rows:
        toks = _lower_toks(r.text)
        if len(toks) < 3:
            continue
        for i in range(len(toks) - 2):
            inc.add((r.doc_id, r.source, " ".join(toks[i : i + 3])))
    firsts = {}
    for doc_id, _src, gram in inc:
        if doc_id is None:
            continue
        if gram not in firsts or doc_id < firsts[gram]:
            firsts[gram] = doc_id
    src_of = {r.doc_id: r.source for r in rows}
    novel = Counter()
    for gram, fd in firsts.items():
        novel[src_of[fd]] += 1
    denom = Counter(src for _d, src, _g in inc)
    got = {
        r.source: (r.n_doc_grams, r.n_novel, r.novelty_ppm)
        for r in registry.QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    }
    assert set(got) == set(denom)
    for src, nd in denom.items():
        nn = novel.get(src, 0)
        assert got[src] == (nd, nn, nn * 1_000_000 // nd), src


def test_affix_dup_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    pfx, sfx, docs = Counter(), Counter(), []
    for r in rows:
        toks = _lower_toks(r.text)
        if len(toks) < 8:
            continue
        p = hashlib.md5(" ".join(toks[:8]).encode()).hexdigest()
        s = hashlib.md5(" ".join(toks[-8:]).encode()).hexdigest()
        pfx[p] += 1
        sfx[s] += 1
        docs.append((r.source, p, s))
    exp = {}
    for src in {d[0] for d in docs}:
        mine = [(p, s) for s0, p, s in docs if s0 == src]
        n = len(mine)
        np_ = sum(1 for p, _s in mine if pfx[p] > 1)
        ns = sum(1 for _p, s in mine if sfx[s] > 1)
        exp[src] = (n, np_, ns, np_ * 1_000_000 // n, ns * 1_000_000 // n)
    got = {
        r.source: (
            r.n_docs,
            r.n_shared_prefix,
            r.n_shared_suffix,
            r.prefix_dup_ppm,
            r.suffix_dup_ppm,
        )
        for r in registry.QUERIES["q_affix_dup"](spark, sf_dir).collect()
    }
    assert got == exp


def test_dup_inflation_and_quality_buckets_consistent(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    n_docs = len(rows)
    infl = {
        r.lang: (r.total_tokens, r.unique_tokens)
        for r in registry.QUERIES["q_dup_inflation"](spark, sf_dir).collect()
    }
    # totals add up to the corpus token count; unique <= total
    tot_tokens = sum(len(_lower_toks(r.text)) for r in rows)
    assert sum(t for t, _u in infl.values()) == tot_tokens
    assert all(u <= t for t, u in infl.values())
    buckets = registry.QUERIES["q_quality_by_dup"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in buckets) == n_docs
    assert {r.bucket for r in buckets} <= {"unique", "dup_2_3", "dup_4_plus"}


def test_vocab_growth_monotone_and_saturates(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    vocab_all = set()
    for r in rows:
        vocab_all.update(_lower_toks(r.text))
    got = sorted(
        registry.QUERIES["q_vocab_growth"](spark, sf_dir).collect(),
        key=lambda r: r.checkpoint,
    )
    assert [r.checkpoint for r in got] == [64, 128, 256, 512, 1024, 2048, 4096, 8192]
    for a, b in zip(got, got[1:]):
        assert a.n_vocab <= b.n_vocab and a.n_docs <= b.n_docs
    max_id = max(r.doc_id for r in rows if r.doc_id is not None)
    saturated = [r for r in got if r.checkpoint > max_id]
    assert saturated and all(r.n_vocab == len(vocab_all) for r in saturated)


def test_vocab_overlap_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    vocab = {}
    for r in rows:
        if r.source is None:
            continue
        vocab.setdefault(r.source, set()).update(_lower_toks(r.text))
    got = {
        (r.source_a, r.source_b): (r.v_a, r.v_b, r.n_common, r.jaccard_ppm)
        for r in registry.QUERIES["q_vocab_overlap"](spark, sf_dir).collect()
    }
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(vocab[a] & vocab[b])
            if common == 0:
                assert (a, b) not in got
                continue
            va, vb = len(vocab[a]), len(vocab[b])
            assert got[(a, b)] == (
                va,
                vb,
                common,
                common * 1_000_000 // (va + vb - common),
            ), (a, b)


def test_ccnet_bins_are_ordered_tertiles(spark, sf_dir):
    got = registry.QUERIES["q_ccnet_bins"](spark, sf_dir).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.bin)
        assert [r.bin for r in rs] == list(range(1, len(rs) + 1))
        # equi-depth: tertile counts differ by at most 1, nonincreasing
        counts = [r.n_docs for r in rs]
        assert max(counts) - min(counts) <= 1 and counts == sorted(
            counts, reverse=True
        )
        # bins partition the score axis in order
        for a, b in zip(rs, rs[1:]):
            assert a.max_nlp <= b.min_nlp, lang


def test_length_bias_deciles_balanced(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    base = [r for r in rows if r.n_chars is not None and r.text is not None]
    n_digests = len({r.text for r in base})
    got = sorted(
        registry.QUERIES["q_length_bias"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in got] == list(range(1, 11))
    assert sum(r.n_pre for r in got) == len(base)
    assert sum(r.n_post for r in got) == n_digests
    pre_counts = [r.n_pre for r in got]
    assert max(pre_counts) - min(pre_counts) <= 1
    # boundaries are nondecreasing data values
    for a, b in zip(got, got[1:]):
        assert a.max_pre <= b.max_pre


# -- round-7 batch 2: benford / gini / zipf / cusum / context-fit ------------


def test_gini_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(
            (len(_lower_toks(r.text)), r.doc_id if r.doc_id is not None else -1)
        )
    got = {
        r.lang: (r.n_docs, r.total_tokens, r.gini_ppm)
        for r in registry.QUERIES["q_gini"](spark, sf_dir).collect()
    }
    for lang, xs in by_lang.items():
        xs.sort()
        n = len(xs)
        tot = sum(x for x, _ in xs)
        if tot == 0:
            assert got[lang][2] is None
            continue
        num = 2 * sum((i + 1) * x for i, (x, _) in enumerate(xs)) - (n + 1) * tot
        # DIV parity note: Spark's integer DIV truncates toward zero,
        # DuckDB's // floors — they agree here ONLY because the Gini
        # numerator is provably >= 0 (rank-sum of a sorted sequence).
        # Do NOT reuse this bare-DIV pattern for signed numerators.
        exp = (num * 1_000_000) // (n * tot)
        assert got[lang] == (n, tot, exp), lang


def test_zipf_fit_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    freqs = {}
    for r in rows:
        for t in _lower_toks(r.text):
            freqs.setdefault(r.lang, Counter())[t] += 1
    got = {
        r.lang: (r.vocab_size, r.zipf_slope)
        for r in registry.QUERIES["q_zipf_fit"](spark, sf_dir).collect()
    }
    for lang, cnt in freqs.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(ranked)
        if n < 2:
            assert lang not in got
            continue
        xs = [round(math.log(i + 1), 6) for i in range(n)]
        ys = [round(math.log(f), 6) for _t, f in ranked]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert got[lang][0] == n
        assert abs(got[lang][1] - slope) < 5e-6, lang


def test_cusum_drift_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .collect()
    )
    daily = {}
    for r in ev:
        if r.day is None:
            continue
        daily.setdefault(r.event_type, Counter())[r.day] += 1
    got = {
        r.event_type: (r.n_days, r.total_events, r.peak_day, r.peak_dev_scaled)
        for r in registry.QUERIES["q_cusum_drift"](spark, sf_dir).collect()
    }
    for etype, cnt in daily.items():
        days = sorted(cnt)
        n, tot = len(days), sum(cnt.values())
        cum, best = 0, None
        for i, day in enumerate(days, start=1):
            cum += cnt[day]
            dev = abs(n * cum - i * tot)
            if best is None or dev > best[1]:
                best = (day, dev)
        assert got[etype] == (n, tot, str(best[0]), best[1]), etype


def test_benford_digits_complete_and_consistent(spark, sf_dir):
    rows = registry.QUERIES["q_benford"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total = sum(r.n_values for r in rows)
    for r in rows:
        assert r.observed_ppm == r.n_values * 1_000_000 // total
        assert r.delta_ppm == r.observed_ppm - r.benford_ppm


def test_context_fit_identities(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    lens = [len(_lower_toks(r.text)) for r in rows]
    got = {
        r.context_len: r
        for r in registry.QUERIES["q_context_fit"](spark, sf_dir).collect()
    }
    assert sorted(got) == [512, 1024, 2048, 4096]
    for w, r in got.items():
        assert r.n_docs == len(lens)
        assert r.total_tokens == sum(lens)
        assert r.n_docs_truncated == sum(1 for x in lens if x > w)
        assert r.tokens_lost == sum(x - w for x in lens if x > w)
        assert r.pad_tokens == sum(w - x for x in lens if x <= w)
    # monotone: larger windows lose fewer tokens, pad more
    ws = sorted(got)
    for a, b in zip(ws, ws[1:]):
        assert got[a].tokens_lost >= got[b].tokens_lost
        assert got[a].pad_tokens <= got[b].pad_tokens


def test_dedup_funnel_matches_staged_recomputation(spark, sf_dir):
    """The funnel's three stages must agree with recomputing each stage
    from the already-verified building blocks (exact digests in Python,
    clusters from q_dedup_cluster)."""
    rows = _docs_rows(spark, sf_dir)
    n_tok = {r.doc_id: len(_lower_toks(r.text)) for r in rows}
    raw_docs, raw_tok = len(rows), sum(n_tok.values())
    keep = {}
    for r in rows:
        dig = hashlib.md5(r.text.encode()).hexdigest() if r.text is not None else None
        if dig is None or r.doc_id is None:
            if dig is not None and (dig not in keep or keep[dig] is None):
                keep.setdefault(dig, r.doc_id)
            continue
        if dig not in keep or (keep[dig] is None or r.doc_id < keep[dig]):
            keep[dig] = r.doc_id
    s1 = {v for k, v in keep.items() if k is not None and v is not None}
    reps = {
        r.doc_id: r.cluster_rep
        for r in registry.QUERIES["q_dedup_cluster"](spark, sf_dir).collect()
    }
    s2 = {d for d in s1 if d not in reps or reps[d] == d}
    got = {
        r.stage: (r.n_docs, r.n_tokens, r.docs_kept_ppm)
        for r in registry.QUERIES["q_dedup_funnel"](spark, sf_dir).collect()
    }
    assert got["raw"] == (
        raw_docs,
        raw_tok,
        raw_docs * 1_000_000 // raw_docs,
    )
    assert got["exact"] == (
        len(s1),
        sum(n_tok[d] for d in s1),
        len(s1) * 1_000_000 // raw_docs,
    )
    assert got["near"] == (
        len(s2),
        sum(n_tok[d] for d in s2),
        len(s2) * 1_000_000 // raw_docs,
    )


# -- round-7 batch 3: lang confusion / shard balance / KS / cost plan --------


def test_lang_confusion_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)

    def pred(text):
        toks = text.split(" ")
        for marker, lg in (("the", "en"), ("der", "de"), ("el", "es"), ("le", "fr")):
            if marker in toks:
                return lg
        return "unknown"

    cells = Counter((r.lang, pred(r.text)) for r in rows)
    rt = Counter()
    ct = Counter()
    for (lang, pl), n in cells.items():
        rt[lang] += n
        ct[pl] += n
    got = {
        (r.lang, r.pred_lang): (r.n, r.recall_ppm, r.precision_ppm)
        for r in registry.QUERIES["q_lang_confusion"](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, n in cells.items():
        lang, pl = key
        assert got[key] == (
            n,
            n * 1_000_000 // rt[lang],
            n * 1_000_000 // ct[pl],
        ), key


def test_shard_balance_partitions_everything(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    n = sum(1 for r in rows if r.doc_id is not None)
    got = registry.QUERIES["q_shard_balance"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in got) == n
    assert all(0 <= r.shard < 32 for r in got)
    for r in got:
        assert r.docs_ppm == r.n_docs * 1_000_000 // n
        assert r.skew_ppm == r.docs_ppm - 1_000_000 // 32


def test_ks_test_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    base = [
        (r.source, r.n_chars)
        for r in rows
        if r.source is not None and r.n_chars is not None
    ]
    total = len(base)
    xs = sorted({x for _s, x in base})
    got = {
        r.source: (r.n_docs, r.ks_ppm, r.ks_at)
        for r in registry.QUERIES["q_ks_test"](spark, sf_dir).collect()
    }
    for src in {s for s, _x in base}:
        mine = [x for s, x in base if s == src]
        ns, nr = len(mine), total - len(mine)
        if nr == 0:
            assert src not in got
            continue
        best = None
        cs = cr = 0
        from collections import Counter as _C

        cnt_s, cnt_all = _C(mine), _C(x for _s, x in base)
        for x in xs:
            cs += cnt_s.get(x, 0)
            cr += cnt_all.get(x, 0) - cnt_s.get(x, 0)
            dnum = abs(cs * nr - cr * ns)
            if best is None or dnum > best[0]:
                best = (dnum, x)
        assert got[src] == (
            ns,
            best[0] * 1_000_000 // (ns * nr),
            best[1],
        ), src


def test_dedup_cost_plan_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    from pot_spark.queries.llm_dedup import _shingle_df

    # r8: the calculator prices the SAME (lang, shingle) granularity
    # the in-op adaptive probe reads (one costing function, two call
    # sites — test_cost_plan_agrees_with_op_probe pins the decision)
    sh = Counter(
        (r.doc_id, r.lang, r.shingle)
        for r in _shingle_df(spark, sf_dir, with_lang=True).collect()
    )
    df = Counter()
    for (_d, lang, g), c in sh.items():
        df[(lang, g)] += c
    s1 = sum(df.values())
    s2 = sum(v * v for v in df.values())
    c1 = sum(min(v, 32) for v in df.values())
    c2 = sum(min(v, 32) ** 2 for v in df.values())
    dig = Counter(
        hashlib.md5(r.text.encode()).hexdigest() if r.text is not None else None
        for r in rows
    )
    e1 = sum(dig.values())
    e2 = sum(v * v for v in dig.values())
    got = {
        r.strategy: (r.est_candidate_pairs, r.est_shuffle_rows)
        for r in registry.QUERIES["q_dedup_cost_plan"](spark, sf_dir).collect()
    }
    assert got["exact_digest"] == ((e2 - e1) // 2, e1)
    assert got["direct_inverted_index"] == ((s2 - s1) // 2, s1)
    assert got["df_capped_m32"] == ((c2 - c1) // 2, c1)


# -- round-7 batch 4: acf / peak concurrency / threshold sweep ---------------


def test_acf_matches_bruteforce(spark, sf_dir):
    import datetime as _dt

    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .collect()
    )
    daily = {}
    for r in ev:
        if r.day is None:
            continue
        daily.setdefault(r.event_type, Counter())[r.day] += 1
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf)
        for r in registry.QUERIES["q_acf"](spark, sf_dir).collect()
    }
    seen = set()
    for etype, cnt in daily.items():
        series = [cnt[d] for d in sorted(cnt)]
        for lag in (1, 2, 3, 7):
            xa = series[: len(series) - lag]
            xb = series[lag:]
            n = len(xa)
            if n < 2:
                continue
            sa, sb = sum(xa), sum(xb)
            sab = sum(a * b for a, b in zip(xa, xb))
            saa, sbb = sum(a * a for a in xa), sum(b * b for b in xb)
            va, vb = n * saa - sa * sa, n * sbb - sb * sb
            if va <= 0 or vb <= 0:
                continue
            r = (n * sab - sa * sb) / math.sqrt(va * vb)
            assert got[(etype, lag)][0] == n
            assert abs(got[(etype, lag)][1] - r) < 2e-6, (etype, lag)
            seen.add((etype, lag))
    assert seen == set(got)


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    import datetime as _dt

    ev = (
        load(spark, sf_dir, "events")
        .select("ts")
        .collect()
    )
    deltas = {}
    for r in ev:
        if r.ts is None:
            continue
        day = r.ts.date()
        deltas.setdefault(day, []).append((r.ts, 1))
        deltas[day].append((r.ts + _dt.timedelta(minutes=30), -1))
    got = {
        r.day: (r.peak_concurrent, r.peak_at)
        for r in registry.QUERIES["q_peak_concurrency"](spark, sf_dir).collect()
    }
    assert set(got) == {str(d) for d in deltas}
    for day, ds in deltas.items():
        ds.sort(key=lambda p: (p[0], p[1]))  # -1 sorts before +1 on ties
        load_, best = 0, None
        for t, d in ds:
            load_ += d
            if best is None or load_ > best[0]:
                best = (load_, t)
        assert got[str(day)][0] == best[0], day


def test_threshold_sweep_is_monotone_and_anchored(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["q_dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == [30, 40, 50, 60, 70, 80, 90]
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)  # higher cut, fewer pairs
    # the 0.5 cut must agree with q_dedup_near's verified pair count
    near = registry.QUERIES["q_dedup_near"](spark, sf_dir).count()
    assert dict((r.threshold_pct, r.n_pairs) for r in rows)[50] == near


# -- round-8 batch: rank-sum / changepoint / leakage / heaps / entropy -------


def test_rank_sum_matches_bruteforce(spark, sf_dir):
    """Doubled-U via global-histogram midranks must equal the classic
    midrank computation over the raw values."""
    rows = _docs_rows(spark, sf_dir)
    base = [
        (r.source, r.n_chars)
        for r in rows
        if r.source is not None and r.n_chars is not None
    ]
    xs = sorted(x for _, x in base)
    # midrank of each value: average of its 1-based rank range, doubled
    two_mid = {}
    i = 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j] == xs[i]:
            j += 1
        two_mid[xs[i]] = (i + 1) + j  # 2 * (i+1 + j) / 2
        i = j
    got = {
        r.source: (r.n_docs, r.n_rest, r.u2, r.rank_biserial)
        for r in registry.QUERIES["q_rank_sum_test"](spark, sf_dir).collect()
    }
    srcs = {s for s, _ in base}
    n = len(base)
    for s in srcs:
        mine = [x for src, x in base if src == s]
        ns = len(mine)
        if n == ns:
            assert s not in got
            continue
        two_r = sum(two_mid[x] for x in mine)
        u2 = two_r - ns * (ns + 1)
        g = got[s]
        assert (g[0], g[1], g[2]) == (ns, n - ns, u2), s
        assert abs(g[3] - (u2 / (ns * (n - ns)) - 1.0)) < 2e-6, s


def test_changepoint_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .collect()
    )
    daily = Counter(
        (r.event_type, r.day) for r in ev if r.day is not None
    )
    series = {}
    for (t, d), c in daily.items():
        series.setdefault(t, []).append((d, c))
    got = {
        r.event_type: (r.n_days, r.split_day, r.g_stat, r.mean_delta)
        for r in registry.QUERIES["q_changepoint"](spark, sf_dir).collect()
    }
    for t, pts in series.items():
        pts.sort()
        nd = len(pts)
        if nd < 2:
            assert t not in got
            continue
        s = sum(c for _, c in pts)
        best = None
        sl = 0
        for i in range(1, nd):
            sl += pts[i - 1][1]
            dnum = sl * (nd - i) - (s - sl) * i
            w = i * (nd - i)
            g = (float(dnum) * float(dnum)) / (w * nd)
            key = (-g, pts[i - 1][0])
            if best is None or key < best[0]:
                best = (key, pts[i - 1][0], g, dnum / w)
        assert got[t][0] == nd
        assert got[t][1] == str(best[1]), t
        assert abs(got[t][2] - round(best[2], 6)) < 2e-6, t
        assert abs(got[t][3] - round(best[3], 6)) < 2e-6, t


def test_split_leakage_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)

    def lane(doc_id):
        return int(
            hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:8], 16
        ) % 100

    train_d, ev = set(), []
    for r in rows:
        digest = (
            hashlib.md5(r.text.encode()).hexdigest()
            if r.text is not None
            else None
        )
        lp = lane(r.doc_id)
        split = "train" if lp < 80 else ("val" if lp < 90 else "test")
        if split == "train":
            if digest is not None:
                train_d.add(digest)
        else:
            ev.append((split, digest))
    got = {
        r.split: (r.n_docs, r.n_leaked, r.leak_ppm)
        for r in registry.QUERIES["q_split_leakage"](spark, sf_dir).collect()
    }
    for split in ("val", "test"):
        mine = [d for s, d in ev if s == split]
        if not mine:
            assert split not in got
            continue
        leaked = sum(1 for d in mine if d is not None and d in train_d)
        assert got[split] == (
            len(mine),
            leaked,
            leaked * 1_000_000 // len(mine),
        ), split


def test_heaps_fit_matches_lstsq(spark, sf_dir):
    """The decimal-sum regression must agree with numpy lstsq over the
    deduped (ln N, ln V) points from q_vocab_growth."""
    import numpy as np

    growth = registry.QUERIES["q_vocab_growth"](spark, sf_dir).collect()
    pts = sorted(
        {
            (r.n_tokens, r.n_vocab)
            for r in growth
            if r.n_tokens > 0 and r.n_vocab > 0
        }
    )
    assert len(pts) >= 2
    xs = np.array([round(math.log(n), 6) for n, _ in pts])
    ys = np.array([round(math.log(v), 6) for _, v in pts])
    a = np.vstack([xs, np.ones_like(xs)]).T
    beta, lnk = np.linalg.lstsq(a, ys, rcond=None)[0]
    row = registry.QUERIES["q_heaps_fit"](spark, sf_dir).collect()[0]
    assert row.n_points == len(pts)
    assert abs(row.heaps_beta - beta) < 5e-6
    assert abs(row.heaps_ln_k - lnk) < 5e-6
    # sublinear growth: beta below 1 always; the tiny sf0.001 fixture can
    # legitimately fit a flat segment (vocab saturates between the two
    # live checkpoints), so 0.0 is allowed
    assert 0.0 <= row.heaps_beta < 1.0


def test_token_entropy_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    freqs = {}
    for r in rows:
        for t in _lower_toks(r.text):
            freqs.setdefault(r.lang, Counter())[t] += 1
    got = {
        r.lang: (r.n_tokens, r.vocab_size, r.hapax_ppm, r.entropy)
        for r in registry.QUERIES["q_token_entropy"](spark, sf_dir).collect()
    }
    for lang, cnt in freqs.items():
        n = sum(cnt.values())
        v = len(cnt)
        hapax = sum(1 for c in cnt.values() if c == 1)
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        g = got[lang]
        assert (g[0], g[1], g[2]) == (n, v, hapax * 1_000_000 // v), lang
        assert abs(g[3] - h) < 2e-6, lang


def test_theil_index_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    by_lang = {}
    for r in rows:
        x = len(_lower_toks(r.text)) if r.text is not None else 0
        if x > 0:
            by_lang.setdefault(r.lang, []).append(x)
    got = {
        r.lang: (r.n_docs, r.total_tokens, r.theil)
        for r in registry.QUERIES["q_theil_index"](spark, sf_dir).collect()
    }
    for lang, xs in by_lang.items():
        n, s = len(xs), sum(xs)
        t = sum(x * math.log(x) for x in xs) / s + math.log(n) - math.log(s)
        g = got[lang]
        assert (g[0], g[1]) == (n, s), lang
        assert abs(g[2] - t) < 2e-6, lang


def test_js_divergence_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    base = [(r.source, r.lang) for r in rows if r.source is not None]
    langs = Counter(l for _, l in base)
    big_n = len(base)
    got = {
        r.source: (r.n_docs, r.js_nats)
        for r in registry.QUERIES["q_js_divergence"](spark, sf_dir).collect()
    }
    for src in {s for s, _ in base}:
        mine = Counter(l for s, l in base if s == src)
        ns = sum(mine.values())
        js = 0.0
        for lang, g in langs.items():
            p = mine.get(lang, 0) / ns
            q = g / big_n
            m = 0.5 * (p + q)
            js += 0.5 * (p * math.log(p / m) if p > 0 else 0.0)
            js += 0.5 * q * math.log(q / m)
        assert got[src][0] == ns
        assert abs(got[src][1] - js) < 2e-6, src


def test_simpson_diversity_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    got = {
        r.source: (r.n_docs, r.n_langs, r.simpson_ppm)
        for r in registry.QUERIES["q_simpson_diversity"](
            spark, sf_dir
        ).collect()
    }
    by_src = {}
    for r in rows:
        if r.source is not None:
            by_src.setdefault(r.source, Counter())[r.lang] += 1
    for src, cnt in by_src.items():
        n = sum(cnt.values())
        want = (
            sum(c * (c - 1) for c in cnt.values()) * 1_000_000
            // (n * (n - 1))
            if n >= 2
            else None
        )
        assert got[src] == (n, len(cnt), want), src


def test_vocab_coverage_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    freqs = Counter()
    for r in rows:
        freqs.update(_lower_toks(r.text))
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freqs.values())
    got = {
        r.vocab_budget: (r.vocab_size, r.covered_tokens, r.coverage_ppm)
        for r in registry.QUERIES["q_vocab_coverage"](spark, sf_dir).collect()
    }
    assert set(got) == {256, 1024, 4096, 16384}
    for k, (v, cov, ppm) in got.items():
        want = sum(f for _, f in ranked[:k])
        assert v == len(ranked)
        assert cov == want, k
        assert ppm == want * 1_000_000 // total
    # coverage is monotone in the budget
    covs = [got[k][1] for k in sorted(got)]
    assert covs == sorted(covs)


def test_dup_cluster_hist_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    dig = Counter(
        hashlib.md5(r.text.encode()).hexdigest() if r.text is not None else None
        for r in rows
    )
    sizes = Counter(dig.values())
    got = {
        r.n_copies: (r.n_clusters, r.n_docs)
        for r in registry.QUERIES["q_dup_cluster_hist"](spark, sf_dir).collect()
    }
    assert got == {k: (v, k * v) for k, v in sizes.items()}


def test_char_class_profile_matches_bruteforce(spark, sf_dir):
    import re as _re

    rows = _docs_rows(spark, sf_dir)
    agg = {}
    for r in rows:
        if r.source is None or r.text is None:
            continue
        t = r.text
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(t)
        a[2] += len(_re.findall("[A-Za-z]", t))
        a[3] += len(_re.findall("[0-9]", t))
        a[4] += len(_re.findall("[ \t\n\r]", t))
        a[5] += len(_re.findall("[<>&]", t))
    got = {
        r.source: (
            r.n_docs, r.n_chars, r.letter_ppm, r.digit_ppm, r.ws_ppm,
            r.markup_ppm,
        )
        for r in registry.QUERIES["q_char_class_profile"](
            spark, sf_dir
        ).collect()
    }
    for src, (nd, nc, le, di, ws, mk) in agg.items():
        want = (
            nd, nc,
            *(x * 1_000_000 // nc if nc else None for x in (le, di, ws, mk)),
        )
        assert got[src] == want, src


def test_user_activity_gini_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id").collect()
    per_user = Counter(r.user_id for r in ev if r.user_id is not None)
    xs = sorted(per_user.values())
    n, tot = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * tot
    want = (num * 1_000_000) // (n * tot) if tot else None
    row = registry.QUERIES["q_user_activity_gini"](spark, sf_dir).collect()[0]
    assert (row.n_users, row.n_events, row.gini_ppm) == (n, tot, want)


def test_asof_tolerance_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )
    signups = {}
    for r in ev:
        if r.event_type == "signup":
            signups.setdefault(r.user_id, []).append(r.ts)
    got = {
        r.purchase_id: (r.signup_ts, r.staleness_s, r.matched)
        for r in registry.QUERIES["q_asof_tolerance"](spark, sf_dir).collect()
    }
    n_checked = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        cands = [t for t in signups.get(r.user_id, []) if t <= r.ts]
        best = max(cands) if cands else None
        stale = (r.ts - best).total_seconds() if best else None
        if best is not None and stale <= 3600:
            want = (best, int(stale), 1)
        else:
            want = (None, None, 0)
        assert got[r.event_id] == want, r.event_id
        n_checked += 1
    assert n_checked == len(got)
    # the tolerance must actually reject something on this fixture OR
    # match something — both branches exercised across fixtures
    assert any(m == 0 for _, _, m in got.values()) or all(
        m == 1 for _, _, m in got.values()
    )


def test_session_gap_stats_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .collect()
    )
    by_user = {}
    for r in ev:
        if r.ts is None or r.user_id is None:
            continue
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id if r.event_id is not None else -1)
        )
    gaps = []
    for evs in by_user.values():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            micros = int((b - a).total_seconds() * 1_000_000)
            gaps.append(micros // 1_000_000)
    gaps.sort()
    n = len(gaps)
    row = registry.QUERIES["q_session_gap_stats"](spark, sf_dir).collect()[0]
    assert row.n_gaps == n
    for p, attr in ((50, "p50_gap_s"), (90, "p90_gap_s"), (99, "p99_gap_s")):
        want = gaps[(p * n + 99) // 100 - 1]
        assert getattr(row, attr) == want, attr
    over = sum(1 for g in gaps if g > 1800)
    assert row.over_30m_ppm == over * 1_000_000 // n


def test_source_apportion_sums_to_budget_exactly(spark, sf_dir):
    """Largest-remainder apportionment: allocations are integers, sum
    to EXACTLY the budget (never the off-by-a-few of naive rounding),
    and respect quota monotonicity (alloc within 1 of the exact
    proportional share, the Hamilton-method guarantee)."""
    from pot_spark.queries.llm_text import _APPORTION_BUDGET

    rows = registry.QUERIES["q_source_apportion"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == _APPORTION_BUDGET
    total = sum(r.n_docs for r in rows)
    for r in rows:
        exact = _APPORTION_BUDGET * r.n_docs / total
        assert exact - 1 < r.alloc < exact + 1, (r.source, r.alloc, exact)
