"""Brute-force recomputation contracts for the integer-exact vector
operators: product-quantization encode/ADC and Lloyd's k-means must match
an independent numpy implementation bit-for-bit (both run on
floor(x*1000) int64 components, so there is no tolerance — equality)."""

from __future__ import annotations

import math

import numpy as np

from pot_spark import registry
from pot_spark.tables import load

registry.load_all_query_modules()


def _int_vectors(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    iv = np.array(
        [[math.floor(float(x) * 1000.0) for x in r.embedding] for r in rows],
        dtype=np.int64,
    )
    return ids, labels, iv


def test_ann_pq_matches_bruteforce(spark, sf_dir):
    ids, labels, iv = _int_vectors(spark, sf_dir)
    m, subdim = 4, 16
    codes = sorted(set(labels.tolist()))
    # codebook: per-label floored mean per dim
    cb = {}
    for c in codes:
        sel = iv[labels == c]
        cb[c] = np.floor(sel.sum(axis=0) / sel.shape[0]).astype(np.int64)
    # encode: per (vec, subspace) argmin over codes, ties to lower code
    enc = {}
    for vid, v in zip(ids, iv):
        for mi in range(m):
            sl = slice(mi * subdim, (mi + 1) * subdim)
            best = min(
                (int(((v[sl] - cb[c][sl]) ** 2).sum()), c) for c in codes
            )
            enc[(vid, mi)] = best[1]
    probe = iv[ids == 0][0]
    pd = {
        (mi, c): int(
            ((probe[mi * subdim : (mi + 1) * subdim] - cb[c][mi * subdim : (mi + 1) * subdim]) ** 2).sum()
        )
        for mi in range(m)
        for c in codes
    }
    adc = {
        vid: sum(pd[(mi, enc[(vid, mi)])] for mi in range(m))
        for vid in ids
        if vid != 0
    }
    want = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    got = registry.QUERIES["q_ann_pq"](spark, sf_dir).collect()
    assert [(r.vec_id, r.adc) for r in got] == want
    for r in got:
        assert (r.code0, r.code1, r.code2, r.code3) == tuple(
            enc[(r.vec_id, mi)] for mi in range(m)
        )


def _bf_kmeans(ids, iv, k=4, iters=2):
    """Independent Lloyd's loop on the int64 components: returns
    (assign, sd) dicts keyed by vec_id (init = vec_id 0..k-1, argmin
    ties to the lower cluster id, floored centroid means)."""
    cent = {c: iv[ids == c][0].copy() for c in range(k)}
    assign = None
    for it in range(iters):
        if it > 0:
            for c in range(k):
                members = iv[[assign[v] == c for v in ids]]
                cent[c] = np.floor(members.sum(axis=0) / members.shape[0]).astype(
                    np.int64
                )
        assign, sd = {}, {}
        for vid, v in zip(ids, iv):
            best = min((int(((v - cent[c]) ** 2).sum()), c) for c in range(k))
            assign[vid], sd[vid] = best[1], best[0]
    return assign, sd


def test_kmeans_matches_bruteforce(spark, sf_dir):
    ids, _, iv = _int_vectors(spark, sf_dir)
    order = np.argsort(ids)
    ids, iv = ids[order], iv[order]
    assign, sd = _bf_kmeans(ids, iv)
    want = {}
    for vid in ids:
        c = assign[vid]
        n, inertia = want.get(c, (0, 0))
        want[c] = (n + 1, inertia + sd[vid])
    got = {
        r.cluster: (r.n_members, r.inertia)
        for r in registry.QUERIES["q_kmeans"](spark, sf_dir).collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == len(ids)


def test_semdedup_matches_bruteforce(spark, sf_dir):
    """SemDeDup per-cell report must match an independent numpy pass:
    same k-means cells, exact-integer cosine test (dot^2 * 10^4 >=
    2025 * |a|^2 * |b|^2, dot > 0), lowest-id keeper."""
    ids, _, iv = _int_vectors(spark, sf_dir)
    order = np.argsort(ids)
    ids, iv = ids[order], iv[order]
    assign, _ = _bf_kmeans(ids, iv)
    n2 = {vid: int((v.astype(object) ** 2).sum()) for vid, v in zip(ids, iv)}
    members = {}
    for vid in ids:
        members.setdefault(assign[vid], []).append(vid)
    vec = {vid: v for vid, v in zip(ids, iv)}
    want = {}
    for c, mem in members.items():
        mem = sorted(mem)
        dup_pairs = 0
        dropped = set()
        for i, a in enumerate(mem):
            for b in mem[i + 1 :]:
                dot = int(np.dot(vec[a].astype(object), vec[b].astype(object)))
                if dot > 0 and dot * dot * 10000 >= 2025 * n2[a] * n2[b]:
                    dup_pairs += 1
                    dropped.add(b)
        want[c] = (len(mem), len(dropped), len(mem) - len(dropped), dup_pairs)
    got = {
        r.cluster: (r.n_members, r.n_dropped, r.n_kept, r.n_dup_pairs)
        for r in registry.QUERIES["q_semdedup"](spark, sf_dir).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(ids)
    # the fixture must exercise the dup branch, not vacuously pass
    assert sum(v[3] for v in got.values()) > 0


def test_cluster_purity_matches_bruteforce(spark, sf_dir):
    """Purity report must match an independent pass over the same
    k-means assignment: majority label ties to the lower label id."""
    from collections import Counter as _C

    ids, labels, iv = _int_vectors(spark, sf_dir)
    order = np.argsort(ids)
    ids, labels, iv = ids[order], labels[order], iv[order]
    assign, _ = _bf_kmeans(ids, iv)
    per = {}
    for vid, lab in zip(ids, labels):
        per.setdefault(assign[vid], _C())[int(lab)] += 1
    want = {}
    for c, cnt in per.items():
        n = sum(cnt.values())
        maj, nm = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want[c] = (n, maj, nm, nm * 1000000 // n, len(cnt))
    got = {
        r.cluster: (r.n_members, r.majority_label, r.n_majority, r.purity_ppm, r.n_labels)
        for r in registry.QUERIES["q_cluster_purity"](spark, sf_dir).collect()
    }
    assert got == want
    # non-degenerate: at least one cluster is impure
    assert any(v[3] < 1000000 for v in got.values())


def test_ndcg_eval_matches_bruteforce(spark, sf_dir):
    """nDCG@10 must match an independent numpy/Decimal pass: exact
    cosine rounded to 6, rank ties to lower vec_id, decimal(14,12)
    discount constants, IDCG from the capped corpus-wide relevant
    count."""
    from decimal import Decimal

    from pot_spark.queries.llm_similarity import (
        _NDCG_CUM,
        _NDCG_K,
        _NDCG_W,
        _RECALL_MOD,
        _RECALL_Q,
    )

    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {r.vec_id: (int(r.label), np.array(r.embedding, dtype=np.float64)) for r in rows}
    probes = [
        v for v in sorted(vecs)
        if v % _RECALL_MOD == 0 and v < _RECALL_MOD * _RECALL_Q
    ]
    W = [Decimal(w) for w in _NDCG_W]
    CUM = [Decimal(c) for c in _NDCG_CUM]
    want = {}
    for p in probes:
        plab, pv = vecs[p]
        scored = []
        for v, (lab, x) in vecs.items():
            if v == p:
                continue
            cos = round(float(np.dot(x, pv)) / (np.linalg.norm(x) * np.linalg.norm(pv)), 6)
            scored.append((-cos, v, lab))
        scored.sort()
        top = scored[:_NDCG_K]
        rels = [1 if lab == plab else 0 for _, _, lab in top]
        dcg = sum((W[i] for i, r in enumerate(rels) if r), Decimal(0))
        n_rel = sum(1 for v, (lab, _) in vecs.items() if v != p and lab == plab)
        if n_rel == 0:
            ppm = 0
        else:
            idcg = CUM[min(n_rel, _NDCG_K) - 1]
            ppm = int(float(dcg) / float(idcg) * 1000000)
        want[p] = (n_rel, sum(rels), float(dcg), ppm)
    got = {
        r.probe_id: (r.n_rel, r.hits_at_10, r.dcg, r.ndcg_ppm)
        for r in registry.QUERIES["q_ndcg_eval"](spark, sf_dir).collect()
    }
    assert got == want
    # non-degenerate: some probe is imperfect, some probe finds hits
    assert any(v[3] < 1000000 for v in got.values())
    assert any(v[1] > 0 for v in got.values())


def test_random_projection_matches_bruteforce(spark, sf_dir):
    """The SRP audit must match an independent numpy pass with the same
    md5-parity sign matrix and floored integer ppm arithmetic — and the
    JL norm-preservation property must hold on average (mean ratio
    within 50% of 1e6 for every label)."""
    import hashlib

    from pot_spark.queries.llm_similarity import _DIM, _RP_OUT

    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    signs = {
        (d, j): 1 if hashlib.md5(f"{d}_{j}".encode()).hexdigest()[0] in "01234567" else -1
        for d in range(1, _DIM + 1)
        for j in range(1, _RP_OUT + 1)
    }
    agg = {}
    for r in rows:
        x = [int(math.floor(float(v) * 1000)) for v in r.embedding]
        x2 = sum(c * c for c in x)
        if x2 <= 0:
            continue
        y2 = 0
        for j in range(1, _RP_OUT + 1):
            yj = sum(signs[(d, j)] * x[d - 1] for d in range(1, _DIM + 1))
            y2 += yj * yj
        ratio = (y2 * 1000000) // (_RP_OUT * x2)
        a = agg.setdefault(int(r.label), [0, 0, None, None])
        a[0] += 1
        a[1] += ratio
        a[2] = ratio if a[2] is None else min(a[2], ratio)
        a[3] = ratio if a[3] is None else max(a[3], ratio)
    want = {l: (a[0], a[1] // a[0], a[2], a[3]) for l, a in agg.items()}
    got = {
        r.label: (r.n_vecs, r.mean_ratio_ppm, r.min_ratio_ppm, r.max_ratio_ppm)
        for r in registry.QUERIES["q_random_projection"](spark, sf_dir).collect()
    }
    assert got == want
    for n, mean, lo, hi in got.values():
        assert 500000 <= mean <= 1500000  # JL concentration, d_out = 8


def test_d4_select_matches_bruteforce(spark, sf_dir):
    """D4 per-cell accounting must match an independent pass: SemDeDup
    drops (higher-id cosine dup), then prototype-prune the floor-quarter
    of survivors closest to the centroid (sd asc, vec_id asc)."""
    ids, _, iv = _int_vectors(spark, sf_dir)
    order = np.argsort(ids)
    ids, iv = ids[order], iv[order]
    assign, sd = _bf_kmeans(ids, iv)
    n2 = {vid: int((v.astype(object) ** 2).sum()) for vid, v in zip(ids, iv)}
    vec = {vid: v for vid, v in zip(ids, iv)}
    members = {}
    for vid in ids:
        members.setdefault(assign[vid], []).append(vid)
    want = {}
    for c, mem in members.items():
        mem = sorted(mem)
        dropped = set()
        for i, a in enumerate(mem):
            for b in mem[i + 1 :]:
                dot = int(np.dot(vec[a].astype(object), vec[b].astype(object)))
                if dot > 0 and dot * dot * 10000 >= 2025 * n2[a] * n2[b]:
                    dropped.add(b)
        surv = sorted((v for v in mem if v not in dropped),
                      key=lambda v: (sd[v], v))
        n_proto = len(surv) // 4
        kept = surv[n_proto:]
        min_kept = min((sd[v] for v in kept), default=0)
        want[c] = (len(mem), len(dropped), n_proto, len(surv) - n_proto, min_kept)
    got = {
        r.cluster: (r.n_members, r.n_semdedup_dropped, r.n_proto_dropped,
                    r.n_kept, r.min_kept_sd)
        for r in registry.QUERIES["q_d4_select"](spark, sf_dir).collect()
    }
    assert got == want
    # both prune stages must fire somewhere
    assert any(v[1] > 0 for v in got.values())
    assert any(v[2] > 0 for v in got.values())


def test_centroid_drift_matches_numpy(spark, sf_dir):
    """Half-centroid cosine must match a float64 numpy recomputation to
    the 6-dp rounding the op declares."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    halves = {}
    for r in rows:
        if r.embedding is None or r.vec_id is None:
            continue
        halves.setdefault(r.label, ([], []))[r.vec_id % 2].append(
            np.asarray(r.embedding, dtype=np.float64)
        )
    exp = {}
    for label, (ev, od) in halves.items():
        if not ev or not od:
            continue
        ce, co = np.mean(ev, axis=0), np.mean(od, axis=0)
        cos = float(ce @ co / (np.linalg.norm(ce) * np.linalg.norm(co)))
        exp[label] = (len(ev), len(od), cos)
    got = {
        r.label: (r.n_even, r.n_odd, r.centroid_cosine)
        for r in registry.QUERIES["q_centroid_drift"](spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for label, (ne, no, cos) in exp.items():
        gne, gno, gcos = got[label]
        assert (gne, gno) == (ne, no)
        assert abs(gcos - cos) < 2e-6, label


def test_centroid_drift_ragged_dims_match_oracle_semantics(spark, tmp_path):
    """r7 advice regression: a dimension present in only ONE half must
    drop out of the dot AND both norm sums (the oracle's inner join on
    (label, d)). Even half has 3-dim vectors, odd half 4-dim: the
    cosine must be computed over dims 1..3 of both centroids only."""
    rows = [
        (0, [1.0, 0.0, 2.0], 7),        # even half, 3 dims
        (2, [3.0, 4.0, 0.0], 7),
        (1, [0.5, 1.5, 2.5, 9.0], 7),   # odd half, 4 dims (d=4 ragged)
        (3, [1.5, 0.5, 1.5, 3.0], 7),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = registry.QUERIES["q_centroid_drift"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.label, r.n_even, r.n_odd) == (7, 2, 2)
    ce = np.mean([[1.0, 0.0, 2.0], [3.0, 4.0, 0.0]], axis=0)
    co = np.mean([[0.5, 1.5, 2.5], [1.5, 0.5, 1.5]], axis=0)  # d=4 dropped
    cos = float(ce @ co / (np.linalg.norm(ce) * np.linalg.norm(co)))
    assert abs(r.centroid_cosine - cos) < 2e-6


def test_intra_label_diversity_matches_pairwise_numpy(spark, sf_dir):
    """The |sum u|^2 - n identity must equal the literal O(n^2) mean of
    pairwise cosines per label."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    units = {}
    for r in rows:
        if r.embedding is None or r.vec_id is None:
            continue
        v = np.asarray(r.embedding, dtype=np.float64)
        nrm = np.linalg.norm(v)
        if nrm > 0:
            units.setdefault(r.label, []).append(v / nrm)
    got = {
        r.label: (r.n_vecs, r.avg_cosine)
        for r in registry.QUERIES["q_intra_label_diversity"](
            spark, sf_dir
        ).collect()
    }
    for label, us in units.items():
        n = len(us)
        if n < 2:
            assert label not in got
            continue
        s = 0.0
        for i in range(n):
            for j in range(n):
                if i != j:
                    s += float(us[i] @ us[j])
        want = s / (n * (n - 1))
        gn, gcos = got[label]
        assert gn == n
        assert abs(gcos - want) < 5e-6, label
