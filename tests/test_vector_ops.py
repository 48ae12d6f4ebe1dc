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


def test_kmeans_matches_bruteforce(spark, sf_dir):
    ids, _, iv = _int_vectors(spark, sf_dir)
    k, iters = 4, 2
    order = np.argsort(ids)
    ids, iv = ids[order], iv[order]
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
