#!/usr/bin/env python
"""Generate a TRUE scale-factor fixture matching /root/testdata's
schema and distributions (TESTDATA.md: TPC-H-ish star schema + events
stream + documents/embeddings corpus tables).

Why this exists: the 10x smoke (tools/scale_smoke.py) unions sf0.1 ten
times with shifted keys — the worst case for dedup candidate volume,
but a confounded read for ops dominated by fixed overhead, and its
duplicate-cluster sizes grow 10x instead of staying distribution-true.
This generator produces an INDEPENDENT fixture at any sf where every
cardinality scales the way a real corpus would: 10x rows, 10x users,
10x orders, same group counts for categorical dimensions, same text
length/vocab/dup-rate distributions, same unit-norm 64-dim embeddings
with weak label structure (all shapes measured off sf0.1 — see the
constants below).

Determinism: numpy PCG64 with a fixed seed; identical output for a
given (sf, seed).

Usage: python tools/gen_sf.py [--sf 1.0] [--out /tmp/sf1_true]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# measured off /root/testdata/sf0.1 (rows at sf0.1; all scale linearly)
ROWS_01 = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}
USERS_01 = 1_500  # events.user_id cardinality at sf0.1

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJS = ["large", "hot", "blue", "small", "red", "green", "shiny", "dull"]
PART_NOUNS = ["ring", "bolt", "wheel", "cog", "pin", "plate", "rod", "cap"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# the sf0.1 corpus vocabulary (31 engine-themed words)
VOCAB = (
    "batch part spark line column order small sort fast value scan a query "
    "agg table hash the big merge group filter stream key slow join vector "
    "customer row index page plan"
).split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.412, 0.150, 0.149, 0.149, 0.140]  # measured sf0.1 mix
N_SOURCES = 20  # group count stays constant; rows per source scale

EPOCH_1995 = np.datetime64("1995-01-01")
ORDERDATE_DAYS = 2404  # 1995-01-01 .. 2001-08-01
EVENTS_START = np.datetime64("2024-01-01T00:00:00.000000")
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000  # 30 days


def _ts_days(rng, n, lo_days=0, hi_days=ORDERDATE_DAYS):
    days = rng.integers(lo_days, hi_days, n)
    return (EPOCH_1995 + days.astype("timedelta64[D]")).astype("datetime64[us]")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {table.num_rows} rows", flush=True)


def generate(sf: float, out_dir: str, seed: int = 1107) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n = {t: int(round(r * sf / 0.1)) for t, r in ROWS_01.items()}
    # the driver's corpus tables floor at 500 rows (measured: documents
    # and embeddings are 500 at both sf0.001 and sf0.01, linear above)
    n["documents"] = max(n["documents"], 500)
    n["embeddings"] = max(n["embeddings"], 500)
    n_users = int(round(USERS_01 * sf / 0.1))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, nc), 2),
        "c_mktsegment": np.array(MKTSEGMENTS)[rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, ns), 2),
    }))

    npart = n["part"]
    adj = np.array(PART_ADJS)[rng.integers(0, len(PART_ADJS), npart)]
    noun = np.array(PART_NOUNS)[rng.integers(0, len(PART_NOUNS), npart)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, npart)
        ],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), npart)],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 1000.0, npart), 2),
    }))

    no = n["orders"]
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, no), 2),
        "o_orderdate": _ts_days(rng, no),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    okey = np.sort(rng.integers(0, no, nl))  # ~4 lines/order, clustered
    # l_linenumber = 1-based position within its order
    first = np.ones(nl, bool)
    first[1:] = okey[1:] != okey[:-1]
    idx = np.arange(nl)
    linenum = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, nl), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, nl), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, nl), 2),
        "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, nl)],
        "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, nl)],
        "l_shipdate": _ts_days(rng, nl),
    }))

    ne = n["events"]
    ets = EVENTS_START + rng.integers(0, EVENTS_SPAN_US, ne).astype(
        "timedelta64[us]"
    )
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(np.sort(ets)),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": np.array(["view", "click", "purchase", "signup", "error"])[
            rng.integers(0, 5, ne)
        ],
        "value": np.round(
            np.minimum(rng.exponential(50.0, ne), 560.0), 2
        ),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)],
    }))

    # documents: ~90% unique, ~10% near-dups (same prefix, mutated
    # tail), ~0.2% exact dups — the measured sf0.1 dup structure
    nd = n["documents"]
    lens = rng.integers(8, 100, nd)  # words; ~44..577 chars
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(nd):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    n_near = int(nd * 0.10)
    near_src = rng.integers(0, nd, n_near)
    near_dst = rng.integers(0, nd, n_near)
    for s, d in zip(near_src, near_dst):
        if s == d:
            continue
        words = texts[s].split()
        keep = max(3, int(len(words) * 0.9))
        tail = vocab[rng.integers(0, len(vocab), max(1, len(words) - keep))]
        texts[d] = " ".join(words[:keep] + list(tail))
    n_exact = max(1, int(nd * 0.002))
    for s, d in zip(rng.integers(0, nd, n_exact), rng.integers(0, nd, n_exact)):
        texts[d] = texts[s]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), nd, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(N_SOURCES)])[
            rng.integers(0, N_SOURCES, nd)
        ],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm 64-dim with weak label pull (measured
    # intra-label cosine-to-center ~0.14 at sf0.1)
    nv = n["embeddings"]
    dim, n_labels = 64, 10
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, nv)
    vecs = rng.standard_normal((nv, dim)) + 1.15 * centers[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=1107)
    args = ap.parse_args()
    out = args.out or f"/tmp/sf{args.sf:g}_true"
    generate(args.sf, out, args.seed)
    print(f"fixture at {out}")


if __name__ == "__main__":
    main()
