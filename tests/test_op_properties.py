"""Property-based checks of core relational-operator semantics: for
randomly generated small inputs, the Spark plan must agree with a plain
Python model. Spark jobs are slow per example, so each property runs a
reduced example count over batched inputs (one Spark job checks a whole
generated dataset)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pot_spark import registry

registry.load_all_query_modules()

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=200),  # start offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(iv=_intervals)
def test_interval_union_model(spark, iv):
    """Gaps-and-islands merge over arbitrary 10-unit intervals equals the
    sequential sweep model, per user."""
    rows = [(u, s, s + 10) for u, s in iv]
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "ni",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w), F.lit(-(1 << 62))), 1
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        flagged.withColumn("island", F.sum("ni").over(w2))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("a"), F.max("e").alias("b"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("b") - F.col("a")).alias("covered"),
        )
    )
    got = {r.user_id: (r.n_islands, r.covered) for r in merged.collect()}
    want = {}
    for u in {u for u, _ in iv}:
        spans = sorted((s, s + 10) for uu, s in iv if uu == u)
        islands = []
        for s, e in spans:
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        want[u] = (len(islands), sum(e - s for s, e in islands))
    assert got == want


_kv_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # key
        st.sampled_from(["U", "D", "I"]),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(base_keys=st.sets(st.integers(0, 30), max_size=20), changes=_kv_pairs)
def test_merge_classification_model(spark, base_keys, changes):
    """Full-outer MERGE classification equals the dict model for any
    base/changes key sets (updates and deletes on missing keys behave as
    inserts-with-op-rules; unmatched base rows stay unchanged)."""
    base = spark.createDataFrame(
        [(k,) for k in base_keys] or [(None,)], "k long"
    ).filter(F.col("k").isNotNull())
    ch = spark.createDataFrame(
        [(k, op) for k, op in changes] or [(None, None)],
        "ck long, op string",
    ).filter(F.col("ck").isNotNull())
    m = base.join(ch, base.k == ch.ck, "full_outer")
    action = (
        F.when(F.col("ck").isNull(), "unchanged")
        .when(F.col("k").isNull(), "insert")
        .when(F.col("op") == "D", "delete")
        .otherwise("update")
    )
    got = {
        r.action: r.n
        for r in m.select(action.alias("action"))
        .groupBy("action")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want: dict[str, int] = {}
    cmap = dict(changes)
    for k in base_keys:
        a = (
            "unchanged"
            if k not in cmap
            else ("delete" if cmap[k] == "D" else "update")
        )
        want[a] = want.get(a, 0) + 1
    for k, op in changes:
        if k not in base_keys:
            want["insert"] = want.get("insert", 0) + 1
    assert got == want


_values = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.floats(
            min_value=-1e12,
            max_value=1e12,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=30,
)


def _write_events_fixture(rows) -> str:
    """Materialize generated (user, value) rows as a minimal events.parquet
    so the REAL registered queries (which load from an sf_dir) run on
    hypothesis-generated data, not just the checked-in fixtures."""
    import atexit
    import datetime
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="pot_prop_events_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    t0 = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([v for _, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


@settings(max_examples=8, deadline=None)
@given(rows=_values)
def test_window_ewma_model(spark, rows):
    """q_window_ewma's integer num/den on arbitrary doubles (negative,
    huge, tiny) equals the sequential Python model: floor(v*100) ints
    weighted 64..1 over the last 7 rows per user."""
    import math

    d = _write_events_fixture(rows)
    got = {
        (r.user_id, r.event_id): (r.num, r.den)
        for r in registry.QUERIES["q_window_ewma"](spark, d).collect()
    }
    hist: dict[int, list[tuple[int, float]]] = {}
    for i, (u, v) in enumerate(rows):
        hist.setdefault(u, []).append((i, v))
    want = {}
    for u, evs in hist.items():
        for j, (eid, _) in enumerate(evs):
            window = evs[max(0, j - 6) : j + 1][::-1]  # newest first
            num = sum(
                math.floor(v * 100) * (2 ** (6 - k))
                for k, (_, v) in enumerate(window)
            )
            den = sum(2 ** (6 - k) for k in range(len(window)))
            want[(u, eid)] = (num, den)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=_values)
def test_window_median_model(spark, rows):
    """q_window_median's lower-middle selection over the last 7 rows per
    user equals the sorted-slice Python model exactly (the result is an
    input double, never an interpolation)."""
    d = _write_events_fixture(rows)
    got = {
        (r.user_id, r.event_id): r.med7
        for r in registry.QUERIES["q_window_median"](spark, d).collect()
    }
    hist: dict[int, list[tuple[int, float]]] = {}
    for i, (u, v) in enumerate(rows):
        hist.setdefault(u, []).append((i, v))
    want = {}
    for u, evs in hist.items():
        for j, (eid, _) in enumerate(evs):
            vals = sorted(v for _, v in evs[max(0, j - 6) : j + 1])
            want[(u, eid)] = vals[(len(vals) + 1) // 2 - 1]
    assert got == want


def test_watermark_late_on_out_of_order_arrivals(spark):
    """s_watermark_late's 3-level distributed prefix-max, exercised on
    data where arrival order (event_id) does NOT follow event time — the
    checked-in fixture is time-monotone, so its parity row can't tell a
    correct running max from a broken one (everything is 'kept' either
    way). Here ~half the events arrive shuffled across a multi-day span,
    many of them more than the 1-hour horizon behind the running max,
    and the query must match the sequential Python model exactly."""
    import datetime

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n = 10000  # > one 4096-event shard, so the shard-offset join is live
    base = datetime.datetime(2024, 1, 1)
    secs = rng.randint(0, 5 * 86400, size=n)  # arrival uncorrelated w/ time
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, size=n)]
    d = _write_events_fixture([(0, 0.0)])  # reuse dir-shape helper
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(seconds=int(s)) for s in secs],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")

    got = {
        r.event_type: (r.n_kept, r.n_dropped)
        for r in registry.QUERIES["s_watermark_late"](spark, d).collect()
    }
    want: dict[str, list[int]] = {t: [0, 0] for t in "abc"}
    max_seen = None
    horizon = datetime.timedelta(hours=1)
    for i in range(n):
        ts = base + datetime.timedelta(seconds=int(secs[i]))
        late = max_seen is not None and ts < max_seen - horizon
        want[types[i]][1 if late else 0] += 1
        max_seen = ts if max_seen is None else max(max_seen, ts)
    assert got == {t: tuple(v) for t, v in want.items()}
    # the adversarial data must actually produce late drops
    assert sum(v[1] for v in want.values()) > 0


_hist_values = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # value
        st.integers(min_value=1, max_value=7),  # multiplicity
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(vals=_hist_values, k=st.sampled_from([1, 2, 3, 7, 10]))
def test_equidepth_tiles_equals_ntile_model(spark, vals, k):
    """The round-8 cornerstone: _equidepth_tiles over the (value, count)
    histogram must be BIT-IDENTICAL to ntile(k) + groupBy over the raw
    rows — any multiset, any k, ties and negative values included."""
    from pot_spark.queries.analytics_extra import _equidepth_tiles

    raw = sorted(v for v, m in vals for _ in range(m))
    n = len(raw)
    q, rem = divmod(n, k)
    want = {}
    pos = 0
    for tile in range(1, k + 1):
        sz = q + (1 if tile <= rem else 0)
        if sz == 0:
            continue
        pos += sz
        want[tile] = (sz, raw[pos - 1])  # count + value at the last rank
    from collections import Counter

    counted = spark.createDataFrame(
        list(Counter(raw).items()), "x long, c long"
    )
    got = {
        r.tile: (r.sz, r.maxv)
        for r in _equidepth_tiles(counted, "x", k).collect()
    }
    assert got == want
