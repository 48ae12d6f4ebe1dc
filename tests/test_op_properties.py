"""Property-based checks of core relational-operator semantics: for
randomly generated small inputs, the Spark plan must agree with a plain
Python model. Spark jobs are slow per example, so each property runs a
reduced example count over batched inputs (one Spark job checks a whole
generated dataset)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pot_spark import registry  # noqa: F401 - ensures modules import

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
